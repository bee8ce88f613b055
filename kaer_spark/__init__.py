"""kaer_spark — a PySpark-native analytics engine with the capabilities of
sunby/kaer (a vector database on a document store), rebuilt Spark-first and
extended with large-scale LLM-data-pipeline operators.

Reference surface (see SURVEY.md for the full inventory, citations are into
/root/reference):

* ``KaerContext`` — collection DDL (create/get/drop), mirroring
  ``db/kaer.go:28-76``.
* ``Collection`` — insert (embed + dense id assignment + append,
  ``db/db.go:60-100``) and query (metadata-pre-filtered exact kNN,
  ``db/db.go:111-143``).
* ``compile_filter`` — MongoDB/FerretDB-style filter dicts compiled to Spark
  ``Column`` expressions (the delegation point at ``db/db.go:113``).

Everything is expressed as DataFrame transformations so Catalyst performs
predicate pushdown, column pruning, and top-k (``TakeOrderedAndProject``)
planning; there is no resident index, no server process, and no driver-side
materialization of the filter-match set (the reference's central scalability
flaw, ``db/db.go:113-120``).
"""

from kaer_spark.context import Collection, KaerContext
from kaer_spark.filters import compile_filter
from kaer_spark.session import get_spark

__all__ = ["KaerContext", "Collection", "compile_filter", "get_spark"]
__version__ = "0.1.0"
