"""Similarity search over embedding columns: exact baseline + scale paths.

* ``brute_force_topk`` — exact cosine/L2 top-k per query; the correctness
  oracle for every approximate path (recall@k is measured against it).
* ``lsh_index`` / ``lsh_topk`` — MLlib ``BucketedRandomProjectionLSH``
  (random-hyperplane bucketing): the batch-built, shuffle-bounded
  approximate path (the north star's "batch vector index build via MLlib").
* ``ivf_assign`` / ``ivf_topk`` — inverted-file (coarse k-means centroid)
  search: probe the ``nprobe`` nearest cells only. At 100 TB the corpus is
  written partitioned by cell id, so a query touches ``nprobe`` partitions
  instead of the full table (partition pruning on the cell column).

The reference's ANN is a single in-RAM HNSW graph (``/root/reference/
db/hnsw.go``) which cannot exceed one machine's memory; these paths are its
distributed replacement with explicit recall/latency knobs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kaer_spark.functions.vector import cosine_similarity, l2sq
from kaer_spark.operators.knn import knn_join


def brute_force_topk(
    corpus: DataFrame,
    query_vector: Sequence[float],
    k: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    metric: str = "cosine",
) -> DataFrame:
    """Exact top-k for one query vector (TakeOrderedAndProject plan)."""
    if metric == "cosine":
        score = cosine_similarity(vec_col, list(query_vector))
        order = [F.col("_score").desc(), F.col(id_col).asc()]
    else:
        score = l2sq(vec_col, list(query_vector))
        order = [F.col("_score").asc(), F.col(id_col).asc()]
    return corpus.withColumn("_score", score).orderBy(*order).limit(k)


# ---------------------------------------------------------------------------
# MLlib LSH
# ---------------------------------------------------------------------------
def lsh_index(
    corpus: DataFrame,
    vec_col: str = "embedding",
    bucket_length: float = 2.0,
    num_hash_tables: int = 3,
    seed: int = 42,
):
    """Fit a BucketedRandomProjectionLSH model over an array<float> column.

    Returns ``(model, transformed_corpus)`` where the corpus gains ``_vec``
    (ml VectorUDT) and ``hashes``. This is the batch "index build": a
    narrow map-only job whose output can be written partitioned by bucket.
    """
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    prepared = corpus.withColumn("_vec", array_to_vector(F.col(vec_col).cast("array<double>")))
    lsh = BucketedRandomProjectionLSH(
        inputCol="_vec",
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=seed,
    )
    model = lsh.fit(prepared)
    return model, model.transform(prepared)


def lsh_topk(
    model,
    indexed_corpus: DataFrame,
    query_vector: Sequence[float],
    k: int,
) -> DataFrame:
    """Approximate top-k via the fitted LSH model (probes matching buckets)."""
    from pyspark.ml.linalg import Vectors

    return model.approxNearestNeighbors(
        indexed_corpus, Vectors.dense([float(x) for x in query_vector]), k
    )


def lsh_similarity_join(
    model, left: DataFrame, right: DataFrame, threshold: float
) -> DataFrame:
    """Distance-threshold similarity join through LSH buckets — the
    shuffle-bounded replacement for an all-pairs cosine join."""
    return model.approxSimilarityJoin(left, right, threshold, distCol="dist")


# ---------------------------------------------------------------------------
# IVF (coarse-quantizer) search
# ---------------------------------------------------------------------------
def ivf_fit(
    corpus: DataFrame,
    vec_col: str = "embedding",
    cells: int = 16,
    seed: int = 42,
):
    """K-means coarse quantizer; returns the fitted model (cell centroids)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    prepared = corpus.withColumn("_vec", array_to_vector(F.col(vec_col).cast("array<double>")))
    km = KMeans(k=cells, seed=seed, featuresCol="_vec", predictionCol="_cell")
    return km.fit(prepared)


def ivf_assign(model, corpus: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Tag each row with its IVF cell. Write the result partitioned by
    ``_cell`` and queries prune to ``nprobe`` partitions."""
    from pyspark.ml.functions import array_to_vector

    prepared = corpus.withColumn("_vec", array_to_vector(F.col(vec_col).cast("array<double>")))
    return model.transform(prepared).drop("_vec")


def ivf_topk(
    model,
    assigned_corpus: DataFrame,
    query_vector: Sequence[float],
    k: int,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Probe the nprobe nearest cells, exact-rank inside them.

    Driver computes cell distances from the (tiny) centroid set; the scan
    then prunes on ``_cell IN (...)`` — partition pruning when the corpus
    is stored partitioned by cell.
    """
    import numpy as np

    q = np.asarray([float(x) for x in query_vector])
    dists = [(i, float(((c - q) ** 2).sum())) for i, c in enumerate(model.clusterCenters())]
    # (dist, cell-id) sort: same deterministic tie-break as the materialized
    # index path (operators.index_store.ivf_index_topk)
    probe = [i for i, _ in sorted(dists, key=lambda t: (t[1], t[0]))[:nprobe]]
    pruned = assigned_corpus.filter(F.col("_cell").isin(probe))
    return (
        pruned.withColumn("_score", l2sq(vec_col, list(query_vector)))
        .orderBy(F.col("_score").asc(), F.col(id_col).asc())
        .limit(k)
    )


def recall_at_k(approx: DataFrame, exact: DataFrame, id_col: str) -> float:
    """|approx ∩ exact| / |exact| on the id column (validation metric)."""
    a = {r[0] for r in approx.select(id_col).collect()}
    e = {r[0] for r in exact.select(id_col).collect()}
    return len(a & e) / max(len(e), 1)
