"""Driver-contract invariants: every oracle belongs to a query, names are
unique, and the declared rows-only set stays the known MLlib/k-means five
(a new query accidentally missing its oracle should fail loudly here, not
silently downgrade to a rows-only check in the driver)."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

DECLARED_ROWS_ONLY = {
    "ivf_knn",          # MLlib k-means fit
    "lsh_knn",          # MLlib random hyperplanes
    "lsh_similarity_join",
    "pq_knn",           # k-means codebooks
    "ivf_recall_sweep", # recall metric over the k-means index
}


def test_every_query_has_oracle_or_declared_contract():
    import __spark_entry__ as em

    qs, os_ = set(em.queries()), set(em.oracle_sql())
    assert os_ <= qs, f"orphan oracles: {os_ - qs}"
    assert qs - os_ == DECLARED_ROWS_ONLY, (
        f"undeclared rows-only queries: {(qs - os_) - DECLARED_ROWS_ONLY}"
    )


def test_bench_headline_subset_of_queries():
    import bench
    import __spark_entry__ as em

    missing = [n for n in bench.HEADLINE if n not in em.queries()]
    assert not missing, missing
