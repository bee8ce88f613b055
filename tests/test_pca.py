"""Embedding moments / PCA whitening: exact integer replay of the
moment rows, numpy agreement for the eigensolve, and statistical
whitening properties on the real fixture."""

from __future__ import annotations

import math

import numpy as np
import pytest

from kaer_spark.operators.pca import (
    SCALE_BITS,
    embedding_moments,
    pca_components,
    pca_project,
    pca_whiten,
)


def _fixture_matrix(embeddings):
    rows = embeddings.select("vec_id", "embedding").collect()
    rows.sort(key=lambda r: r["vec_id"])
    return np.asarray(
        [np.asarray(r["embedding"], dtype=np.float64) for r in rows]
    )


def test_moments_match_integer_replay(embeddings):
    mat = _fixture_matrix(embeddings)
    q = np.floor(mat * float(1 << SCALE_BITS) + 0.5).astype(object)
    got = {
        (r["i"], r["j"]): int(r["s"])
        for r in embedding_moments(embeddings).collect()
    }
    n, d = mat.shape
    assert got[(-1, -1)] == n
    for i in range(d):
        assert got[(i, -1)] == int(q[:, i].sum())
    # spot-check the full upper triangle exactly
    gram = q.T @ q
    for i in range(d):
        for j in range(i, d):
            assert got[(i, j)] == int(gram[i, j])
    assert len(got) == d * (d + 1) // 2 + d + 1


def test_pca_components_match_numpy(embeddings):
    mat = _fixture_matrix(embeddings)
    mean, comps, vals = pca_components(embeddings, 4)
    scale = float(1 << SCALE_BITS)
    q = np.floor(mat * scale + 0.5)
    cov = np.cov(q.T, bias=True) / (scale * scale)
    ref_vals = np.sort(np.linalg.eigvalsh(cov))[::-1][:4]
    assert np.allclose(vals, ref_vals, rtol=1e-9)
    assert np.allclose(mean, q.mean(axis=0) / scale, rtol=0, atol=0)
    C = np.asarray(comps)
    # orthonormal rows, deterministic sign (largest-|entry| positive)
    assert np.allclose(C @ C.T, np.eye(4), atol=1e-12)
    for row in C:
        assert row[int(np.argmax(np.abs(row)))] > 0
    # projecting onto each axis reproduces its eigenvalue as variance
    centered = q / scale - q.mean(axis=0) / scale
    proj = centered @ C.T
    assert np.allclose(proj.var(axis=0), vals, rtol=1e-9)


def test_pca_whiten_unit_variance(embeddings):
    out = pca_whiten(embeddings, 3).select("vec_id", "p0", "p1", "p2")
    pdf = out.toPandas().sort_values("vec_id")
    P = pdf[["p0", "p1", "p2"]].to_numpy()
    v = P.var(axis=0)
    assert np.allclose(v, 1.0, rtol=1e-6)
    # decorrelated: off-diagonal covariance ~0 relative to unit variance
    c = np.cov(P.T, bias=True)
    off = c - np.diag(np.diag(c))
    assert np.abs(off).max() < 1e-6


def test_pca_project_is_exact_literal_arithmetic(embeddings):
    """The unrolled projection must equal the same left-associated
    multiply-add chain replayed in Python — bit-for-bit."""
    mean, comps, _ = pca_components(embeddings, 2)
    got = {
        r["vec_id"]: (r["p0"], r["p1"])
        for r in pca_project(embeddings, mean, comps)
        .select("vec_id", "p0", "p1")
        .collect()
    }
    for r in embeddings.select("vec_id", "embedding").collect():
        vec = r["embedding"]
        want = []
        for comp in comps:
            acc = 0.0
            for i in range(len(mean)):
                acc = acc + (float(vec[i]) - mean[i]) * comp[i]
            want.append(acc)
        assert got[r["vec_id"]] == tuple(want)


def test_pca_edges(spark, embeddings):
    with pytest.raises(ValueError):
        pca_components(embeddings, 0)
    with pytest.raises(ValueError):
        pca_components(embeddings, 65)
    empty = embeddings.limit(0)
    with pytest.raises(ValueError):
        pca_components(empty, 2)


def test_semdedup_whiten_equals_manual_projection(embeddings):
    """semdedup(whiten=k) must equal projecting first and running the
    un-whitened pipeline on the projected vectors."""
    from pyspark.sql import functions as F

    from kaer_spark.operators.dedup import semdedup

    k = 4
    auto = semdedup(embeddings, whiten=k, threshold=0.9).collect()
    manual_src = pca_whiten(embeddings, k).withColumn(
        "embedding", F.array(*[F.col(f"p{i}") for i in range(k)])
    ).drop(*[f"p{i}" for i in range(k)])
    manual = semdedup(manual_src, threshold=0.9).collect()
    key = lambda rows: sorted(
        (r["vec_id"], r["cell"], r["cluster_id"], r["keep"]) for r in rows
    )
    assert key(auto) == key(manual)
    # shape contract: every vec labeled, exactly one keeper per cluster
    assert len(auto) == embeddings.count()


def test_embedding_drift_matches_numpy(embeddings):
    from pyspark.sql import functions as F

    from kaer_spark.operators.pca import embedding_drift

    left = embeddings.filter(F.col("label") % 2 == 0)
    right = embeddings.filter(F.col("label") % 2 == 1)
    row = embedding_drift(left, right).collect()[0]

    scale = float(1 << SCALE_BITS)
    qa = np.floor(_fixture_matrix(left) * scale + 0.5)
    qb = np.floor(_fixture_matrix(right) * scale + 0.5)
    assert (row["n_a"], row["n_b"]) == (len(qa), len(qb))
    ma, mb = qa.mean(axis=0) / scale, qb.mean(axis=0) / scale
    assert row["mean_shift_l2sq"] == pytest.approx(
        float(((ma - mb) ** 2).sum()), rel=1e-12
    )
    assert row["var_trace_a"] == pytest.approx(
        float(qa.var(axis=0).sum() / (scale * scale)), rel=1e-12
    )
    assert row["var_trace_b"] == pytest.approx(
        float(qb.var(axis=0).sum() / (scale * scale)), rel=1e-12
    )
    # identical corpora drift to exactly zero (integer mass cancels)
    same = embedding_drift(left, left).collect()[0]
    assert same["mean_shift_l2sq"] == 0.0
    assert same["var_trace_a"] == same["var_trace_b"]
