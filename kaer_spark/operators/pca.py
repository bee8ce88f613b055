"""Embedding second-moment statistics and PCA whitening.

The embedding half of a curation pipeline routinely needs the corpus
covariance: SemDeDup-style semantic dedup whitens embeddings before
clustering, retrieval stacks mean-center + decorrelate before quantizing,
and drift monitoring compares second moments across snapshots. The
reference (sunby/kaer) stores raw vectors only; this is part of the
engine's LLM-data-pipeline extension (SURVEY §2.3).

Design — exactness first, then scale:

* **Quantized moments** (:func:`embedding_moments`): floats sum in
  whatever order the cluster reduces them, so a float Gram matrix is not
  reproducible bit-for-bit across engines or even across runs. Instead
  each component quantizes to an integer ``q = floor(x·2^bits + 0.5)``
  (the ×2^bits step is EXACT in float64 — a power-of-two scale of an
  f32-exact value — so the quantization is engine-independent), and all
  sums are integer sums: associative, order-free, replayable by any SQL
  engine. At ``bits=20`` the quantization error per component is ≤2⁻²¹
  relative to unit scale — far below any statistical use of a corpus
  covariance — and the DECIMAL(38,0) accumulators cannot overflow before
  ~10²⁸ rows.

* **One pass, no shuffle of vectors** (100 TB shape): an Arrow-batched
  ``mapInPandas`` computes per-batch integer Gram partials with a numpy
  matmul (the same slow-path budget as PQ encode — this is a numeric
  kernel, not row logic), emitting d(d+1)/2 + d + 1 partial rows per
  batch; one map-side-combined ``(i, j)`` aggregate folds them. The
  full-resolution vectors never shuffle — only d²-sized partials do.

* **Bounded driver math** (:func:`pca_components`): the d×d eigensolve
  collects exactly the moment rows (d=64 → 2 145 rows), never data.
  Sign convention: each eigenvector's largest-|component| entry is made
  positive (ties: lowest index) so the basis is deterministic.

* **Whitening is codegen, not Python** (:func:`pca_project`): the k×d
  component matrix re-enters the plan as float64 literals in an unrolled
  fixed-association expression — scan-shaped, whole-stage codegen, and
  replayable exactly by the same arithmetic in SQL.
"""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Default quantization scale for integer moments.
SCALE_BITS = 20


def embedding_moments(
    df: DataFrame,
    vec_col: str = "embedding",
    scale_bits: int = SCALE_BITS,
) -> DataFrame:
    """Exact integer moment rows of the quantized embeddings →
    ``(i, j, s)`` with ``s`` DECIMAL(38,0):

    * ``i ≤ j``    — Gram entries ``Σ q_i·q_j`` (upper triangle),
    * ``j = -1``   — first moments ``Σ q_i``,
    * ``i = j = -1`` — the row count.

    NULL vectors are skipped (counted out of every moment).
    """
    import numpy as np
    from pyspark.sql import types as T

    d_probe = df.select(F.size(vec_col).alias("d")).filter(
        F.col("d") > 0
    ).first()
    if d_probe is None:
        d = 0
    else:
        d = int(d_probe["d"])
    scale = float(1 << int(scale_bits))
    schema = T.StructType(
        [
            T.StructField("i", T.IntegerType()),
            T.StructField("j", T.IntegerType()),
            T.StructField("s", T.DecimalType(38, 0)),
        ]
    )

    def partials(batches):
        import pandas as pd

        for pdf in batches:
            vecs = [v for v in pdf[vec_col] if v is not None]
            if not vecs:
                continue
            mat = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
            q = np.floor(mat * scale + 0.5)
            qmax = float(np.abs(q).max()) or 1.0
            # chunk so each int64 matmul partial stays below 2^62, then
            # accumulate the chunks in arbitrary-precision python ints
            safe = max(1, int((1 << 62) / (qmax * qmax)))
            gram = np.zeros((d, d), dtype=object)
            qi = q.astype(np.int64)
            for lo in range(0, qi.shape[0], safe):
                gram += qi[lo : lo + safe].T @ qi[lo : lo + safe]
            sums = qi.sum(axis=0, dtype=object)
            ii, jj, ss = [], [], []
            for a in range(d):
                for b in range(a, d):
                    ii.append(a)
                    jj.append(b)
                    ss.append(Decimal(int(gram[a, b])))
            for a in range(d):
                ii.append(a)
                jj.append(-1)
                ss.append(Decimal(int(sums[a])))
            ii.append(-1)
            jj.append(-1)
            ss.append(Decimal(qi.shape[0]))
            yield pd.DataFrame({"i": ii, "j": jj, "s": ss})

    parts = df.select(vec_col).mapInPandas(partials, schema)
    return parts.groupBy("i", "j").agg(F.sum("s").alias("s"))


def pca_components(
    df: DataFrame,
    k: int,
    vec_col: str = "embedding",
    scale_bits: int = SCALE_BITS,
) -> tuple[list[float], list[list[float]], list[float]]:
    """Top-``k`` principal axes of the embedding covariance →
    ``(mean, components k×d, eigenvalues)`` in ORIGINAL (descaled)
    units. Collects only the d²-bounded moment rows; eigensolve is a
    d×d ``numpy.linalg.eigh`` on the driver. Deterministic: symmetric
    eigh on an exactly-reproducible integer matrix, eigenvalues sorted
    descending (ties by the sign-fixed component order), each
    eigenvector's largest-|entry| made positive."""
    import numpy as np

    if k <= 0:
        raise ValueError("k must be positive")
    rows = embedding_moments(df, vec_col, scale_bits).collect()
    if not rows:
        raise ValueError("no non-null vectors")
    n = 0
    first: dict[int, int] = {}
    gram: dict[tuple[int, int], int] = {}
    for r in rows:
        i, j, s = r["i"], r["j"], int(r["s"])
        if i == -1:
            n = s
        elif j == -1:
            first[i] = s
        else:
            gram[(i, j)] = s
    d = len(first)
    if k > d:
        raise ValueError(f"k={k} exceeds dimensionality {d}")
    scale = float(1 << int(scale_bits))
    m = np.array([first[i] for i in range(d)], dtype=np.float64) / n
    S = np.empty((d, d), dtype=np.float64)
    for (i, j), s in gram.items():
        S[i, j] = S[j, i] = s
    cov = (S / n - np.outer(m, m)) / (scale * scale)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:k]
    comps = []
    for idx in order:
        v = vecs[:, idx]
        pivot = int(np.argmax(np.abs(v)))
        if v[pivot] < 0:
            v = -v
        comps.append([float(x) for x in v])
    mean = [float(x) for x in m / scale]
    return mean, comps, [float(vals[i]) for i in order]


def pca_project(
    df: DataFrame,
    mean: list[float],
    components: list[list[float]],
    eigenvalues: list[float] | None = None,
    vec_col: str = "embedding",
    out_prefix: str = "p",
) -> DataFrame:
    """Append the centered projections ``p0..p{k-1}`` (whitened —
    divided by ``sqrt(eigenvalue)`` — when ``eigenvalues`` is given).
    The coefficients enter as float64 literals in a fixed
    left-associated multiply-add chain: scan-shaped whole-stage
    codegen, zero Python, exactly replayable in SQL from the same
    literals."""
    import math as _math
    import re as _re

    d = len(mean)
    out = df
    # ONE parsed expression per component when possible: the chain is
    # k × d terms of ~6 gateway calls each when built per-element (
    # seconds of driver time at d=64); the parsed tree is the same
    # fixed left-associated multiply-add chain over the same double
    # literals, so projections are bit-identical (repr round-trips
    # binary64 and the parser's double conversion is correctly rounded).
    finite = all(
        _math.isfinite(float(x)) for x in mean
    ) and all(
        _math.isfinite(float(x)) for comp in components for x in comp
    ) and (
        eigenvalues is None
        or all(
            _math.isfinite(float(e) ** 0.5) and float(e) ** 0.5 != 0.0
            for e in eigenvalues
        )
    )
    fast = finite and _re.match(r"[A-Za-z_][A-Za-z0-9_]*\Z", vec_col)
    for c_idx, comp in enumerate(components):
        if len(comp) != d:
            raise ValueError("component/mean length mismatch")
        if fast:
            chain = " + ".join(
                f"(cast(element_at(`{vec_col}`, {i + 1}) as double)"
                f" - {repr(float(mean[i]))}D) * {repr(float(comp[i]))}D"
                for i in range(d)
            )
            if eigenvalues is not None:
                chain = (
                    f"({chain}) / "
                    f"{repr(float(eigenvalues[c_idx]) ** 0.5)}D"
                )
            out = out.withColumn(f"{out_prefix}{c_idx}", F.expr(chain))
            continue
        acc = None
        for i in range(d):
            term = (
                F.element_at(F.col(vec_col), i + 1).cast("double")
                - F.lit(float(mean[i]))
            ) * F.lit(float(comp[i]))
            acc = term if acc is None else acc + term
        if eigenvalues is not None:
            acc = acc / F.lit(float(eigenvalues[c_idx]) ** 0.5)
        out = out.withColumn(f"{out_prefix}{c_idx}", acc)
    return out


def pca_whiten(
    df: DataFrame,
    k: int,
    vec_col: str = "embedding",
    scale_bits: int = SCALE_BITS,
    out_prefix: str = "p",
) -> DataFrame:
    """One-call whitening: fit :func:`pca_components` on ``df`` and
    project it onto the top-``k`` axes with unit variance per axis —
    the standard preprocessing before SemDeDup-style clustering."""
    mean, comps, vals = pca_components(df, k, vec_col, scale_bits)
    return pca_project(
        df, mean, comps, eigenvalues=vals, vec_col=vec_col,
        out_prefix=out_prefix,
    )


def embedding_drift(
    left: DataFrame,
    right: DataFrame,
    vec_col: str = "embedding",
    scale_bits: int = SCALE_BITS,
) -> DataFrame:
    """Distribution drift between two embedding corpora from their exact
    integer moments → one row ``(n_a, n_b, mean_shift_l2sq,
    var_trace_a, var_trace_b)``.

    ``mean_shift_l2sq`` is ‖mean_a − mean_b‖² and ``var_trace_*`` the
    total variance per side — the two first diagnostics of an embedding
    drift monitor (new crawl vs reference corpus, pre/post model swap).
    All mass terms are integer-exact until ONE final float64 division:
    the squared mean gap folds as Σ_i (S_aᵢ·n_b − S_bᵢ·n_a)² over the
    common denominator (n_a·n_b)², every numerator a DECIMAL product of
    quantized sums — order-free, engine-reproducible, no float
    accumulation across dimensions. Cost: one bounded moments pass per
    side (the corpora never join row-wise — only d-sized moment rows
    meet)."""
    la = embedding_moments(left, vec_col, scale_bits)
    lb = embedding_moments(right, vec_col, scale_bits)
    scale2 = float((1 << int(scale_bits)) ** 2)

    def _split(m: DataFrame, tag: str):
        n = m.filter((F.col("i") == -1) & (F.col("j") == -1)).select(
            F.col("s").cast("decimal(19,0)").alias(f"n_{tag}")
        )
        firsts = m.filter((F.col("j") == -1) & (F.col("i") >= 0)).select(
            "i", F.col("s").cast("decimal(19,0)").alias(f"m_{tag}")
        )
        diag = m.filter((F.col("j") >= 0) & (F.col("i") == F.col("j"))).select(
            "i", F.col("s").cast("decimal(38,0)").alias(f"g_{tag}")
        )
        return n, firsts, diag

    na, fa, da = _split(la, "a")
    nb, fb, db = _split(lb, "b")
    dims = (
        fa.join(fb, "i")
        .join(da, "i")
        .join(db, "i")
        .crossJoin(F.broadcast(na))
        .crossJoin(F.broadcast(nb))
    )
    gap = F.col("m_a") * F.col("n_b") - F.col("m_b") * F.col("n_a")
    per_dim = dims.select(
        "n_a",
        "n_b",
        (gap * gap).cast("decimal(38,0)").alias("gap2"),
        # n·Σx² − (Σx)²  =  n²·variance (integer-exact per side)
        (F.col("n_a") * F.col("g_a") - F.col("m_a") * F.col("m_a"))
        .cast("decimal(38,0)")
        .alias("v_a"),
        (F.col("n_b") * F.col("g_b") - F.col("m_b") * F.col("m_b"))
        .cast("decimal(38,0)")
        .alias("v_b"),
    )
    agg = per_dim.groupBy("n_a", "n_b").agg(
        F.sum("gap2").alias("sgap2"),
        F.sum("v_a").alias("sv_a"),
        F.sum("v_b").alias("sv_b"),
    )
    denom_ab = (
        F.col("n_a").cast("double") * F.col("n_b").cast("double")
    )
    return agg.select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        (
            F.col("sgap2").cast("double")
            / (denom_ab * denom_ab)
            / F.lit(scale2)
        ).alias("mean_shift_l2sq"),
        (
            F.col("sv_a").cast("double")
            / (
                F.col("n_a").cast("double") * F.col("n_a").cast("double")
            )
            / F.lit(scale2)
        ).alias("var_trace_a"),
        (
            F.col("sv_b").cast("double")
            / (
                F.col("n_b").cast("double") * F.col("n_b").cast("double")
            )
            / F.lit(scale2)
        ).alias("var_trace_b"),
    )
