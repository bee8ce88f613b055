"""Deterministic, oracle-replayable sketches.

HyperLogLog distinct counting (Flajolet et al. 2007) re-expressed so that
EVERY arithmetic step — hashing, register assignment, rank extraction, and
the estimator itself — is identical integer/float64 arithmetic on Spark and
on the DuckDB oracle. The standard HLL uses platform hash functions and
register arrays; this one uses the engine-wide paired polynomial
fingerprint and a ``groupBy(register).max(rank)``, which buys two things:

* **The correctness gate applies to a sketch.** ``approx_count_distinct``
  (and the GK percentile sketch behind ``corpus_profile_approx``) can only
  be rows-only checked — the sketch internals are opaque. Here the oracle
  replays the full register state, so the driver value-hash compares the
  ESTIMATE bit for bit.
* **Distinct counting with NO distinct shuffle.** Register update is
  max(), which is map-side combinable: at 100 TB each task reduces its
  slice to ≤ m rows before the exchange, so counting distinct tokens
  across the corpus shuffles m·tasks tiny rows instead of hash-
  partitioning every token occurrence the way ``count(DISTINCT)`` /
  ``groupBy(token)`` must. That is the whole reason sketches exist at
  scale, and it survives here with the replay guarantee intact.

Conventions (mirrored literally by the oracle SQL):

* h1/h2 = the engine's paired Horner folds (base 31 mod 1e9+7 / base 131
  mod 1e9+9) over the value's codepoints. The folds alone are NOT
  HLL-grade: both give the final character coefficient 1, so for
  structured inputs (sequential ids, common suffixes) register index and
  rank move in lockstep and the estimate collapses (measured −67 % on
  sequential strings). So:
* mix(a, b) = five alternating Lehmer steps ``u·A + c`` that SWITCH
  modulus every round (mod p → mod q → mod p …) — each switch is a
  non-linear step, which is where the avalanche comes from; every
  operation is exact int64 modular arithmetic the oracle replays.
* register index = mix(h1, h2) mod m (m = 2^p registers);
  rank ρ = trailing zeros of mix(h2, h1) + 1, capped at Q+1 = 26
  (``length(bin(h & −h))`` — the lowest-set-bit trick; for a uniform
  residue mod an odd prime P(ρ ≥ r) = 2^−(r−1) to within 2^r/p, i.e.
  near-exactly geometric, with NO power-of-two wrap bias).
* Z's reciprocal-power sum is computed as the INTEGER
  Σ 2^(26−M_j) + V·2^26 (order-free, exact — no float accumulation
  ordering hazard), the estimator divides once in float64, and the alpha
  constant is computed in Python and embedded as the same literal on both
  engines. Bias-correction branch: linear counting m·ln(m/V) when the raw
  estimate ≤ 2.5m and V > 0 (the published small-range correction).

Accuracy measured at p=12 over 5k–1M sequential AND random value sets:
within ±5 % (ideal HLL σ = 1.6 %; the gap is the mixer's residual
structure) — documented, tested, and irrelevant to the correctness gate,
which checks the replay, not the truth.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kaer_spark.operators.dedup import (
    HASH_BASE,
    HASH_BASE2,
    HASH_MOD,
    HASH_MOD2,
)

HLL_Q = 25  # rank cap: trailing zeros of a value < 2^30 top out below 30

# classic Lehmer/L'Ecuyer multipliers for the cross-moduli mixer
_MIX = [(48271, 12345), (69621, 6789), (40692, 424242), (16807, 271828),
        (39373, 97531)]


def _mix(a: Column, b: Column) -> Column:
    """Five alternating-modulus Lehmer rounds over the pair of folds —
    the replayable avalanche (see module docstring). Starts mod p, ends
    mod p; every intermediate < 2^30·48271 + 2^30 < 2^46."""
    u = (a * F.lit(_MIX[0][0]) + b) % F.lit(HASH_MOD)
    mods = [HASH_MOD2, HASH_MOD, HASH_MOD2, HASH_MOD]
    for (mul, add), mod in zip(_MIX[1:], mods):
        u = (u * F.lit(mul) + F.lit(add)) % F.lit(mod)
    return u


def hll_alpha(m: int) -> float:
    """The HLL bias constant for m ≥ 128 registers — computed here once
    and embedded as the SAME float literal in the Spark plan and the
    oracle SQL."""
    if m < 128:
        raise ValueError("hll_distinct requires p >= 7 (m >= 128)")
    return 0.7213 / (1.0 + 1.079 / m)


def hll_distinct(
    df: DataFrame,
    value_col: str = "v",
    p: int = 12,
) -> DataFrame:
    """ONE-ROW HyperLogLog estimate of ``count(DISTINCT value_col)`` →
    ``(m, used_registers, zero_registers, z_num, estimate)`` —
    :func:`hll_estimate` over :func:`hll_registers` (persist/merge the
    register table instead when the sketch should accumulate across
    corpus snapshots).

    ``z_num`` is the exact integer numerator Σ 2^(26−M_j) + V·2^26 of the
    harmonic mean — exposing it makes the row's float content a single
    literal-over-integer division, so the oracle comparison is bit-exact.
    No distinct, no value-keyed shuffle: one map-side-combinable
    ``groupBy`` over at most 2^p register indices."""
    return hll_estimate(hll_registers(df, value_col, p), p)


def hll_distinct_tokens(
    docs: DataFrame,
    text_col: str = "text",
    p: int = 12,
) -> DataFrame:
    """HLL estimate of the corpus's distinct whitespace-token count — the
    vocabulary-size probe you can afford on every refresh (build_vocab
    ranks and materializes the whole frequency table; this answers "how
    big IS the vocabulary" in one register-bounded pass)."""
    from kaer_spark.functions.text import tokens
    from kaer_spark.operators.util import ensure_parallelism

    toks = ensure_parallelism(docs).select(
        F.explode(tokens(F.col(text_col))).alias("v")
    )
    return hll_distinct(toks, "v", p)


def hll_distinct_by(
    df: DataFrame,
    group_cols: list[str],
    value_col: str = "v",
    p: int = 12,
) -> DataFrame:
    """Per-group HLL: one row per distinct ``group_cols`` combination →
    ``(*group_cols, m, used_registers, zero_registers, z_num, estimate)``
    — the GROUP BY form of :func:`hll_distinct` (distinct users per day,
    distinct tokens per language, …) with the same replay guarantee.

    Scale: the register update shuffles (group, idx) keys — bounded by
    groups × 2^p and map-side combined — instead of hash-partitioning
    every (group, value) occurrence the way ``GROUP BY g, count(DISTINCT
    v)`` must (which shuffles the full value stream AND forces a
    two-phase Expand in Spark). Estimator arithmetic is identical to the
    global form, applied per row (shared helpers — one place to tweak
    for BOTH engine paths and the oracle, per the r11 advice)."""
    m = 1 << int(p)
    regs = (
        _hll_rho_slots(df, value_col, m, group_cols)
        .groupBy(*group_cols, "idx")
        .agg(F.max("rho").alias("mj"))
    )
    counts = regs.groupBy(*group_cols).agg(
        F.count("*").cast("long").alias("used_registers"),
        F.sum(F.element_at(_hll_pow2(), F.col("mj") + 1)).alias("zp"),
    )
    return _hll_estimator(counts, m, group_cols)


def _hll_rho_slots(
    df: DataFrame, value_col: str, m: int, group_cols: list[str] | tuple = ()
) -> DataFrame:
    """Shared sketch front end → ``(*group_cols, idx, rho)``: paired
    Horner folds over the value's codepoints, cross-moduli Lehmer mix,
    register index ``mix(h1,h2) mod m`` and capped trailing-zero rank
    from ``mix(h2,h1)`` (module-docstring conventions — the oracle SQL
    mirrors exactly these expressions)."""
    codes = F.transform(
        F.split(F.col(value_col), ""), lambda ch: F.ascii(ch).cast("long")
    )
    h1 = F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda a, x: (a * HASH_BASE + x) % HASH_MOD,
    )
    h2 = F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda a, x: (a * HASH_BASE2 + x) % HASH_MOD2,
    )
    # fold each Horner hash ONCE per row: inlined into both mixes, each
    # fold would evaluate twice (same depth×-rework as cms_build's u —
    # CollapseProject keeps non-cheap aliases referenced more than once)
    slots = (
        df.withColumn("__hll_h1", h1)
        .withColumn("__hll_h2", h2)
        .select(
            *[F.col(c) for c in group_cols],
            (_mix(F.col("__hll_h1"), F.col("__hll_h2")) % m).alias("idx"),
            _mix(F.col("__hll_h2"), F.col("__hll_h1")).alias("r"),
        )
    )
    low = F.col("r").bitwiseAND(-F.col("r"))
    rho = (
        F.when(F.col("r") == 0, F.lit(HLL_Q + 1))
        .otherwise(F.least(F.length(F.bin(low)), F.lit(HLL_Q + 1)))
        .cast("int")
    )
    return slots.select(*group_cols, "idx", rho.alias("rho"))


def _hll_pow2() -> Column:
    """Literal ``2^(Q+1-i)`` lookup array for the integer Z numerator."""
    return F.array(
        *[F.lit(1 << (HLL_Q + 1 - i)).cast("long") for i in range(HLL_Q + 2)]
    )


def _hll_estimator(
    counts: DataFrame, m: int, group_cols: list[str] | tuple = ()
) -> DataFrame:
    """Shared estimator tail over a ``(*group_cols, used_registers, zp)``
    frame → ``(*group_cols, m, used_registers, zero_registers, z_num,
    estimate)``: exact-integer Z numerator, one float64 division, the
    published linear-counting small-range branch."""
    full = F.lit(1 << (HLL_Q + 1)).cast("long")
    row = counts.select(
        *group_cols,
        F.lit(m).cast("long").alias("m"),
        "used_registers",
        (F.lit(m).cast("long") - F.col("used_registers")).alias(
            "zero_registers"
        ),
        (F.col("zp") + (F.lit(m) - F.col("used_registers")) * full).alias(
            "z_num"
        ),
    )
    c1 = hll_alpha(m) * float(m) * float(m) * float(1 << (HLL_Q + 1))
    raw = F.lit(c1) / F.col("z_num").cast("double")
    small = F.lit(float(m)) * F.log(
        F.lit(float(m)) / F.col("zero_registers").cast("double")
    )
    return row.withColumn(
        "estimate",
        F.when(
            (raw <= F.lit(2.5 * m)) & (F.col("zero_registers") > 0), small
        ).otherwise(raw),
    )


def hll_registers(
    df: DataFrame,
    value_col: str = "v",
    p: int = 12,
) -> DataFrame:
    """The sketch STATE: ``(idx, mj)`` max-rank per touched register —
    what makes HLL operationally useful at 100 TB: registers are tiny
    (≤ 2^p rows), PERSISTABLE (a parquet file per corpus snapshot), and
    MERGEABLE (:func:`hll_merge`), so "distinct tokens all-time" is a
    register-table union away from the daily sketches — no re-scan of
    old data, ever. Same hashing/rank conventions as
    :func:`hll_distinct` (which is estimate∘registers)."""
    m = 1 << int(p)
    return (
        _hll_rho_slots(df, value_col, m)
        .groupBy("idx")
        .agg(F.max("rho").alias("mj"))
    )


def hll_merge(*register_tables: DataFrame) -> DataFrame:
    """Merge sketch states: union + per-register max. EXACT — max per
    register commutes with multiset union, so
    ``estimate(merge(regs(A), regs(B))) == estimate(regs(A ∪ B))``
    bit for bit (driver-checked: the merged-parity query's oracle IS the
    global sketch replay)."""
    if not register_tables:
        raise ValueError("need at least one register table")
    out = register_tables[0]
    for r in register_tables[1:]:
        out = out.unionByName(r)
    return out.groupBy("idx").agg(F.max("mj").alias("mj"))


def hll_estimate(registers: DataFrame, p: int = 12) -> DataFrame:
    """Estimator over a register table (same arithmetic as
    :func:`hll_distinct_by`'s tail — shared :func:`_hll_estimator`): ONE
    row ``(m, used_registers, zero_registers, z_num, estimate)``. The
    ``coalesce`` keeps an EMPTY register table well-defined (zp = 0 →
    the linear-counting branch yields ln-based 0-ish estimates on V=m)."""
    m = 1 << int(p)
    counts = registers.agg(
        F.count("*").cast("long").alias("used_registers"),
        F.coalesce(
            F.sum(F.element_at(_hll_pow2(), F.col("mj") + 1)),
            F.lit(0).cast("long"),
        ).alias("zp"),
    )
    return _hll_estimator(counts, m)


# --- Count-Min Sketch -------------------------------------------------------


def cms_build(
    df: DataFrame,
    value_col: str = "v",
    width: int = 1 << 12,
    depth: int = 4,
    seed: int = 2027,
) -> DataFrame:
    """Count-Min Sketch (Cormode & Muthukrishnan 2005) of a value
    column's multiset → ``(j, pos, cnt)``: ``depth`` rows of ``width``
    counters, cell ``(j, h_j(v) mod width)`` accumulating occurrence
    counts. ≤ depth·width rows regardless of corpus size.

    Why it fits this engine: every ingredient is already replayable —
    the paired folds + Lehmer mixer for value hashing, the
    ``minhash_coeffs`` universal family for the per-row hashes, integer
    sums (order-free) for the counters — so the ORACLE rebuilds the
    exact sketch and the exact estimates, FPs and all. And like the HLL
    registers the state is persistable and MERGEABLE (cell-wise SUM:
    counts of a union = sum of counts — exact), so per-snapshot sketches
    accumulate with no re-scan.

    Scale shape: frequency estimation with NO value-keyed shuffle — the
    one exchange is keyed on (j, pos) (≤ depth·width keys, map-side
    combined), against the full-token-stream shuffle a ``groupBy(value)``
    needs. Estimates are upper bounds (collisions only ever ADD):
    ``cms_query`` ≤ true + ε·N with ε = e/width at the usual guarantees.
    """
    from kaer_spark.operators.dedup import minhash_coeffs

    if depth < 1 or width < 2:
        raise ValueError("depth must be >= 1 and width >= 2")
    coeffs = minhash_coeffs(depth, seed)
    codes = F.transform(
        F.split(F.col(value_col), ""), lambda ch: F.ascii(ch).cast("long")
    )
    h1 = F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda a, x: (a * HASH_BASE + x) % HASH_MOD,
    )
    h2 = F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda a, x: (a * HASH_BASE2 + x) % HASH_MOD2,
    )
    # materialize the mixed value hash ONCE per row: inlining u into each
    # of the `depth` cell structs re-evaluates both Horner folds per cell
    # (depth× the hash work — the dominant build cost; measured 1.9×
    # end-to-end at depth=4, sf0.1). CollapseProject keeps the alias: it
    # never inlines a non-cheap expression referenced more than once.
    u_col = F.col("__cms_u")
    cells = F.array(
        *[
            F.struct(
                F.lit(j).alias("j"),
                (((u_col * F.lit(a) + F.lit(b)) % F.lit(HASH_MOD)) % width)
                .cast("int")
                .alias("pos"),
            )
            for j, (a, b) in enumerate(coeffs)
        ]
    )
    return (
        df.withColumn("__cms_u", _mix(h1, h2))
        .select(F.explode(cells).alias("c"))
        .select(F.col("c.j").alias("j"), F.col("c.pos").alias("pos"))
        .groupBy("j", "pos")
        .agg(F.count("*").cast("long").alias("cnt"))
        # build geometry rides every cell row (like bloom_build's one-row
        # metadata): cms_query/cms_merge assert against it, because a
        # probe or merge under mismatched width/depth/seed returns
        # plausible-looking WRONG counts instead of failing
        .select(
            "j", "pos", "cnt",
            F.lit(int(width)).cast("int").alias("width"),
            F.lit(int(depth)).cast("int").alias("depth"),
            F.lit(int(seed)).cast("long").alias("seed"),
        )
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge CMS states cell-wise (union of multisets = sum of counts —
    exact, like the HLL register max). Refuses to merge sketches whose
    recorded (width, depth, seed) geometries differ — cell-wise sums
    across different hash layouts are meaningless but would otherwise
    produce a plausible-looking sketch."""
    if not sketches:
        raise ValueError("need at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    meta_ok = out.agg(
        (
            F.count_distinct(F.struct("width", "depth", "seed")) <= 1
        ).alias("__ok")
    )
    guard = F.when(F.col("__ok"), F.lit(True)).otherwise(
        F.raise_error(
            F.lit("cms geometry mismatch: cannot merge sketches built "
                  "with different (width, depth, seed)")
        ).cast("boolean")
    )
    return (
        out.join(F.broadcast(meta_ok), F.lit(True), "inner")
        .filter(guard)
        .groupBy("j", "pos", "width", "depth", "seed")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
        .select("j", "pos", "cnt", "width", "depth", "seed")
    )


def cms_query(
    spark: SparkSession,
    sketch: DataFrame,
    values: list[str],
    width: int = 1 << 12,
    depth: int = 4,
    seed: int = 2027,
) -> DataFrame:
    """Point-estimate the multiset count of each value → ``(v,
    estimate)``: min over the ``depth`` cells (absent cell = 0). The
    width/depth/seed must match the build — and are ASSERTED against the
    geometry the sketch rows record (a mismatched probe reads wrong
    cells and returns plausible-looking wrong counts; with this guard it
    raises instead). A ZERO-ROW sketch (``cms_sketch`` over an empty
    DataFrame) is a legitimate, distinct state — it records no geometry
    to assert against and no counts, so every estimate is 0 (the true
    count of anything in an empty multiset; exact-or-over holds) rather
    than a spurious geometry error (r13 advice — the r12 guard's
    ``count > 0`` clause misread "empty" as "mismatched"). Estimates are
    exact-or-over, never under. Plan: the queried (j, pos) set is tiny
    and computed driver-side, so the probe is a broadcast semi-lookup
    against the ≤ depth·width-row sketch — no corpus access at all."""
    from pyspark.sql import SparkSession as _S  # noqa: F401  (sig clarity)

    from kaer_spark.operators.dedup import (
        HASH_BASE as B1,
        HASH_BASE2 as B2,
        HASH_MOD as M1,
        HASH_MOD2 as M2,
        minhash_coeffs,
    )

    if not values:
        raise ValueError("values must be non-empty")
    coeffs = minhash_coeffs(depth, seed)

    def py_mix(a: int, b: int) -> int:
        u = (a * _MIX[0][0] + b) % M1
        for (mul, add), mod in zip(_MIX[1:], [M2, M1, M2, M1]):
            u = (u * mul + add) % mod
        return u

    probes = []
    for v in values:
        x1 = x2 = 0
        for ch in v:
            x1 = (x1 * B1 + ord(ch)) % M1
            x2 = (x2 * B2 + ord(ch)) % M2
        u = py_mix(x1, x2)
        for j, (a, b) in enumerate(coeffs):
            probes.append((v, j, ((u * a + b) % M1) % width))
    pdf = spark.createDataFrame(probes, "v string, j int, pos int")
    # geometry guard INDEPENDENT of probe matches (r12 ADVICE closed the
    # silent escape: a mismatched probe whose (j, pos) positions happen to
    # hit no sketch rows used to fall into the all-NULL "legit absent
    # cell" branch and return 0 — an UNDER-estimate, violating the CMS
    # never-under guarantee). A one-row min/max aggregate of the sketch's
    # recorded geometry cross-joins (broadcast, 1 row) onto every result
    # row, so the mismatch raises even with zero matched cells; the probe
    # join itself stays a pruned broadcast lookup in whole-stage codegen.
    geo = sketch.agg(
        F.count("*").alias("__g_n"),
        F.min("width").alias("__w_lo"),
        F.max("width").alias("__w_hi"),
        F.min("depth").alias("__d_lo"),
        F.max("depth").alias("__d_hi"),
        F.min("seed").alias("__s_lo"),
        F.max("seed").alias("__s_hi"),
    )
    agg = (
        F.broadcast(pdf)
        .join(sketch.select("j", "pos", "cnt"), ["j", "pos"], "left")
        .groupBy("v")
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0)))
            .cast("long")
            .alias("estimate"),
        )
        .crossJoin(F.broadcast(geo))
    )
    # __g_n == 0 (empty sketch) is the documented empty-multiset case:
    # nothing recorded, nothing to assert, every estimate coalesces to 0
    meta_ok = (F.col("__g_n") == 0) | (
        (F.col("__w_lo") == F.lit(int(width)))
        & (F.col("__w_hi") == F.lit(int(width)))
        & (F.col("__d_lo") == F.lit(int(depth)))
        & (F.col("__d_hi") == F.lit(int(depth)))
        & (F.col("__s_lo") == F.lit(int(seed)))
        & (F.col("__s_hi") == F.lit(int(seed)))
    )
    guard = F.when(meta_ok, F.lit(True)).otherwise(
        F.raise_error(
            F.format_string(
                "cms geometry mismatch: probe (width=%s, depth=%s, "
                "seed=%s) vs built (width=%%s, depth=%%s, seed=%%s)"
                % (int(width), int(depth), int(seed)),
                F.col("__w_lo"), F.col("__d_lo"), F.col("__s_lo"),
            )
        ).cast("boolean")
    )
    return agg.filter(guard).select("v", "estimate")
