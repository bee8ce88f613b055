"""Sequence packing: assign documents to fixed-token-budget training packs.

LLM pretraining consumes fixed-length context windows; the corpus step that
feeds it is "concatenate documents in a deterministic order, cut every
``max_tokens``" (the standard concat-and-chunk used by GPT/LLaMA-style
pipelines — documents may straddle a boundary; the pack index of a document
is where its FIRST token lands). That formulation is exactly expressible as
a running token total:

    pack(d) = floor(exclusive_cumsum_tokens(d) / max_tokens)

which Spark evaluates as a window cumsum — no Python, no sequential fold.

Scale shape: a single global cumsum would serialize on one reducer, so the
corpus is sharded by ``id mod shards`` (each shard is an independent
concat stream — the real-world equivalent of writing N output files) and
the cumsum runs per shard in parallel. Deterministic: same ids → same
packs on every run/engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kaer_spark.functions.text import token_count


def pack_sequences(
    df: DataFrame,
    max_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    shards: int = 32,
    tokens_col: Column | None = None,
    overhead_tokens: int = 0,
) -> DataFrame:
    """Assign each row a ``(shard, pack_id)`` plus its token count.

    ``tokens_col`` overrides the token counter (default: the engine-wide
    whitespace ``token_count`` over ``text_col`` — swap in a BPE count for
    production packing). Documents are packed in ascending id order within
    their shard; ``pack_id`` is the chunk index of the document's first
    token in the shard's concat stream. ``overhead_tokens`` adds a fixed
    per-document cost to the stream (the EOS/BOS separator tokens real
    packers insert between documents) — it rides the same cumsum, so
    boundaries shift exactly as if every document were that much longer;
    ``n_tokens`` still reports the document's own count.
    """
    if max_tokens <= 0:
        raise ValueError("max_tokens must be positive")
    if overhead_tokens < 0:
        raise ValueError("overhead_tokens must be >= 0")
    toks = tokens_col if tokens_col is not None else token_count(text_col)
    out = df.withColumn("n_tokens", toks.cast("long")).withColumn(
        "__cost", F.col("n_tokens") + F.lit(int(overhead_tokens))
    ).withColumn(
        "shard", F.pmod(F.col(id_col).cast("long"), F.lit(int(shards)))
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    excl = F.coalesce(F.sum("__cost").over(w), F.lit(0).cast("long"))
    # integer DIV (not `/` + floor): exact at any cumsum magnitude
    return out.withColumn("__excl", excl).withColumn(
        "pack_id", F.expr(f"__excl DIV {int(max_tokens)}")
    ).drop("__excl", "__cost")


def pack_stats(packed: DataFrame) -> DataFrame:
    """Per-(shard, pack) fill statistics — the packing-efficiency report."""
    return packed.groupBy("shard", "pack_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("sum_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


def shard_assign(
    df: DataFrame,
    shards: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: Column | None = None,
    rank_partitions: int = 32,
) -> DataFrame:
    """Balanced output sharding: serpentine round-robin over the global
    token-count order.

    Writing a curated corpus as ``shards`` training files wants the files
    token-balanced (a straggler shard = a straggler data-loader worker).
    ``pack_sequences`` balances WITHIN a stream; this balances ACROSS the
    output files. Deterministic rule: sort all docs by ``n_tokens`` DESC
    (ties by id), 0-based global rank ``r``, then boustrophedon
    round-robin —

        shard(r) = r % S          if (r DIV S) even
                   S-1 - (r % S)  if (r DIV S) odd

    so every window of 2S consecutive ranks gives each shard one
    larger-half and one smaller-half doc; the final spread is bounded by
    a single document's count, independent of corpus size (the classic
    folded-deal LPT approximation — greedy LPT itself is inherently
    sequential and not replayable in SQL).

    Scale shape: Spark has no scalable global ``row_number`` (a single
    unpartitioned window is one reducer), so the rank is two-phase —
    ``repartitionByRange`` on the sort key (the same machinery as a
    global ``orderBy``; ~terasort, known to hold at 100 TB), per-range
    ``row_number``, then per-range counts (≤ ``rank_partitions`` rows)
    collected once and rejoined broadcast as rank offsets. Total cost:
    one range shuffle + one bounded collect; no global window, no driver
    loop over rows. Exactness does not depend on the range boundaries
    (only on ranges being ordered, which RangePartitioner guarantees);
    the key ``(n_tokens DESC, id ASC)`` is a total order, so the rank —
    and therefore the assignment — is engine-reproducible.
    """
    if shards <= 0:
        raise ValueError("shards must be positive")
    if rank_partitions <= 0:
        raise ValueError("rank_partitions must be positive")
    toks = tokens_col if tokens_col is not None else token_count(text_col)
    out = df.withColumn("n_tokens", toks.cast("long"))
    key = [F.col("n_tokens").desc(), F.col(id_col).asc()]
    ranged = out.repartitionByRange(int(rank_partitions), *key).withColumn(
        "__pid", F.spark_partition_id()
    )
    # The counts job and the final job each re-execute this range shuffle;
    # the offsets keyed on __pid stay valid across them because (a) the
    # RangePartitioner's boundary sample is seeded per partition index —
    # identical input splits give identical boundaries — and (b) AQE never
    # coalesces an explicit REPARTITION_BY_NUM exchange, so the partition
    # index spark_partition_id() reports is the same function of the data
    # in both executions.
    # bounded collect: one row per range partition, never per data row
    counts = sorted(
        (r["__pid"], r["cnt"])
        for r in ranged.groupBy("__pid").agg(F.count("*").alias("cnt")).collect()
    )
    offsets, acc = [], 0
    for pid, cnt in counts:
        offsets.append((pid, acc))
        acc += cnt
    spark = df.sparkSession
    off_df = spark.createDataFrame(offsets or [(0, 0)], "__pid INT, __off LONG")
    local = F.row_number().over(
        Window.partitionBy("__pid").orderBy(*key)
    )
    rank = (F.col("__off") + F.col("__lr") - F.lit(1)).cast("long")
    block_odd = F.expr(f"pmod(rank DIV {int(shards)}, 2) = 1")
    pos = F.pmod(F.col("rank"), F.lit(int(shards)))
    return (
        ranged.withColumn("__lr", local)
        .join(F.broadcast(off_df), "__pid")
        .withColumn("rank", rank)
        .withColumn(
            "shard",
            F.when(block_odd, F.lit(int(shards) - 1) - pos).otherwise(pos),
        )
        .drop("__pid", "__lr", "__off")
    )


def shard_manifest(assigned: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Per-shard manifest of a ``shard_assign`` output — the report a
    writer job would use to name/size the output files."""
    return assigned.groupBy("shard").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("sum_tokens"),
        F.min(id_col).alias("min_id"),
        F.max(id_col).alias("max_id"),
    )
