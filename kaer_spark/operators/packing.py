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
