"""Sequence packing for LLM training batches.

Pretraining pipelines concatenate tokenized documents in a fixed,
deterministic order and slice the stream into fixed-length context
windows ("concat-and-chunk" packing). The operator here computes, for
every document, its byte/token offset in that virtual stream and the
context window (pack) its first token lands in — i.e. a distributed
exclusive prefix sum over the document order.

A naive SQL formulation — ``sum(len) OVER (ORDER BY id)`` with no
PARTITION BY — is a single-partition window: at 100 TB one task sorts
and scans everything. This implementation is the two-phase distributed
prefix sum instead:

1. bucket each row by id range (pure projection — no data-dependent
   state; bucket count is a knob, default ≥ cluster parallelism),
2. per-bucket windowed cumsum (shuffle on the bucket key; each bucket
   sorts only its own slice, all buckets in parallel),
3. bucket base offsets = windowed cumsum over the per-bucket totals —
   a single-partition window over *bucket-count* rows (KBs), then a
   broadcast-sized join back.

The result is byte-identical to the single-partition SQL form (integer
arithmetic, associative +), which is exactly what the DuckDB oracle
runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    ctx_len: int = 2048,
    id_col: str = "doc_id",
    size_col: str = "n_tokens",
    buckets: int = 64,
) -> DataFrame:
    """Assign every document its start offset in the concatenated token
    stream (documents ordered by ``id_col``), the pack (context window
    of ``ctx_len`` tokens) containing that offset, and the offset within
    the pack. Output columns: id, size, ``start_off``, ``pack_id``,
    ``pack_off``. A document longer than the remaining space in its pack
    spills into the following pack(s) — concat-and-chunk semantics (no
    padding, no document loss), matching GPT-style pretraining loaders.
    """
    lo, hi = df.agg(
        F.min(F.col(id_col).cast("long")), F.max(F.col(id_col).cast("long"))
    ).first()
    if lo is None:  # empty input
        return df.select(
            F.col(id_col),
            F.col(size_col).cast("long").alias(size_col),
            F.lit(0).cast("long").alias("start_off"),
            F.lit(0).cast("long").alias("pack_id"),
            F.lit(0).cast("long").alias("pack_off"),
        ).limit(0)
    span = max(1, (int(hi) - int(lo) + buckets) // buckets)
    b = df.select(
        F.col(id_col).cast("long").alias(id_col),
        F.col(size_col).cast("long").alias(size_col),
    ).withColumn("_bkt", ((F.col(id_col) - F.lit(int(lo))) / span).cast("long"))

    w_in = (
        Window.partitionBy("_bkt")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = b.withColumn("_cum", F.sum(size_col).over(w_in))

    # Bucket base offsets: exclusive cumsum over per-bucket totals.
    # `buckets` rows total — the single-partition window is deliberate
    # and harmless here, and the join back is broadcast-sized.
    totals = b.groupBy("_bkt").agg(F.sum(size_col).alias("_tot"))
    w_b = (
        Window.orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.withColumn(
        "_base", F.coalesce(F.sum("_tot").over(w_b), F.lit(0))
    ).select("_bkt", "_base")

    start = F.col("_base") + F.col("_cum") - F.col(size_col)
    return (
        within.join(F.broadcast(offsets), "_bkt")
        .select(
            id_col,
            size_col,
            start.alias("start_off"),
            F.floor(start / ctx_len).cast("long").alias("pack_id"),
            (start % ctx_len).cast("long").alias("pack_off"),
        )
    )


def pack_summary(
    packed: DataFrame, ctx_len: int = 2048, size_col: str = "n_tokens"
) -> DataFrame:
    """Per-pack occupancy: how many documents *start* in each pack and
    how many of that pack's tokens belong to documents starting there —
    the packing-efficiency view (tail packs of long documents show up
    as packs no document starts in)."""
    here = F.least(F.col("pack_off") + F.col(size_col), F.lit(ctx_len)) - F.col(
        "pack_off"
    )
    return (
        packed.groupBy("pack_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(here).cast("long").alias("tokens_here"),
        )
        .orderBy("pack_id")
    )
