"""Join helpers for skewed data.

Spark's AQE skew-join (enabled by default in `EngineConfig`) splits
oversized partitions at runtime for sort-merge joins. Explicit salting
remains the tool when AQE can't help: shuffle-hash joins, aggregations
immediately after the join that need the spread too, or a known
heavy-hitter key distribution at plan time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: list[str],
    how: str = "inner",
    salts: int = 16,
) -> DataFrame:
    """Equi-join that spreads each hot key over ``salts`` reducers.

    The skewed side gets a deterministic per-row salt (hash of the whole
    row, so rows of one hot key scatter uniformly); the other side is
    replicated once per salt value and the join key becomes
    ``on + [_salt]``. Cost: the other side's shuffle volume × ``salts``
    — use with the *smaller* relation as ``other``. Result is identical
    to ``skewed.join(other, on, how)``.

    Deterministic (xxhash64, no rand()), so results are stable across
    retries and cluster shapes.
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(
            f"salted_join supports inner/left joins, got {how!r} "
            "(replicating the other side breaks right/full semantics)"
        )
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(salts)
    ).cast("int")
    left = skewed.withColumn("_salt", salt)
    right = other.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salts - 1)))
    )
    return left.join(right, on + ["_salt"], how).drop("_salt")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str,
    right_time: str,
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Backward AS-OF join: each left row gains the right row with the
    greatest ``right_time <= left_time`` for the same key (the
    time-series "latest value as of" join — DuckDB spells it
    ``ASOF LEFT JOIN``; Spark has no native operator).

    Spark-first plan: tag + union + window carry-forward.

    - both sides project to a common shape with a ``_side`` tag
      (0 = right, 1 = left) and the right payload (NULL on left rows);
    - ONE shuffle partitions by the key and sorts by
      (time, _side) — a right row at the same timestamp as a left row
      sorts first, so ``<=`` matches it;
    - ``last(payload IGNORE NULLS)`` over rows UNBOUNDED PRECEDING..
      CURRENT carries the latest right payload forward;
    - keep the left rows.

    No range cross-product, no per-key iteration: cost is a single
    sort-shuffle of |left| + |right| rows, the same shape as a regular
    sort-merge join — at 100 TB that is the floor for any as-of
    algorithm without a pre-sorted layout. Right payload columns are
    suffixed to avoid collisions.
    """
    from pyspark.sql import types as T

    rc = right_cols or [
        c for c in right.columns if c not in on and c != right_time
    ]
    payload = [f"{c}{suffix}" for c in rc]
    # The whole right payload travels as ONE struct: the struct is
    # non-null exactly on right rows, so ``last(IGNORE NULLS)`` skips the
    # left-side placeholders but never skips a genuine NULL *field* — the
    # matched right row is carried atomically, not torn per-column from
    # different right rows.
    rp_type = T.StructType([right.schema[c] for c in rc]).simpleString()
    lhs = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("_side"),
        F.lit(None).cast(rp_type).alias("_rp"),
        F.col(left_time).alias("_t"),
    )
    rhs = right.select(
        *[F.lit(None).cast(dict(left.dtypes).get(c, "string")).alias(c) if c not in on else F.col(c) for c in left.columns],
        F.lit(0).alias("_side"),
        F.struct(*[F.col(c) for c in rc]).alias("_rp"),
        F.col(right_time).alias("_t"),
    )
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_t"), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = lhs.unionByName(rhs).select(
        *[c for c in left.columns],
        F.col("_side"),
        F.last("_rp", ignorenulls=True).over(w).alias("_rp"),
    )
    out = carried.filter(F.col("_side") == 1).select(
        *[c for c in left.columns],
        *[F.col(f"_rp.{c}").alias(p) for c, p in zip(rc, payload)],
    )
    return out


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_val: str,
    right_lo: str,
    right_hi: str,
    bin_width: float,
    on: list[str] | None = None,
) -> DataFrame:
    """Interval join: rows where ``left.left_val BETWEEN right.right_lo
    AND right.right_hi`` (optionally also matching key columns ``on``).

    Spark's planner turns a bare BETWEEN join into a nested-loop /
    cartesian — O(|L|·|R|). This operator bins the value axis instead:
    each right interval explodes into the fixed-width bins it covers,
    each left row maps to exactly one bin, and the join is a plain
    equi-join on (key, bin) followed by the exact BETWEEN verify. Cost
    O(|R| · avg_span/bin_width + |L|) rows through one hash shuffle —
    ``bin_width`` trades right-side replication against candidate
    pruning (pick ≈ the median interval span).
    """
    lo_bin = F.floor(F.col(right_lo) / F.lit(bin_width)).cast("long")
    hi_bin = F.floor(F.col(right_hi) / F.lit(bin_width)).cast("long")
    r = right.withColumn("_bin", F.explode(F.sequence(lo_bin, hi_bin)))
    l = left.withColumn(
        "_bin", F.floor(F.col(left_val) / F.lit(bin_width)).cast("long")
    )
    keys = (list(on) if on else []) + ["_bin"]
    return (
        l.join(r, keys)
        .filter(
            (F.col(left_val) >= F.col(right_lo))
            & (F.col(left_val) <= F.col(right_hi))
        )
        .drop("_bin")
    )
