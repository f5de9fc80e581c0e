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
