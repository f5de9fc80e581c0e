"""Deterministic sampling operators for dataset curation.

Training-data pipelines need *reproducible* sampling — the same corpus
snapshot must yield the same sample on every run, cluster shape, and
partition layout, or ablations and train/test splits silently drift.
Spark's ``df.sample()`` is seed-stable only per partition layout, so
none of these use it. Instead every operator derives a uniform ranking
key from ``md5`` of the row's stable id (a pure, JVM-evaluated
projection — identical output in DuckDB, which makes every operator
here oracle-checkable by hash):

- ``bernoulli_sample``: keep rows whose 32-bit md5 prefix falls below
  the fraction threshold. A narrow filter — no shuffle, no state;
  scales to any size by construction.
- ``stratified_sample``: exactly ``k`` rows per stratum, picked by the
  md5 ranking within each stratum. One shuffle on the strata key;
  per-stratum state is a top-k heap (``row_number`` + filter collapses
  to a windowed rank Spark evaluates streaming per group after the
  sort). A pathologically hot stratum concentrates one group's sort on
  one executor — for billions-per-stratum inputs, pre-filter with
  ``bernoulli_sample`` at a few × k/|stratum| first (documented, not
  automatic).
- ``train_test_split``: labels every row 'train'/'test' by hash range —
  disjoint, exhaustive, stable under re-runs and re-partitioning.

The salt parameter decorrelates independent samples drawn from the same
ids (different salt → independent uniform keys).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# 32-bit hex space of the md5-prefix ranking key.
_KEY_SPACE = 16**8


def sample_key(id_col: str | Column, salt: str = "") -> Column:
    """Uniform deterministic ranking key: first 8 hex chars of
    ``md5(salt || cast(id as string))``. Lexicographic order on the hex
    prefix == numeric order on the top 32 bits, and both Spark and
    DuckDB produce the identical lowercase-hex md5 of the identical
    string rendering, so thresholds/ranks transfer across engines."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.substring(F.md5(F.concat(F.lit(salt), c.cast("string"))), 1, 8)


def _threshold_hex(fraction: float) -> str:
    f = min(max(fraction, 0.0), 1.0)
    return format(min(int(round(f * _KEY_SPACE)), _KEY_SPACE - 1), "08x")


def bernoulli_sample(
    df: DataFrame, fraction: float, id_col: str = "doc_id", salt: str = ""
) -> DataFrame:
    """Deterministic ~fraction sample: keep iff md5-prefix(id) <
    threshold. Expected size = fraction·n with binomial concentration;
    membership of a given id never changes across runs or layouts."""
    if fraction >= 1.0:
        # 'ffffffff' keys would fail a strict-< threshold comparison;
        # a full sample must really mean every row.
        return df
    return df.filter(sample_key(id_col, salt) < F.lit(_threshold_hex(fraction)))


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    k: int,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Exactly min(k, |stratum|) rows per stratum, chosen uniformly and
    deterministically by the md5 ranking key (id tiebreak makes the pick
    total even under md5-prefix collisions)."""
    w = Window.partitionBy(*strata_cols).orderBy(
        sample_key(id_col, salt), F.col(id_col)
    )
    return (
        df.withColumn("_srk", F.row_number().over(w))
        .filter(F.col("_srk") <= k)
        .drop("_srk")
    )


def train_test_split(
    df: DataFrame,
    test_fraction: float = 0.1,
    id_col: str = "doc_id",
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Adds ``split`` ∈ {'train','test'}: hash-range assignment, so the
    partition is disjoint+exhaustive and any future re-run (or a
    different engine) reproduces it row-for-row."""
    if test_fraction >= 1.0:
        return df.withColumn(split_col, F.lit("test"))
    return df.withColumn(
        split_col,
        F.when(
            sample_key(id_col, salt) < F.lit(_threshold_hex(test_fraction)),
            F.lit("test"),
        ).otherwise(F.lit("train")),
    )
