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
  sort, with map-side WindowGroupLimit bounding every partition's
  contribution to k rows). For billions-per-stratum inputs,
  ``auto_prefilter=True`` (r7) bounds the per-stratum sort to O(k)
  rows with an exact detect-and-recompute fallback.
- ``weighted_sample_k``: exactly ``k`` rows per stratum with inclusion
  probability ∝ a weight column — the Efraimidis–Spirakis exp-race,
  same determinism/merge contract.
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
    auto_prefilter: bool = False,
    _prefilter_slack: float = 4.0,
) -> DataFrame:
    """Exactly min(k, |stratum|) rows per stratum, chosen uniformly and
    deterministically by the md5 ranking key (id tiebreak makes the pick
    total even under md5-prefix collisions).

    ``auto_prefilter=True`` adds the density pre-filter the module
    docstring previously left manual (same construction as the KMV
    sketch build, operators/sketch.py): ranking keys are uniform, so a
    stratum with n̂ rows (one approx count pass) has its k-th smallest
    key near k/n̂ — filtering at ``slack·k/n̂`` BEFORE the window cuts
    the per-stratum sort to O(k) rows regardless of stratum size, at
    the cost of a second scan. The result is IDENTICAL to the
    unfiltered pick: the filter can only drop rows ranked beyond k
    except with ~exp(-k) tail probability, and strata whose filtered
    pick came back short while the estimate says more rows exist
    recompute unfiltered (semi-join pruned) — correctness never rests
    on the tail bound."""
    w = Window.partitionBy(*strata_cols).orderBy(
        sample_key(id_col, salt), F.col(id_col)
    )

    def _pick(src: DataFrame) -> DataFrame:
        return (
            src.withColumn("_srk", F.row_number().over(w))
            .filter(F.col("_srk") <= k)
            .drop("_srk")
        )

    if not auto_prefilter:
        return _pick(df)
    est = df.groupBy(*strata_cols).agg(
        F.count("*").alias("__swl_n")
    )
    keyed = df.join(est, on=strata_cols)
    # numeric key space: the 8-hex-char md5 prefix as a bigint
    keynum = F.conv(sample_key(id_col, salt), 16, 10).cast("bigint")
    cut = F.least(
        F.lit(float(_KEY_SPACE)),
        F.lit(_prefilter_slack * k) * F.lit(float(_KEY_SPACE))
        / F.col("__swl_n"),
    )
    surv = keyed.filter(keynum < cut).drop("__swl_n")
    picked = _pick(surv)
    # detect from est's side: a stratum whose filtered pick came back
    # EMPTY never appears in picked at all, and must still recompute
    got = picked.groupBy(*strata_cols).agg(F.count("*").alias("__swl_got"))
    short = (
        est.join(got, on=strata_cols, how="left")
        .withColumn("__swl_got", F.coalesce(F.col("__swl_got"), F.lit(0)))
        .filter(
            (F.col("__swl_got") < F.lit(k))
            & (F.col("__swl_n") > F.col("__swl_got"))
        )
        .select(*strata_cols)
    )
    if len(short.take(1)) == 0:
        return picked
    ok = picked.join(short, on=strata_cols, how="left_anti")
    redo = _pick(
        df.join(F.broadcast(short.distinct()), on=strata_cols, how="left_semi")
    )
    return ok.unionByName(redo)


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


def weighted_sample_k(
    df: DataFrame,
    k: int,
    weight_col: str,
    strata_cols: list[str] | None = None,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Exactly min(k, |positive-weight rows|) rows per stratum with
    inclusion probability proportional to ``weight_col`` — the
    Efraimidis–Spirakis weighted reservoir (A-ES): each row draws a
    deterministic uniform u from its id hash and races with key
    ``-ln(u)/w`` (an Exponential(w) arrival); the k SMALLEST keys win,
    which is exactly weighted sampling without replacement. Training
    use: sample documents proportional to token count, domains
    proportional to mixture weight, clusters proportional to size.

    Deterministic and layout-independent like every operator here (u
    is content-derived, not RNG); mergeable (the winners of two halves'
    winners are the winners of the union — same race keys); the
    per-stratum pick is a rank-limit window Spark bounds map-side
    (WindowGroupLimit). Rows with weight ≤ 0 or NULL never win
    (they race at +infinity). The salt decorrelates repeat draws."""
    strata_cols = list(strata_cols or [])
    # u in (0, 1]: (key+1) / 16^8 over the md5-prefix space — never 0,
    # so ln(u) is finite; u = 1 races at 0/w, still weight-ordered
    u = (
        F.conv(sample_key(id_col, salt), 16, 10).cast("double") + F.lit(1.0)
    ) / F.lit(float(_KEY_SPACE))
    wcol = F.col(weight_col).cast("double")
    race = F.when(
        wcol > 0, -F.log(u) / wcol
    ).otherwise(F.lit(float("inf")))
    w = Window.partitionBy(*strata_cols).orderBy(
        race.asc(), F.col(id_col)
    )
    return (
        df.withColumn("_swr", F.row_number().over(w))
        .filter((F.col("_swr") <= k) & (wcol > 0))
        .drop("_swr")
    )
