"""Count-min sketch + exact-verified heavy hitters.

Frequent-item analysis over a 100 TB corpus (top tokens, domains, URLs,
near-dup cluster sizes) can't afford ``GROUP BY value`` when the value
space has billions of distinct members: the shuffle carries one partial
count per distinct value per map task — the long tail IS the shuffle.
The classic sketch answer (Cormode & Muthukrishnan's count-min, the
same estimator family behind the approximation surface the reference
inherits from its DuckDB execution layer — SURVEY.md §2.4's
``approx_count_distinct`` row) bounds state at d×w counters regardless
of cardinality.

Spark-first decomposition, no UDFs and no driver state:

1. **Build** (``count_min``): each row contributes d (row, bucket)
   pairs — a d-element inline array explode — and ONE map-side-combined
   aggregation folds them into ≤ d×w cells. The shuffle is bounded by
   the sketch size, not the value cardinality.
2. **Densify**: the sparse cells become d bucket-indexed arrays in a
   ONE-ROW DataFrame (transform over 0..w-1) — O(1) lookups downstream,
   built once.
3. **Filter + exact verify** (``heavy_hitters``): a broadcast of the
   one-row sketch joins every row; ``least`` over the d array lookups
   is the classic min-estimate. Rows whose estimate clears the
   threshold proceed to an EXACT count restricted to survivors.

The result is **exact, not approximate**: count-min never
underestimates (hashing can only merge counts), so every value with
true count ≥ T survives the filter — the sketch only prunes; the final
``HAVING count ≥ T`` removes the false positives. The DuckDB oracle is
therefore plain ``GROUP BY ... HAVING`` — a rare sketch with an exact
oracle row. Accuracy economics: the verify pass aggregates only
surviving rows, whose expected volume is the true heavy mass plus
N·d·(1/w)-scale collision noise — with w sized ≥ ~100/φ for a φN
threshold, survivors are dominated by true heavy hitters.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(item: Column, i: int, w: int) -> Column:
    """Row-hash i's bucket for the item: xxhash64 seeded by the row
    index (pairwise-independent enough for CM's Markov bound)."""
    return F.pmod(F.xxhash64(item, F.lit(i)), F.lit(w)).cast("int")


def count_min(
    df: DataFrame, col: str | Column, d: int = 4, w: int = 4096
) -> DataFrame:
    """d×w count-min sketch of ``col`` as a ONE-ROW DataFrame with a
    ``cms`` column: map<row-index, dense bucket array> (lookup =
    ``try_element_at(try_element_at(cms, i), bucket+1)``).

    One explode (×d) + one bounded aggregation; the one-row densify
    runs on ≤ d×w cells. Sketches over different DataFrames merge by
    cell-wise addition (counters are linear) — partition-parallel
    builds need no special merge path because the groupBy already IS
    the merge."""
    item = (F.col(col) if isinstance(col, str) else col).cast("string")
    pair = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("i"), _bucket(item, i, w).alias("b")
                )
                for i in range(d)
            ]
        )
    ).alias("p")
    cells = (
        df.where(item.isNotNull())
        .select(pair)
        .groupBy("p.i", "p.b")
        .agg(F.count("*").alias("cnt"))
    )
    return densify(cells, w)


def densify(cells: DataFrame, w: int) -> DataFrame:
    """Sparse ``(i, b, cnt)`` cells → the ONE-ROW ``cms`` frame
    (map<row-index, dense bucket array>). Fully distributed (two
    bounded aggregations over ≤ d×w cells) — shared by the batch build
    above and the streaming sink (streaming/sketch.py), whose
    cross-batch merged cells densify without any driver collect."""
    dense = cells.groupBy("i").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("b", "cnt")))
        ).alias("m")
    )
    dense = dense.select(
        "i",
        F.transform(
            F.sequence(F.lit(0), F.lit(w - 1)),
            lambda x: F.coalesce(F.try_element_at("m", x), F.lit(0)),
        ).alias("arr"),
    )
    return dense.groupBy().agg(
        F.map_from_entries(F.collect_list(F.struct("i", "arr"))).alias(
            "cms"
        )
    )


def cm_estimate(cms: Column, item: Column, d: int, w: int) -> Column:
    """Min over the d row estimates — the count-min upper bound on the
    item's true count (d map probes + O(1) array reads per row)."""
    item = item.cast("string")
    return F.least(
        *[
            F.coalesce(
                F.try_element_at(
                    F.try_element_at(cms, F.lit(i)),
                    _bucket(item, i, w) + F.lit(1),
                ),
                F.lit(0),
            )
            for i in range(d)
        ]
    )


def heavy_hitters(
    df: DataFrame,
    col: str | Column,
    threshold: int,
    d: int = 4,
    w: int = 4096,
) -> DataFrame:
    """EXACT ``(value, cnt)`` of every value with count ≥ threshold,
    via a count-min pre-filter (module docstring). Returns columns
    ``(value STRING, cnt BIGINT)``; deterministic under any
    partitioning (hash buckets are content-only)."""
    item = (F.col(col) if isinstance(col, str) else col).cast("string")
    cms = F.broadcast(count_min(df, col, d, w))
    survivors = (
        df.select(item.alias("value"))
        .where(F.col("value").isNotNull())
        .crossJoin(cms)
        .where(cm_estimate(F.col("cms"), F.col("value"), d, w) >= threshold)
    )
    return (
        survivors.groupBy("value")
        .agg(F.count("*").alias("cnt"))
        .where(F.col("cnt") >= threshold)
    )
