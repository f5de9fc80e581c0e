"""TPC-H-shaped bench suite (Q1–Q22), adapted to the slimmed synthetic
schema (FIXTURES.md — no partsupp, no l_commitdate/receiptdate/shipmode,
single-word p_type, NATION_n names, 1995–2001 dates).

Each query preserves the *shape* of its TPC-H counterpart — join graph,
aggregate complexity, subquery structure — which is what the reference's
benchmark exercises (`/root/reference/tests/benchbase/tpch-flight-sql.xml:26`,
BASELINE.md per-query latencies). All queries are deterministic (total
ORDER BY with tiebreakers, order-independent decimal sums via ``dsum``)
and dialect-common, so they double as oracle correctness entries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from swanlake_spark.queries.oracle import (
    QuerySpec,
    dsum,
    dsum_raw,
    ensure_tables,
    rstable,
)

TPCH_QUERIES: dict[str, QuerySpec] = {}


# Interactive profile for sub-second multi-stage queries: static plan
# (no AQE stage-by-stage re-planning); see QuerySpec.exec_conf.
# r7: A/B-measured across every AQE-on query — the per-stage re-plan
# latency costs 10-30 % of wall on this sub-second class (q6 -24 %,
# q8 -26 %, q10 -25 %, q17 -29 %, q21 -26 %, q1/q7/q9/q12/q14/q15/q19
# -5..-12 %); only q20 measured flat and keeps AQE (its range sort is
# the scale path). Profiles are SF-gated (bench.py apply_profiles), so
# sf >= 1 runs keep AQE everywhere.
_INTERACTIVE = {"spark.sql.adaptive.enabled": "false"}

# Dim-broadcast / fact-stream profile: Catalyst's pruned-size estimate
# can put the FACT side under the default 10 MB broadcast threshold at
# bench SFs, planning a broadcast BUILD of the largest table (measured:
# q5's default plan streamed orders and broadcast-built 600k lineitem
# rows — 0.74 s vs 0.46 s). A 1 MB threshold keeps the scale-invariant
# dims (nation/region/supplier, tiny filtered slices) broadcast and the
# fact tables in shuffle joins — the SAME shape these plans take at
# production scale, so the bench profile and the 100 TB plan agree.
_DIM_BROADCAST = {
    **_INTERACTIVE,
    "spark.sql.autoBroadcastJoinThreshold": str(1 << 20),
}


def _strip_trailing_order(sql: str) -> str:
    """Drop a TRAILING ``ORDER BY`` clause (final_sort replaces it).

    Only the last clause of the statement qualifies — if anything after
    the last ``ORDER BY`` closes a parenthesis it belongs to a subquery
    and stripping would change semantics, so that is a hard error.
    """
    s = sql.rstrip()
    i = s.upper().rfind("ORDER BY")
    if i == -1:
        return s
    assert ")" not in s[i:], f"trailing ORDER BY not last clause: {s[i:]}"
    return s[:i]


# Every final_sort application must PROVE its output is answer-sized —
# bounded by a fixed domain product or a self-bounding HAVING, never
# SF-linear. Populated by _tpch(sort_bound=...); the plan test
# (test_plan_quality.py) pins the per-query decision so an unbounded
# query can't silently adopt the single-task finish (q20's output is
# ~400×SF suppliers: at extreme scale one task would sort tens of
# millions of rows, so q20 keeps the range sort).
FINAL_SORT_BOUNDS: dict[str, str] = {}


def _tpch(
    n: int,
    spark_sql: str,
    duck_sql: str | None = None,
    exec_conf: dict[str, str] | None = None,
    final_sort: list[str] | None = None,
    sort_bound: str | None = None,
) -> None:
    """Register a TPC-H query.

    ``final_sort`` (column names, ``-`` prefix = DESC) replaces the
    query's trailing ORDER BY with ``coalesce(1).sortWithinPartitions``:
    the Spark SQL omits the ORDER BY, and the total order is produced by
    merging the final-aggregate partitions into ONE task and sorting
    there. A global ORDER BY plans a RangePartitioning exchange, which
    costs a separate SAMPLING pass over the input plus one more shuffle
    stage — two scheduling round-trips to order a result that is
    ANSWER-sized. Sorting the answer in one task is O(answer) at any
    scale factor — the same finish a 100 TB run wants — while the saved
    stages are ~40 % of the wall time of a 0.2 s interactive query. The
    DuckDB oracle keeps the ORDER BY form.

    ``sort_bound`` is REQUIRED with ``final_sort``: a one-line proof
    that the output cardinality is independent of scale factor (fixed
    attribute domain, bounded domain product, or self-bounding
    predicate). Queries whose output grows with SF must not pass
    ``final_sort`` — the trailing ORDER BY stays and Spark plans a
    range sort that scales out.
    """
    name = f"tpch_q{n}"
    assert (final_sort is None) == (sort_bound is None), (
        f"{name}: final_sort requires a documented sort_bound (and "
        "sort_bound without final_sort is dead text)"
    )
    if final_sort:
        FINAL_SORT_BOUNDS[name] = sort_bound
        duck_sql = duck_sql or spark_sql
        spark_sql = _strip_trailing_order(spark_sql)

    def build(
        spark: SparkSession, sf_dir: str, _sql=spark_sql, _fs=final_sort
    ) -> DataFrame:
        ensure_tables(spark, sf_dir)
        df = spark.sql(_sql)
        if _fs:
            from pyspark.sql import functions as F

            cols = [
                F.col(c[1:]).desc() if c.startswith("-") else F.col(c)
                for c in _fs
            ]
            df = df.coalesce(1).sortWithinPartitions(*cols)
        return df

    TPCH_QUERIES[name] = QuerySpec(
        name, build, duck_sql or spark_sql, exec_conf=exec_conf
    )


# Q1 — pricing summary report (full scan + 8-aggregate groupBy).
# l_quantity/l_discount sums-avgs over integral/2-decimal doubles:
# qty is exact; price aggregates are decimal-summed.
_tpch(
    1,
    f"""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           {dsum('l_extendedprice')} AS sum_base_price,
           {dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           {rstable('avg(l_quantity)')} AS avg_qty,
           {rstable(dsum_raw('l_extendedprice') + ' / count(*)')} AS avg_price,
           {rstable(dsum_raw('l_discount') + ' / count(*)')} AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    final_sort=["l_returnflag", "l_linestatus"],
    exec_conf=_INTERACTIVE,
    sort_bound="returnflag(3) x linestatus(2) = <=6 groups, fixed domain",
)

# Q2 — min-cost supplier (correlated subquery + 5-way join + top-N);
# ps_supplycost is approximated by l_extendedprice (exact double compare).
# Spark side decorrelates by hand: the correlated min re-joins the whole
# lineitem→supplier→nation→region tree a second time (2.3× baseline in
# BENCH_r01); `min() OVER (PARTITION BY p_partkey)` on the already-joined
# EUROPE slice computes the same value in one pass — valid because the
# subquery's domain (all EUROPE lineitems of that part) equals the outer
# join slice per partkey, and p_size is a part-level constant. The DuckDB
# oracle keeps the original correlated form as a cross-check.
_tpch(
    2,
    """
    SELECT s_acctbal, s_name, n_name, p_partkey, p_type, s_suppkey
    FROM (
      SELECT s_acctbal, s_name, n_name, p_partkey, p_type, s_suppkey,
             l_extendedprice,
             min(l_extendedprice) OVER (PARTITION BY p_partkey) AS min_price
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE' AND p_size = 15
    ) priced
    WHERE l_extendedprice = min_price
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey, s_suppkey
    LIMIT 100
    """,
    """
    SELECT s_acctbal, s_name, n_name, p_partkey, p_type, s_suppkey
    FROM part
    JOIN lineitem ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'EUROPE' AND p_size = 15
      AND l_extendedprice = (
        SELECT min(l2.l_extendedprice)
        FROM lineitem l2
        JOIN supplier s2 ON s2.s_suppkey = l2.l_suppkey
        JOIN nation n2   ON s2.s_nationkey = n2.n_nationkey
        JOIN region r2   ON n2.n_regionkey = r2.r_regionkey
        WHERE l2.l_partkey = p_partkey AND r2.r_name = 'EUROPE')
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey, s_suppkey
    LIMIT 100
    """,
    exec_conf=_DIM_BROADCAST,
)

# Q3 — shipping priority (3-way join + groupBy + top-10)
_Q3_SPARK = f"""
    SELECT l_orderkey,
           {dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
           date_format(o_orderdate, 'yyyy-MM-dd') AS odate
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1997-06-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1997-06-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, odate, l_orderkey
    LIMIT 10
"""
_tpch(3, _Q3_SPARK, _Q3_SPARK.replace("date_format(o_orderdate, 'yyyy-MM-dd')",
                                      "strftime(o_orderdate, '%Y-%m-%d')"),
      exec_conf=_DIM_BROADCAST)

# Q4 — order priority checking (EXISTS semi join). Spark side fuses
# the EXISTS into the join (r5 verdict #4): an order qualifies iff SOME
# lineitem has l_shipdate > o_orderdate, i.e. iff at least one row of
# the inner join passes — counting DISTINCT orderkeys after the join is
# the same predicate with one fewer stage than the null-aware semi
# join. The date-filtered orders side is dim-small at every SF (3
# months of headers), so Catalyst broadcasts it from size stats — no
# hint, so at 100 TB (where the slice outgrows the threshold) the plan
# degrades gracefully to a shuffled join + two-phase distinct instead
# of silently OOMing a forced broadcast. DuckDB oracle keeps the EXISTS
# form as cross-check.
_tpch(
    4,
    """
    SELECT o_orderpriority, count(DISTINCT o_orderkey) AS order_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
      AND l_shipdate > o_orderdate
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    """
    SELECT o_orderpriority, count(*) AS order_count FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    exec_conf={**_INTERACTIVE, "spark.sql.shuffle.partitions": "4"},
    final_sort=["o_orderpriority"],
    sort_bound="o_orderpriority domain = 5 values, fixed",
)

# Q5 — local supplier volume (6-way join + region filter)
_tpch(
    5,
    f"""
    SELECT n_name, {dsum('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name ORDER BY revenue DESC, n_name
    """,
    exec_conf=_DIM_BROADCAST,
    final_sort=["-revenue", "n_name"],
    sort_bound="nations in one region <=25, fixed dim cardinality",
)

# Q6 — forecasting revenue change (pure scan + filter + agg)
_tpch(
    6,
    f"""
    SELECT {dsum('l_extendedprice * l_discount')} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
    """,
    exec_conf=_INTERACTIVE,
)

# Q7 — volume shipping (6-way join incl. double nation, OR of nation pairs)
_tpch(
    7,
    f"""
    SELECT supp_nation, cust_nation, l_year, {dsum('volume')} AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS INT) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                           AND TIMESTAMP '1997-12-31 00:00:00'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    final_sort=["supp_nation", "cust_nation", "l_year"],
    exec_conf=_INTERACTIVE,
    sort_bound="2 nation pairs x 2 ship years = <=8 groups, fixed",
)

# Q8 — national market share (8-way join + CASE ratio of decimal sums)
_tpch(
    8,
    f"""
    SELECT o_year,
           {rstable(dsum_raw("CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END")
                    + ' / ' + dsum_raw('volume'))} AS mkt_share
    FROM (
      SELECT CAST(year(o_orderdate) AS INT) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n2.n_name AS nation
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region   ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
        AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                            AND TIMESTAMP '1997-12-31 00:00:00'
    ) all_nations
    GROUP BY o_year ORDER BY o_year
    """,
    final_sort=["o_year"],
    exec_conf=_INTERACTIVE,
    sort_bound="o_year domain = 7 order years, fixed",
)

# Q9 — product type profit (6-way join + LIKE + groupBy nation/year);
# ps_supplycost approximated by p_retailprice.
_tpch(
    9,
    f"""
    SELECT nation, o_year, {dsum('amount')} AS sum_profit
    FROM (
      SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
             l_extendedprice * (1 - l_discount)
               - p_retailprice * l_quantity * 0.01 AS amount
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%widget%'
    ) profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
    final_sort=["nation", "-o_year"],
    exec_conf=_INTERACTIVE,
    sort_bound="25 nations x 7 order years = <=175 groups, fixed",
)

# Q10 — returned item reporting (4-way join + top-20)
_tpch(
    10,
    f"""
    SELECT c_custkey, c_name,
           {dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
           c_acctbal, n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    exec_conf=_INTERACTIVE,
)

# Q11 — important stock identification (groupBy + HAVING vs scalar subquery);
# partsupp value approximated by lineitem extendedprice*quantity.
# Spark side computes the grouped join ONCE: the HAVING threshold re-ran
# the identical lineitem⋈supplier⋈nation aggregate (2.5× baseline in
# BENCH_r01); since the scaled-BIGINT group sums are exact integers, the
# global total is `sum(graw) OVER ()` on the (small) grouped result — a
# single-column exchange instead of a second full join. DuckDB oracle
# keeps the two-scan form as a cross-check.
_tpch(
    11,
    f"""
    SELECT l_partkey, val FROM (
      SELECT l_partkey, val, graw, sum(graw) OVER () AS total_raw
      FROM (
        SELECT l_partkey,
               {dsum('l_extendedprice * l_quantity')} AS val,
               sum(CAST(round((l_extendedprice * l_quantity) * 1000000) AS BIGINT)) AS graw
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_7'
        GROUP BY l_partkey
      ) g
    ) w
    WHERE graw / 1000000.0 > total_raw / 1000000.0 * 0.001
    ORDER BY val DESC, l_partkey
    """,
    duck_sql=f"""
    SELECT l_partkey, {dsum('l_extendedprice * l_quantity')} AS val
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_7'
    GROUP BY l_partkey
    HAVING {dsum_raw('l_extendedprice * l_quantity')} > (
      SELECT {dsum_raw('l_extendedprice * l_quantity')} * 0.001
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_7')
    ORDER BY val DESC, l_partkey
    """,
    exec_conf=_INTERACTIVE,
    final_sort=["-val", "l_partkey"],
    sort_bound="self-bounding: HAVING val > 0.0001*total caps output at <=10000 rows at any SF",
)

# Q12 — shipping mode / priority classes (join + conditional agg);
# l_shipmode approximated by o_orderpriority classes.
_tpch(
    12,
    """
    SELECT l_linestatus,
           CAST(sum(CASE WHEN o_orderpriority = '1-URGENT'
                           OR o_orderpriority = '2-HIGH'
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority <> '1-URGENT'
                          AND o_orderpriority <> '2-HIGH'
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_linestatus ORDER BY l_linestatus
    """,
    final_sort=["l_linestatus"],
    exec_conf=_INTERACTIVE,
    sort_bound="l_shipmode(7) x l_linestatus(2) groups, fixed domain",
)

# Q13 — customer distribution (left outer join + double groupBy).
# Spark side pre-aggregates orders BEFORE the join: counting per custkey
# on orders alone gets map-side partial aggregation (the shuffle carries
# ~one row per customer instead of every post-join order row), and the
# aggregated side is then joined to customer. Equivalent because
# o_custkey is non-null and count(o_orderkey) counts order rows;
# customers with no orders surface as NULL → coalesce 0. At 100 TB this
# is the structurally better shape — the original form shuffles the full
# customer⋈orders product on c_custkey. DuckDB oracle keeps the
# canonical LEFT JOIN form as cross-check.
# The aggregated side is customer-count-sized (one row per ordering
# customer): at bench SF that's broadcastable, so the interactive
# profile raises the broadcast threshold and the probe over customer
# runs join + partial c_count aggregation in one stage with no
# customer shuffle. Deliberately NOT a BROADCAST hint: a hint forces
# the build at ANY scale, and at sf1 the 1M-row aggregated side
# measured 1.5 s broadcast vs 0.9 s shuffled — at 100 TB it would be
# a driver OOM. Profiles are ignored at sf >= 1 (bench policy), so
# the default threshold lets Catalyst shuffle-join exactly when the
# side outgrows broadcast.
_tpch(
    13,
    """
    SELECT c_count, count(*) AS custdist FROM (
      SELECT coalesce(oc.cnt, 0) AS c_count
      FROM customer LEFT JOIN (
        SELECT o_custkey, count(*) AS cnt FROM orders GROUP BY o_custkey
      ) oc ON c_custkey = o_custkey
    ) c_orders GROUP BY c_count
    """,
    """
    SELECT c_count, count(*) AS custdist FROM (
      SELECT c_custkey AS ck, count(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey
    ) c_orders GROUP BY c_count ORDER BY custdist DESC, c_count DESC
    """,
    exec_conf={
        **_INTERACTIVE,
        "spark.sql.shuffle.partitions": "4",
        # lets Catalyst's own size estimate broadcast the aggregated
        # orders side at bench SF; OFF at sf >= 1 with all profiles
        "spark.sql.autoBroadcastJoinThreshold": str(64 << 20),
    },
    final_sort=["-custdist", "-c_count"],
    sort_bound="distinct orders-per-customer counts: TPC-H caps orders/customer at a small constant (1..41), SF-independent",
)

# Q14 — promotion effect (join + CASE ratio)
_tpch(
    14,
    f"""
    SELECT {rstable("100.00 * " + dsum_raw("CASE WHEN p_type LIKE 'PROMO%' THEN l_extendedprice * (1 - l_discount) ELSE 0 END")
                    + ' / ' + dsum_raw('l_extendedprice * (1 - l_discount)'))} AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
    """,
    exec_conf=_INTERACTIVE,
)

# Q15 — top supplier (CTE + scalar-max subquery).
# r12: Spark side computes the revenue CTE ONCE — the scalar-max
# subquery re-ran the identical filtered lineitem aggregation a second
# time (Spark does not share a CTE referenced under a scalar subquery;
# plan showed two full lineitem scans). `max(total_revenue) OVER ()`
# on the ALREADY-GROUPED result (one row per qualifying supplier —
# dim-sized at every SF) computes the same threshold in one pass; the
# single-partition window is over supplier-count rows, the exact shape
# q11's r1 rewrite established. Values are the same deterministic
# 2-decimal dsum doubles, so filter equality is bit-identical. DuckDB
# oracle keeps the scalar-subquery form as cross-check.
_tpch(
    15,
    f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             {dsum('l_extendedprice * (1 - l_discount)')} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN (
      SELECT supplier_no, total_revenue,
             max(total_revenue) OVER () AS max_revenue
      FROM revenue
    ) r ON s_suppkey = supplier_no
    WHERE total_revenue = max_revenue
    ORDER BY s_suppkey
    """,
    duck_sql=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             {dsum('l_extendedprice * (1 - l_discount)')} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
    final_sort=["s_suppkey"],
    exec_conf=_INTERACTIVE,
    sort_bound="argmax set: suppliers tying the exact max revenue "
    "(2-decimal sums) — 1 row in practice, ties only, SF-independent",
)

# Q16 — parts/supplier relationship (NOT IN subquery + count distinct).
# Spark side spells the NOT IN as an explicit LEFT ANTI JOIN: Spark's
# null-aware NOT IN machinery costs ~0.2 s of the 0.6 s runtime at sf0.1
# (4.1× baseline in BENCH_r01). Equivalent here because both key sides
# are non-null (s_suppkey is the supplier PK; the explicit
# `l_suppkey IS NOT NULL` reproduces NOT IN's null-drop on the probe
# side). DuckDB oracle keeps the NOT IN form as cross-check.
# Deliberately NOT rewritten as size(collect_set(...)): that shaves
# another ~0.13 s at sf0.1 but materializes per-group supplier sets in
# executor memory — a scale hazard at 100 TB that count(DISTINCT)'s
# expand-based two-phase aggregation avoids. Broadcast hints pin the
# two dimension sides (part post-filter and the negative-balance
# supplier list are both small at every scale); the interactive
# profile removes AQE's per-stage re-planning latency, which dominated
# the remaining gap on this 5-stage sub-second query.
_tpch(
    16,
    """
    SELECT /*+ BROADCAST(part), BROADCAST(bad) */
           p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    LEFT ANTI JOIN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0) bad
      ON l_suppkey = bad.s_suppkey
    WHERE p_brand <> 'Brand#45'
      AND p_size IN (49, 14, 23, 45, 19, 3, 36, 9)
      AND l_suppkey IS NOT NULL
    GROUP BY p_brand, p_type, p_size
    """,
    """
    SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#45'
      AND p_size IN (49, 14, 23, 45, 19, 3, 36, 9)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    # Beyond the static plan, the distinct-agg intermediates here are a
    # few thousand rows across 3 post-broadcast-join exchanges: 4
    # partitions right-sizes the task count (8 → 4 shaves ~70 ms of
    # pure scheduling at sf0.1; 1 was MEASURED SLOWER in the bench
    # harness — the partial-distinct merge over the ~120k post-join
    # rows serializes onto one core, costing more than the saved
    # scheduling + range-sort sampling). final_sort then removes the
    # range-sort sampling pass + exchange entirely: the answer is
    # group-count-sized (~hundreds of rows at any SF).
    # r7 note (VERDICT r6 #6): the single-exchange shape — REPARTITION
    # on the group keys alone under the distinct, so both aggregates
    # satisfy their distributions from one HashPartitioning and fuse
    # into one codegen span (verified: 1 shuffle + 2 broadcasts) — was
    # built and A/B-measured in-harness: ~0.36-0.44 s vs ~0.30-0.35 s
    # for this shape. Losing the map-side partial distinct makes the
    # one exchange carry every post-join row, which costs more than the
    # stage it saves. Kept the two-exchange plan; the residual 1.6-1.7×
    # vs baseline is scheduling floor on a 0.13 s query, not plan work.
    exec_conf={**_INTERACTIVE, "spark.sql.shuffle.partitions": "4"},
    final_sort=["-supplier_cnt", "p_brand", "p_type", "p_size"],
    sort_bound="brand(25) x type(150) x size(8 listed) domain product, fixed regardless of SF",
)

# Q17 — small-quantity-order revenue (correlated avg subquery;
# l_quantity is integral so the correlated avg is exact)
_tpch(
    17,
    f"""
    SELECT {rstable(dsum_raw('l_extendedprice') + ' / 7.0', 2)} AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#23'
      AND l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
                        FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    """,
    exec_conf=_INTERACTIVE,
)

# Q18 — large volume customer (IN-subquery with HAVING + top-100).
# Spark side runs ONE lineitem aggregation on the narrow l_orderkey key
# (map-side partial agg on a BIGINT), filters > 300 (result is tiny at
# any scale — qualifying orders), then joins orders+customer onto it —
# the small side broadcasts, so no second lineitem pass and no wide-key
# aggregate. Equivalent because o_orderkey is the orders PK and each
# order joins exactly one customer, so the per-order lineitem sum IS the
# original HAVING-IN filter. 2.2× baseline in BENCH_r01 as written.
# r7: the interactive profile (AQE off) shaves the per-stage re-plan
# latency like the other sub-second entries — measured 0.53 → 0.44 s
# in-harness; shuffle partitions 16 vs 32 was noise, so the default
# stays. DuckDB oracle keeps the IN-subquery form as cross-check.
_Q18_DUCK = """
    SELECT c_name, c_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS odate, o_totalprice,
           round(sum(l_quantity), 2) AS sum_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                         GROUP BY l_orderkey HAVING sum(l_quantity) > 300)
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
"""
_tpch(
    18,
    """
    SELECT c_name, c_custkey, o_orderkey,
           date_format(o_orderdate, 'yyyy-MM-dd') AS odate, o_totalprice,
           round(qty, 2) AS sum_qty
    FROM (
      SELECT l_orderkey, sum(l_quantity) AS qty
      FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300
    ) big
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
    _Q18_DUCK,
    exec_conf=_INTERACTIVE,
)

# Q19 — discounted revenue (OR-of-conjunctions join predicate)
_tpch(
    19,
    f"""
    SELECT {dsum('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND l_quantity BETWEEN 1 AND 11
           AND p_size BETWEEN 1 AND 5)
       OR (p_brand = 'Brand#23' AND l_quantity BETWEEN 10 AND 20
           AND p_size BETWEEN 1 AND 10)
       OR (p_brand = 'Brand#34' AND l_quantity BETWEEN 20 AND 30
           AND p_size BETWEEN 1 AND 15)
    """,
    exec_conf=_INTERACTIVE,
)

# Q20 — potential part promotion (nested IN subqueries with HAVING)
_tpch(
    20,
    """
    SELECT s_name, s_suppkey
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE s_suppkey IN (
        SELECT l_suppkey FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_name LIKE '%bolt%'
          AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l_suppkey HAVING sum(l_quantity) > 50)
      AND n_name = 'NATION_5'
    ORDER BY s_suppkey
    """,
    # NO final_sort: q20's output is "suppliers in one nation passing a
    # semi-join" — ~400×SF rows, LINEAR in scale factor, so the
    # single-task answer-sort finish has no provable bound here. The
    # trailing ORDER BY stays and Spark plans a range sort that scales
    # out with the data (r6 verdict, What's wrong #3).
    # (r7: the interactive profile was A/B-measured flat here — q20 keeps
    # AQE so the scale-path range sort retains runtime re-planning.)
)

# Q21 — suppliers who kept orders waiting (EXISTS + NOT EXISTS self joins);
# l_receiptdate/commitdate approximated by l_shipdate comparisons.
# r12: the per-order-aggregate rewrite (both correlated self-joins
# folded into per-(order,supplier) ship maxima) was adopted mid-round
# on a flat sf0.1 A/B, then REVERTED after the sf1 scale ladder
# measured it 2.2x SLOWER (9.7 s vs 4.4 s isolated, same host): the
# collect_list/og aggregation and the extra l1f window shuffle cost
# more at 10x data than the two lineitem semi/anti legs they replaced
# (which broadcast/AQE handle well on the filtered side). The
# correlated form below is the shape that scales.
_tpch(
    21,
    """
    SELECT s_name, count(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders   ON o_orderkey = l1.l_orderkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE o_orderstatus = 'F' AND n_name = 'NATION_0'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > l1.l_shipdate)
    GROUP BY s_name ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
    exec_conf=_INTERACTIVE,
)

# Q22 — global sales opportunity (anti join + scalar avg subquery).
# The avg threshold compare is on raw doubles: c_acctbal values are far
# from the threshold boundary, and the filter is not rounded — a last-ulp
# difference in avg() could only flip a row whose acctbal equals the avg
# to 1e-12, which the 2-decimal data cannot produce.
_tpch(
    22,
    f"""
    SELECT cntrycode, count(*) AS numcust, {dsum('c_acctbal')} AS totacctbal
    FROM (
      SELECT CAST(c_nationkey AS STRING) AS cntrycode, c_acctbal
      FROM customer
      WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
                         WHERE c_acctbal > 0.00)
        AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    ) custsale
    GROUP BY cntrycode ORDER BY cntrycode
    """,
    exec_conf=_DIM_BROADCAST,
    final_sort=["cntrycode"],
    sort_bound="cntrycode = nationkey domain, <=25 values, fixed",
)
