"""Synthesize a 10x scale-up of the sf0.1 test corpus for the sf1
scale-fidelity bench pass (VERDICT r3 #8).

No sf1 corpus ships with the driver's testdata, so this replicates
sf0.1 ten times with disjoint key offsets: every foreign key moves by
the same per-copy offset as its parent, so join fan-outs, selectivity
fractions, and per-key cardinalities match the original — i.e. query
COST scales ~10x while the data statistics keep their shape. Dates,
prices, and text are reused verbatim (the TPC-H-ish distributions are
uniform over the same domains at every SF).

Output: $OUT/sf1/*.parquet (default /tmp/swl_scale/sf1). DuckDB does
the heavy lifting — one INSERT-SELECT per copy, no Spark session.

Usage: python tools/make_scale_data.py [copies] [out_root]
"""

import os
import sys

SRC = "/root/testdata/sf0.1"


def main() -> None:
    import duckdb

    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_root = sys.argv[2] if len(sys.argv) > 2 else "/tmp/swl_scale"
    out = os.path.join(out_root, "sf1")
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")

    # per-table key offsets (max+1 so copies never collide)
    offs = {}
    for t, k in (
        ("orders", "o_orderkey"),
        ("customer", "c_custkey"),
        ("supplier", "s_suppkey"),
        ("part", "p_partkey"),
        ("events", "event_id"),
        ("documents", "doc_id"),
        ("embeddings", "vec_id"),
    ):
        offs[t] = (
            con.execute(
                f"SELECT max({k}) + 1 FROM read_parquet('{SRC}/{t}.parquet')"
            ).fetchone()[0]
        )

    def gen(table: str, select: str) -> None:
        parts = " UNION ALL ".join(
            select.format(i=i) for i in range(copies)
        )
        con.execute(
            f"COPY ({parts}) TO '{out}/{table}.parquet' (FORMAT parquet)"
        )
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{out}/{table}.parquet')"
        ).fetchone()[0]
        print(f"{table}: {n} rows")

    for t in ("region", "nation"):
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
            f"TO '{out}/{t}.parquet' (FORMAT parquet)"
        )

    oo, co, so, po = (
        offs["orders"], offs["customer"], offs["supplier"], offs["part"]
    )
    gen(
        "customer",
        f"SELECT c_custkey + {{i}} * {co} AS c_custkey, c_name, c_nationkey,"
        f" c_acctbal, c_mktsegment FROM read_parquet('{SRC}/customer.parquet')",
    )
    gen(
        "supplier",
        f"SELECT s_suppkey + {{i}} * {so} AS s_suppkey, s_name, s_nationkey,"
        f" s_acctbal FROM read_parquet('{SRC}/supplier.parquet')",
    )
    gen(
        "part",
        f"SELECT p_partkey + {{i}} * {po} AS p_partkey, p_name, p_brand,"
        f" p_type, p_size, p_retailprice FROM read_parquet('{SRC}/part.parquet')",
    )
    gen(
        "orders",
        f"SELECT o_orderkey + {{i}} * {oo} AS o_orderkey,"
        f" o_custkey + {{i}} * {co} AS o_custkey, o_orderstatus,"
        f" o_totalprice, o_orderdate, o_orderpriority"
        f" FROM read_parquet('{SRC}/orders.parquet')",
    )
    gen(
        "lineitem",
        f"SELECT l_orderkey + {{i}} * {oo} AS l_orderkey,"
        f" l_partkey + {{i}} * {po} AS l_partkey,"
        f" l_suppkey + {{i}} * {so} AS l_suppkey, l_linenumber, l_quantity,"
        f" l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,"
        f" l_shipdate FROM read_parquet('{SRC}/lineitem.parquet')",
    )
    gen(
        "events",
        f"SELECT event_id + {{i}} * {offs['events']} AS event_id, ts,"
        f" user_id, event_type, value, props"
        f" FROM read_parquet('{SRC}/events.parquet')",
    )
    gen(
        "documents",
        f"SELECT doc_id + {{i}} * {offs['documents']} AS doc_id, text, lang,"
        f" source, n_chars FROM read_parquet('{SRC}/documents.parquet')",
    )
    gen(
        "embeddings",
        f"SELECT vec_id + {{i}} * {offs['embeddings']} AS vec_id, embedding,"
        f" label FROM read_parquet('{SRC}/embeddings.parquet')",
    )
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
