"""Local replica of the driver's correctness gate.

Runs every ORACLE_QUERIES entry on Spark and its oracle SQL on DuckDB
over the same parquet tables, then compares row count, column names and
order-insensitive values. Usage:

    python tools/compare_oracle.py [sf_dir] [name_filter]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd


def duck_connect(sf_dir: str):
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) or isinstance(b, float):
        try:
            af, bf = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(af) and math.isnan(bf):
            return True
        return af == bf or math.isclose(af, bf, rel_tol=1e-12, abs_tol=1e-12)
    try:
        if pd.isna(a) and pd.isna(b):
            return True
        if pd.isna(a) or pd.isna(b):
            return False
    except (TypeError, ValueError):
        pass
    return str(a) == str(b)


def compare(spark_df, duck_df) -> list[str]:
    issues = []
    s, d = normalize(spark_df), normalize(duck_df)
    if list(s.columns) != list(d.columns):
        issues.append(f"columns differ: spark={list(s.columns)} duck={list(d.columns)}")
        return issues
    if len(s) != len(d):
        issues.append(f"row count differs: spark={len(s)} duck={len(d)}")
        return issues
    for col in s.columns:
        sv, dv = s[col].tolist(), d[col].tolist()
        for i, (x, y) in enumerate(zip(sv, dv)):
            if not values_equal(x, y):
                issues.append(f"value mismatch col={col} row={i}: spark={x!r} duck={y!r}")
                if len(issues) > 3:
                    return issues
    return issues


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    name_filter = sys.argv[2] if len(sys.argv) > 2 else ""

    from swanlake_spark.config import EngineConfig
    from swanlake_spark.engine import Engine

    # exactly the set the driver sees
    import __spark_entry__ as entry_mod

    ORACLE_QUERIES = entry_mod._all_specs()

    eng = Engine(config=EngineConfig(app_name="oracle-compare", cpus=8, shuffle_partitions=8))
    eng.spark.sparkContext.setLogLevel("ERROR")
    spark = eng.spark

    failed, passed, skipped = [], [], []
    for name, spec in ORACLE_QUERIES.items():
        if name_filter and name_filter not in name:
            continue
        try:
            sdf = spec.build(spark, sf_dir).toPandas()
        except Exception as e:
            failed.append((name, f"SPARK ERROR: {str(e)[:300]}"))
            print(f"FAIL {name}: spark error {str(e)[:200]}")
            continue
        if spec.oracle is None:
            if getattr(spec, "approx_sql", None):
                # tolerance gate: sketch answer within rel_tol of exact
                con = duck_connect(sf_dir)
                exact = con.execute(spec.approx_sql).fetchone()[0]
                con.close()
                approx = sdf.iloc[0, 0]
                rel = abs(float(approx) - float(exact)) / max(float(exact), 1.0)
                if rel <= spec.rel_tol:
                    passed.append(name)
                    print(
                        f"PASS {name} (approx {approx} vs exact {exact}, "
                        f"rel err {rel:.4f} <= {spec.rel_tol})"
                    )
                else:
                    failed.append((name, f"rel err {rel:.4f} > {spec.rel_tol} "
                                         f"(approx {approx}, exact {exact})"))
                    print(f"FAIL {name}: rel err {rel:.4f} > {spec.rel_tol}")
                continue
            skipped.append(name)
            print(f"SKIP {name}: rows-only ({len(sdf)} rows)")
            continue
        con = duck_connect(sf_dir)
        try:
            ddf = con.execute(spec.oracle).fetchdf()
        except Exception as e:
            failed.append((name, f"DUCK ERROR: {str(e)[:300]}"))
            print(f"FAIL {name}: duck error {str(e)[:200]}")
            con.close()
            continue
        con.close()
        issues = compare(sdf, ddf)
        if issues:
            failed.append((name, "; ".join(issues)))
            print(f"FAIL {name}: {issues[0]}")
        else:
            passed.append(name)
            print(f"PASS {name} ({len(sdf)} rows)")

    print(f"\n== {len(passed)} passed, {len(failed)} failed, {len(skipped)} rows-only ==")
    for name, why in failed:
        print(f"  {name}: {why[:300]}")
    eng.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
