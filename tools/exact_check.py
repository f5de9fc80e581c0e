"""Bit-exact comparison of Spark vs DuckDB results (stricter than
compare_oracle.py's 1e-12 tolerance — replicates the driver's value-hash,
which matches only when the float bits agree).

Usage: python tools/exact_check.py [sf_dir] [name_filter ...]
"""

from __future__ import annotations

import os
import struct
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.compare_oracle import duck_connect, normalize


def bits(v):
    if isinstance(v, float):
        return struct.pack("<d", v).hex()
    return repr(v)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    filters = sys.argv[2:]

    from swanlake_spark.config import EngineConfig
    from swanlake_spark.engine import Engine

    import __spark_entry__ as entry_mod

    specs = entry_mod._all_specs()

    eng = Engine(config=EngineConfig(app_name="exact-check", cpus=8, shuffle_partitions=8))
    eng.spark.sparkContext.setLogLevel("ERROR")
    spark = eng.spark

    failed = 0
    for name, spec in specs.items():
        if filters and not any(f in name for f in filters):
            continue
        if spec.oracle is None:
            continue
        sdf = normalize(spec.build(spark, sf_dir).toPandas())
        con = duck_connect(sf_dir)
        ddf = normalize(con.execute(spec.oracle).fetchdf())
        con.close()
        bad = []
        if list(sdf.columns) != list(ddf.columns) or len(sdf) != len(ddf):
            bad.append(f"shape: spark={sdf.shape}{list(sdf.columns)} duck={ddf.shape}{list(ddf.columns)}")
        else:
            for col in sdf.columns:
                for i, (x, y) in enumerate(zip(sdf[col].tolist(), ddf[col].tolist())):
                    if x is None and y is None:
                        continue
                    try:
                        import pandas as pd
                        if pd.isna(x) and pd.isna(y):
                            continue
                    except (TypeError, ValueError):
                        pass
                    if isinstance(x, float) or isinstance(y, float):
                        if struct.pack("<d", float(x)) != struct.pack("<d", float(y)):
                            bad.append(f"col={col} row={i} spark={x!r}({bits(float(x))}) duck={y!r}({bits(float(y))})")
                    elif str(x) != str(y):
                        bad.append(f"col={col} row={i} spark={x!r} duck={y!r}")
                    if len(bad) > 3:
                        break
                if len(bad) > 3:
                    break
        if bad:
            failed += 1
            print(f"FAIL {name}: " + "; ".join(bad[:4]))
        else:
            print(f"PASS {name} ({len(sdf)} rows, bit-exact)")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
