"""Profile one bench entry's driver-side work.

Usage: python tools/profile_entry.py <entry_key> [n_warm] [n_prof]

Builds the same Engine/session as bench.py (same confs), warms the
entry, then runs it n_prof more times under cProfile and prints the
top cumulative-time functions. DML-stateful entries (matview_*, ycsb,
cdc) keep their loop semantics because the suite objects are reused.
"""
import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    key = sys.argv[1]
    n_warm = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    n_prof = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    import bench

    # Reuse bench.py's own suite construction by running its main()
    # up to the suite dict would require refactor; instead rebuild the
    # session identically and pull the spec via the module-level
    # helpers bench exposes.
    from swanlake_spark.config import EngineConfig
    from swanlake_spark.engine import Engine

    cfg = EngineConfig(
        app_name="swl-profile",
        cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        shuffle_partitions=bench.SHUFFLE_PARTITIONS,
        driver_memory=bench.DRIVER_MEM,
    )
    eng = Engine(config=cfg)
    spark = eng.spark
    spark.sparkContext.setLogLevel("ERROR")

    suite = bench.build_suite(spark)
    if os.environ.get("SWL_BENCH_MATERIALIZE", "1") != "0":
        import tempfile

        from swanlake_spark.queries.oracle import mark_registered
        from swanlake_spark.sources.registry import materialize_warehouse

        materialize_warehouse(
            spark, SF_DIR, tempfile.mkdtemp(prefix="swl_prof_wh_")
        )
        mark_registered(spark, SF_DIR)

    spec = suite[key]
    for _ in range(n_warm):
        spec.build(spark, SF_DIR).collect()

    times = []
    pr = cProfile.Profile()
    for _ in range(n_prof):
        t0 = time.perf_counter()
        pr.enable()
        spec.build(spark, SF_DIR).collect()
        pr.disable()
        times.append(time.perf_counter() - t0)

    out = io.StringIO()
    st = pstats.Stats(pr, stream=out)
    st.sort_stats("cumulative").print_stats(45)
    print(out.getvalue())
    print("times:", [round(t, 3) for t in times])


if __name__ == "__main__":
    main()
