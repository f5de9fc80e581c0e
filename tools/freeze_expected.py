"""Regenerate the frozen-expected tables under tests/expected/.

The simhash near-pair and ANN top-k entries use sketches whose hash
functions (Spark xxhash64, seeded hyperplanes, Lloyd codebooks) DuckDB
cannot reproduce, so their driver oracle is a committed parquet of the
deterministic output (VERDICT r3 #4 pattern). Run this ONLY when the
operator semantics intentionally change, then re-run
tests/test_frozen_expected.py — it independently verifies the frozen
contents (brute-force hamming completeness; brute-force cosine recall)
before they are trusted as an oracle.

Usage: python tools/freeze_expected.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "tests", "expected")


def main() -> None:
    from swanlake_spark.config import EngineConfig
    from swanlake_spark.engine import Engine
    from swanlake_spark.queries.pipeline import PIPELINE_QUERIES

    eng = Engine(
        config=EngineConfig(app_name="freeze", cpus=8, shuffle_partitions=8)
    )
    eng.spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(OUT, exist_ok=True)
    for sf, tag in (("0.001", "sf0_001"), ("0.01", "sf0_01")):
        sf_dir = f"/root/testdata/sf{sf}"
        for spec, name in (
            ("pipe_dedup_simhash", f"simhash_{tag}"),
            ("pipe_sim_ann_battery", f"sim_ann_{tag}"),
            ("pipe_bpe_tokenize", f"bpe_{tag}"),
            ("pipe_span_dedup", f"span_{tag}"),
            ("pipe_quality_classifier", f"quality_clf_{tag}"),
        ):
            df = PIPELINE_QUERIES[spec].build(eng.spark, sf_dir)
            tbl = df.toArrow()
            import pyarrow.parquet as pq

            pq.write_table(tbl, os.path.join(OUT, f"{name}.parquet"))
            print(f"froze {name}: {tbl.num_rows} rows")
    eng.stop()


if __name__ == "__main__":
    main()
