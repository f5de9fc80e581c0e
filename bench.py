"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {"q1": s, ...},
   "sf": ...}

Methodology mirrors BASELINE.md: warm session (WARMUP_RUNS passes, default
2 — the reference's numbers are steady-state BenchBase latencies and JVM
tiered compilation needs several executions per codegen path), then
per-query latency = best of MEASURE_RUNS (default 5) timed runs of
plan+execute+collect — EXCEPT sub-0.5 s TPC-H entries, which record the
MEDIAN of the measured runs (r8 drift-proofing): on queries where
scheduling jitter is a double-digit share of the runtime, a single-shot
best is one lucky (or unlucky) scheduler draw, and the recorded number
swung ±25% across identical-code runs (q16's r7 band spanned
1.56–2.10× baseline on host load alone). The median of five runs is
stable across consecutive invocations; entries at or above 0.5 s keep
best-of (their jitter share is small and best-of matches the r1–r7
history). Protocol note in SCALE.md §Round-8.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _tree_hash() -> str:
    """Content hash of the package source + this file — the band
    sidecar's version key (a history recorded under different code
    must never produce the headline median, ADVICE r11)."""
    import glob
    import hashlib

    root = os.path.dirname(os.path.abspath(__file__))
    h = hashlib.md5()
    for f in sorted(
        glob.glob(
            os.path.join(root, "swanlake_spark", "**", "*.py"),
            recursive=True,
        )
    ) + [os.path.abspath(__file__)]:
        try:
            with open(f, "rb") as fh:
                h.update(fh.read())
        except OSError:
            pass
    return h.hexdigest()[:12]
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
MEASURE_RUNS = int(os.environ.get("SWL_BENCH_RUNS", "5"))
WARMUP_RUNS = int(os.environ.get("SWL_BENCH_WARMUPS", "2"))
# The sub-second TPC-H class needs deeper per-plan warmup than the
# multi-second pipeline entries: C2 compilation of a query's generated
# code converges over ~5+ executions of THAT plan, and a 30 ms codegen
# tail is 20% of a 0.15 s query but noise on a 3 s one. The reference
# baseline is steady-state BenchBase latency, so the deeper warmup
# measures the same regime (isolated A/B: q16 2-warmup best-of-5
# ranged 0.22-0.30 s across invocations; 12-warmup runs sat at
# 0.218-0.264 with the same plan). r8: since sub-0.5 s entries record
# the MEDIAN, warmup depth now shapes the recorded number directly —
# 12 warmups put q16's median ~10% over its best where 6 left it ~21%
# over (the run distribution is still converging); default raised 6→12.
TPCH_WARMUP_RUNS = int(os.environ.get("SWL_BENCH_TPCH_WARMUPS", "12"))
SHUFFLE_PARTITIONS = int(os.environ.get("SWL_BENCH_SHUFFLE_PARTITIONS", "8"))
# local[n] hosts driver + all executor threads in ONE JVM, so broadcast
# builds at 10x data need more heap than the sf0.1 default; a real
# cluster sizes driver/executor memory per deployment (EngineConfig).
DRIVER_MEM = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
# Dev-only substring filter (comma-separated) over suite entry names;
# also skips the appender/YCSB blocks. The driver never sets this —
# recorded BENCH_r{N}.json always covers the full suite.
ONLY = [
    p.strip()
    for p in os.environ.get("SPARK_GRAFT_ONLY", "").split(",")
    if p.strip()
]


def build_suite(spark) -> dict:
    """The bench suite: every headline entry, keyed as the output
    JSON keys them. Shared by main() and tools/ (plan capture,
    profiling) so dev tooling measures exactly what the bench
    measures."""
    from swanlake_spark.queries.pipeline import PIPELINE_QUERIES
    from swanlake_spark.queries.tpch import TPCH_QUERIES
    from swanlake_spark.queries.ycsb import YCSB_QUERIES

    # Headline set: the 22 TPC-H-shaped queries (keys match BASELINE.md)
    # plus representative large-scale pipeline operators.
    suite: dict[str, object] = {}
    for n in range(1, 23):
        suite[f"q{n}"] = TPCH_QUERIES[f"tpch_q{n}"]
    for key, pname in [
        ("dedup_exact", "pipe_dedup_exact"),
        ("dedup_minhash_lsh", "pipe_dedup_minhash_lsh"),
        ("text_quality", "pipe_text_quality"),
        ("select_top_tokens", "pipe_select_top_tokens"),
        ("sim_cosine_topk", "pipe_sim_cosine_topk"),
        ("multimodal_decode", "pipe_multimodal_decode"),
        ("sketch_heavy_hitters", "pipe_heavy_hitters"),
        ("span_decontaminate", "pipe_span_decontaminate"),
    ]:
        suite[key] = PIPELINE_QUERIES[pname]

    # Embedding near-dup: bench the LSH-bucketed SCALE path over the full
    # embeddings table (the oracle entry pipe_dedup_embedding is the
    # bounded exact-all-pairs correctness demo — quadratic by design).
    class _EmbDedupLsh:
        @staticmethod
        def build(spark, sf_dir):
            from swanlake_spark.operators import dedup
            from swanlake_spark.queries.oracle import ensure_tables

            ensure_tables(spark, sf_dir)
            kept = dedup.embedding_dedup(spark.table("embeddings"), threshold=0.45)
            return kept.groupBy().count()

    suite["dedup_embedding_lsh"] = _EmbDedupLsh

    # KMV theta sketch in its estimation regime: token-vocabulary
    # overlap between the two corpus halves — two bounded-shuffle
    # sketch builds (O(k·groups) shuffle regardless of vocabulary
    # size) + one O(k) set-algebra row.
    class _KmvOverlap:
        @staticmethod
        def build(spark, sf_dir):
            from pyspark.sql import functions as F

            from swanlake_spark.operators import sketch, text
            from swanlake_spark.queries.oracle import ensure_tables

            ensure_tables(spark, sf_dir)
            docs = spark.table("documents")
            tok = docs.select(
                (F.col("doc_id") % 2).alias("half"),
                F.explode(text.tokens("text")).alias("tk"),
            )
            k = 1024
            # ONE grouped build covers both halves (2 source scans
            # total: estimate pass + survivor pass)
            sk = sketch.kmv_sketch(tok, "tk", k=k, by=["half"])
            a = sk.where(F.col("half") == 0).select(
                F.col("kmv").alias("ka")
            )
            b = sk.where(F.col("half") == 1).select(
                F.col("kmv").alias("kb")
            )
            return a.crossJoin(b).select(
                sketch.kmv_set_ops(F.col("ka"), F.col("kb"), k).alias("o")
            ).select("o.intersect_est", "o.union_est", "o.jaccard")

    suite["sketch_kmv_overlap"] = _KmvOverlap

    # Histogram quantile sketch: per-returnflag price quantiles over
    # the 600k-row lineitem — one scan + one bins-by-groups
    # aggregation, quantile walk over the 1024-cell arrays.
    class _HistQuantile:
        @staticmethod
        def build(spark, sf_dir):
            from pyspark.sql import functions as F

            from swanlake_spark.operators import sketch
            from swanlake_spark.queries.oracle import ensure_tables

            ensure_tables(spark, sf_dir)
            li = spark.table("lineitem")
            sk = sketch.histogram_sketch(
                li, "l_extendedprice", bins=1024,
                lo=900.0, hi=105000.0, by=["l_returnflag"],
            )
            return sk.select(
                "l_returnflag",
                *[
                    sketch.hist_quantile(
                        "counts", "lo", "hi", q
                    ).alias(f"q{int(q * 100)}")
                    for q in (0.5, 0.9, 0.99)
                ],
            )

    suite["sketch_hist_quantile"] = _HistQuantile

    # Curation ops over the FULL documents table (the oracle entries are
    # bounded correctness demos; these are the scale-path timings).
    class _Decontaminate:
        @staticmethod
        def build(spark, sf_dir):
            from pyspark.sql import functions as F

            from swanlake_spark.operators import curation
            from swanlake_spark.queries.oracle import ensure_tables

            ensure_tables(spark, sf_dir)
            docs = spark.table("documents")
            bench_docs = docs.filter(F.col("doc_id") % 7 == 0)
            corpus = docs.filter(F.col("doc_id") % 7 != 0)
            return curation.decontaminate(corpus, bench_docs, n=6).groupBy().count()

    class _Shuffle:
        @staticmethod
        def build(spark, sf_dir):
            from pyspark.sql import functions as F

            from swanlake_spark.operators import curation
            from swanlake_spark.queries.oracle import ensure_tables

            ensure_tables(spark, sf_dir)
            sh = curation.deterministic_shuffle(spark.table("documents"))
            return sh.agg(
                F.max("shuffle_pos").alias("mx"), F.count("*").alias("n")
            )

    class _LineDedup:
        @staticmethod
        def build(spark, sf_dir):
            from pyspark.sql import functions as F

            from swanlake_spark.operators import curation
            from swanlake_spark.queries.oracle import ensure_tables

            ensure_tables(spark, sf_dir)
            out = curation.line_dedup(spark.table("documents"))
            return out.agg(
                F.count("*").alias("docs"),
                F.sum("n_dropped").alias("dropped"),
            )

    class _Chunk:
        @staticmethod
        def build(spark, sf_dir):
            from pyspark.sql import functions as F

            from swanlake_spark.operators import curation
            from swanlake_spark.queries.oracle import ensure_tables

            ensure_tables(spark, sf_dir)
            ch = curation.chunk_documents(
                spark.table("documents"), chunk_tokens=128, overlap=16
            )
            return ch.agg(
                F.count("*").alias("chunks"),
                F.sum("n_tokens").alias("tokens"),
            )

    class _PqSearch:
        """ADC search over PQ-compressed codes (codebooks trained once
        outside the measured window, like an index build)."""

        _books = None
        _query = None

        @classmethod
        def build(cls, spark, sf_dir):
            from swanlake_spark.operators import similarity
            from swanlake_spark.queries.oracle import ensure_tables

            ensure_tables(spark, sf_dir)
            emb = spark.table("embeddings")
            if cls._books is None:
                cls._books = similarity.pq_codebooks(emb, m=8, k=16, dim=64)
                cls._query = [
                    float(x) for x in emb.orderBy("vec_id").first().embedding
                ]
            coded = similarity.pq_encode(emb, cls._books)
            return similarity.pq_topk(coded, cls._query, cls._books, k=10)

    class _SpanStrip:
        """Exact duplicate-span removal over the FULL documents table
        (window hashing + keep-first strip — the ExactSubstr scale
        path; correctness is the frozen pipe_span_dedup oracle)."""

        @staticmethod
        def build(spark, sf_dir):
            from pyspark.sql import functions as F

            from swanlake_spark.operators import span_dedup as SD
            from swanlake_spark.queries.oracle import ensure_tables

            ensure_tables(spark, sf_dir)
            out = SD.strip_duplicate_spans(
                spark.table("documents"), min_tokens=8
            )
            return out.agg(
                F.count("*").alias("docs"),
                F.sum("n_tokens_removed").alias("removed"),
            )

    suite["dedup_span_strip"] = _SpanStrip
    suite["curation_decontaminate"] = _Decontaminate
    suite["curation_shuffle"] = _Shuffle
    suite["curation_line_dedup"] = _LineDedup
    class _Validate:
        """Expectation battery over the FULL orders table: all row-local
        + unique rules in one agg pass, one broadcast anti-join FK."""

        @staticmethod
        def build(spark, sf_dir):
            from swanlake_spark.operators import validate as V
            from swanlake_spark.queries.oracle import ensure_tables

            ensure_tables(spark, sf_dir)
            return V.validate(spark.table("orders"), [
                V.rules.not_null("o_orderkey"),
                V.rules.unique("o_orderkey"),
                V.rules.in_range("o_totalprice", lo=0.0, hi=600000.0),
                V.rules.in_set("o_orderstatus", "O", "F", "P"),
                V.rules.ref_integrity(
                    "o_custkey", spark.table("customer"), "c_custkey"
                ),
            ])

    class _Vocab:
        @staticmethod
        def build(spark, sf_dir):
            from swanlake_spark.operators import text as T
            from swanlake_spark.queries.oracle import ensure_tables

            ensure_tables(spark, sf_dir)
            return T.build_vocab(spark.table("documents"), top_k=1000)

    class _Tfidf:
        @staticmethod
        def build(spark, sf_dir):
            from pyspark.sql import functions as F

            from swanlake_spark.operators import text as T
            from swanlake_spark.queries.oracle import ensure_tables

            ensure_tables(spark, sf_dir)
            out = T.tfidf_top_terms(spark.table("documents"), n_per_doc=3)
            return out.agg(
                F.count("*").alias("n"), F.sum("tfidf").alias("s")
            )

    class _MatviewRefresh:
        """Partition-scoped rollup refresh: per-orderstatus revenue view
        built once (outside the window), one partition refreshed per
        timed run — the steady-state cadence a 100 TB pipeline runs."""

        _ready = False

        @classmethod
        def build(cls, spark, sf_dir):
            from swanlake_spark import matview
            from swanlake_spark.queries.oracle import ensure_tables

            ensure_tables(spark, sf_dir)
            if not cls._ready:
                import tempfile

                if spark.catalog.tableExists("swl_bench_mv"):
                    spark.sql("DROP TABLE swl_bench_mv")
                # explicit throwaway location: a managed table's dir in
                # spark-warehouse/ outlives the in-memory catalog and
                # collides on the next process (LOCATION_ALREADY_EXISTS)
                matview.create(
                    spark,
                    "swl_bench_mv",
                    "SELECT sum(o_totalprice) AS rev, count(*) AS n, "
                    "o_orderstatus FROM orders GROUP BY o_orderstatus",
                    partition_by=["o_orderstatus"],
                    location=tempfile.mkdtemp(prefix="swl_bench_mv_") + "/mv",
                )
                cls._ready = True
            matview.refresh(spark, "swl_bench_mv", "o_orderstatus = 'F'")
            return spark.table("swl_bench_mv")

    suite["curation_chunk"] = _Chunk
    suite["matview_partial_refresh"] = _MatviewRefresh
    class _BpeTrain:
        """16-merge BPE fit over the FULL documents table + corpus
        encode: the corpus reads once (word-freq shuffle), then 16
        bounded iterations over the distinct-word table."""

        @staticmethod
        def build(spark, sf_dir):
            from pyspark.sql import functions as F

            from swanlake_spark.operators import tokenizer
            from swanlake_spark.queries.oracle import ensure_tables

            ensure_tables(spark, sf_dir)
            docs = spark.table("documents")
            # batched merges (16 non-interacting per driver round-trip,
            # whole batch applied in one fused fold): 64 merges at
            # under the old 16-merge wall time
            _, segmented = tokenizer.train_bpe(
                docs, n_merges=64, merge_batch=16
            )
            enc = tokenizer.encode(docs, segmented)
            return enc.agg(
                F.count("*").alias("docs"), F.sum("n_tokens").alias("toks")
            )

    suite["text_vocab_top1k"] = _Vocab
    suite["text_tfidf_top3"] = _Tfidf
    suite["validate_expectations"] = _Validate
    suite["sim_pq_adc_topk"] = _PqSearch
    suite["bpe_train_encode_64"] = _BpeTrain
    suite["ycsb_point_read"] = YCSB_QUERIES["ycsb_point_read"]
    suite["ycsb_scan"] = YCSB_QUERIES["ycsb_scan"]

    # Incremental matview maintenance: each measured run appends a
    # batch to the base table and folds it in via REFRESH ...
    # INCREMENTAL — cost tracks the APPENDED files, not the base size
    # (the 100 TB rollup-refresh story; full refresh rescans the base).
    class _MatviewIncremental:
        _eng = None
        _k = 0

        @classmethod
        def build(cls, spark, sf_dir):
            import tempfile as _tf

            from pyspark.sql import functions as F

            from swanlake_spark.engine import Engine

            if cls._eng is None:
                from swanlake_spark import matview

                cls._eng = Engine(spark=spark)
                loc = _tf.mkdtemp(prefix="swl_bench_mvi_")
                cls._eng.execute(
                    f"CREATE TABLE bench_mvi_src (day STRING, amt DOUBLE) "
                    f"USING parquet LOCATION '{loc}'"
                )
                cls._eng.execute(
                    "INSERT INTO bench_mvi_src "
                    "SELECT concat('d', id % 30), id * 1.0 "
                    "FROM RANGE(200000) t(id)"
                )
                # explicit tempdir location: a managed-path matview
                # would leave spark-warehouse/bench_mvi behind and
                # break the NEXT bench run's saveAsTable on the stale
                # path (fresh in-memory catalog, old directory)
                matview.create(
                    spark,
                    "bench_mvi",
                    "SELECT day, count(*) AS n, sum(amt) AS total "
                    "FROM bench_mvi_src GROUP BY day",
                    location=_tf.mkdtemp(prefix="swl_bench_mvi_v_"),
                )
            cls._k += 1
            # one part-file per delta (a 5k-row drip as 32 task files
            # is neither realistic nor stable to time)
            cls._eng.execute(
                f"INSERT INTO bench_mvi_src "
                f"SELECT /*+ REPARTITION(1) */ concat('d', id % 30), "
                f"{cls._k}.0 FROM RANGE(5000) t(id)"
            )
            cls._eng.execute(
                "REFRESH MATERIALIZED VIEW bench_mvi INCREMENTAL"
            )
            return spark.table("bench_mvi").groupBy().agg(
                F.count("*").alias("g"), F.sum("n").alias("rows")
            )

    suite["matview_incremental_refresh"] = _MatviewIncremental

    # Differential matview maintenance (r6): each measured run point-
    # DELETEs one row and folds the rewrite in via the signed delta —
    # cost tracks the CHANGED files (one old + one new), not the base.
    class _MatviewDifferential:
        _eng = None
        _k = 0

        @classmethod
        def build(cls, spark, sf_dir):
            import tempfile as _tf

            from pyspark.sql import functions as F

            from swanlake_spark.engine import Engine

            if cls._eng is None:
                from swanlake_spark import matview

                cls._eng = Engine(spark=spark)
                loc = _tf.mkdtemp(prefix="swl_bench_mvd_")
                cls._eng.execute(
                    f"CREATE TABLE bench_mvd_src (id BIGINT, day STRING, "
                    f"amt DOUBLE) USING parquet LOCATION '{loc}'"
                )
                cls._eng.execute(
                    "INSERT INTO bench_mvd_src "
                    "SELECT id, concat('d', id % 30), id * 1.0 "
                    "FROM RANGE(200000) t(id)"
                )
                matview.create(
                    spark,
                    "bench_mvd",
                    "SELECT day, count(*) AS n, sum(amt) AS total, "
                    "avg(amt) AS mean FROM bench_mvd_src GROUP BY day",
                    location=_tf.mkdtemp(prefix="swl_bench_mvd_v_"),
                )
            cls._k += 1
            cls._eng.execute(
                f"DELETE FROM bench_mvd_src WHERE id = {cls._k}"
            )
            cls._eng.execute(
                "REFRESH MATERIALIZED VIEW bench_mvd INCREMENTAL"
            )
            return spark.table("bench_mvd").groupBy().agg(
                F.count("*").alias("g"), F.sum("n").alias("rows")
            )

    suite["matview_differential_refresh"] = _MatviewDifferential

    # Join matview maintenance (r7): a 3-table star rollup — each
    # measured run appends a fact batch and folds it via the
    # multilinear telescoping delta (the appended files broadcast-join
    # BOTH dim snapshots), so refresh cost tracks the delta + dims,
    # never the 200k-row fact base.
    class _MatviewJoinIncremental:
        _eng = None
        _k = 0

        @classmethod
        def build(cls, spark, sf_dir):
            import tempfile as _tf

            from pyspark.sql import functions as F

            from swanlake_spark.engine import Engine

            if cls._eng is None:
                from swanlake_spark import matview

                cls._eng = Engine(spark=spark)
                cls._eng.execute(
                    f"CREATE TABLE bench_mvj_f (fk BIGINT, amt DOUBLE, "
                    f"dk BIGINT, dk2 BIGINT) USING parquet LOCATION "
                    f"'{_tf.mkdtemp(prefix='swl_bench_mvjf_')}'"
                )
                cls._eng.execute(
                    f"CREATE TABLE bench_mvj_d (dkey BIGINT, grp STRING) "
                    f"USING parquet LOCATION "
                    f"'{_tf.mkdtemp(prefix='swl_bench_mvjd_')}'"
                )
                cls._eng.execute(
                    f"CREATE TABLE bench_mvj_d2 (d2key BIGINT, "
                    f"seg STRING) USING parquet LOCATION "
                    f"'{_tf.mkdtemp(prefix='swl_bench_mvjd2_')}'"
                )
                cls._eng.execute(
                    "INSERT INTO bench_mvj_f "
                    "SELECT id, id * 1.0, id % 1000, id % 500 "
                    "FROM RANGE(200000) t(id)"
                )
                cls._eng.execute(
                    "INSERT INTO bench_mvj_d "
                    "SELECT id, concat('g', id % 30) FROM RANGE(1000) t(id)"
                )
                cls._eng.execute(
                    "INSERT INTO bench_mvj_d2 "
                    "SELECT id, concat('s', id % 8) FROM RANGE(500) t(id)"
                )
                matview.create(
                    spark,
                    "bench_mvj",
                    "SELECT grp, seg, count(*) AS n, sum(amt) AS total "
                    "FROM bench_mvj_f JOIN bench_mvj_d ON dk = dkey "
                    "JOIN bench_mvj_d2 ON dk2 = d2key "
                    "GROUP BY grp, seg",
                    location=_tf.mkdtemp(prefix="swl_bench_mvj_v_"),
                )
            cls._k += 1
            cls._eng.execute(
                f"INSERT INTO bench_mvj_f "
                f"SELECT /*+ REPARTITION(1) */ id, {cls._k}.0, id % 1000, "
                f"id % 500 FROM RANGE(5000) t(id)"
            )
            cls._eng.execute(
                "REFRESH MATERIALIZED VIEW bench_mvj INCREMENTAL"
            )
            return spark.table("bench_mvj").groupBy().agg(
                F.count("*").alias("g"), F.sum("n").alias("rows")
            )

    suite["matview_join_incremental"] = _MatviewJoinIncremental

    # Snapshot change feed (r6): each measured run point-UPDATEs one
    # row and reads table_changes across that commit — the manifests
    # diff driver-side and only the two changed files are scanned, so
    # feed latency tracks the churn, not the 200k-row table.
    class _CdcTableChanges:
        _eng = None
        _k = 0

        @classmethod
        def build(cls, spark, sf_dir):
            import tempfile as _tf

            from swanlake_spark.engine import Engine

            if cls._eng is None:
                cls._eng = Engine(spark=spark)
                loc = _tf.mkdtemp(prefix="swl_bench_cdc_")
                cls._eng.execute(
                    f"CREATE TABLE bench_cdc (id BIGINT, day STRING, "
                    f"amt DOUBLE) USING parquet LOCATION '{loc}'"
                )
                cls._eng.execute(
                    "INSERT INTO bench_cdc "
                    "SELECT id, concat('d', id % 30), id * 1.0 "
                    "FROM RANGE(200000) t(id)"
                )
            from swanlake_spark import versions as _versions

            cls._k += 1
            v0 = _versions.current_version(spark, "bench_cdc")
            cls._eng.execute(
                f"UPDATE bench_cdc SET amt = -1.0 WHERE id = {cls._k}"
            )
            v1 = _versions.current_version(spark, "bench_cdc")
            return cls._eng.query(
                f"SELECT _change_type, id, amt "
                f"FROM table_changes('bench_cdc', {v0}, {v1})"
            ).df

    suite["cdc_table_changes"] = _CdcTableChanges
    return suite


def main() -> None:
    from swanlake_spark.config import EngineConfig
    from swanlake_spark.engine import Engine

    # Shuffle partitions sized to the data scale (~600k-row lineitem →
    # a handful of ~16 MB partitions); AQE stays on and would coalesce a
    # larger setting at runtime anyway, but starting small avoids paying
    # 32-task scheduling overhead per sub-second stage. At cluster scale
    # this knob is deployment-sized (see EngineConfig docs).
    cfg = EngineConfig(
        app_name="swanlake-spark-bench",
        cpus=CPUS,
        shuffle_partitions=SHUFFLE_PARTITIONS,
        driver_memory=DRIVER_MEM,
    )
    eng = Engine(config=cfg)
    eng.spark.sparkContext.setLogLevel("ERROR")
    spark = eng.spark

    suite = build_suite(spark)

    # Load phase (like the reference's BenchBase load into DuckLake,
    # outside the measured window): ingest the single-file source tables
    # into the engine's own multi-part layout so scans parallelize.
    # Disable with SWL_BENCH_MATERIALIZE=0 to run on the raw files.
    if os.environ.get("SWL_BENCH_MATERIALIZE", "1") != "0":
        import tempfile

        from swanlake_spark.queries.oracle import mark_registered
        from swanlake_spark.sources.registry import materialize_warehouse

        materialize_warehouse(spark, SF_DIR, tempfile.mkdtemp(prefix="swl_bench_wh_"))
        mark_registered(spark, SF_DIR)

    # Per-query execution profile (QuerySpec.exec_conf): applied around
    # warmup+measurement and restored after, so e.g. the interactive
    # (static-plan) profile on sub-second queries never leaks into the
    # adaptive-by-default rest of the suite. Profiles are tuned for the
    # interactive/sub-second class, which only exists at small scale —
    # from sf1 up the same queries are shuffle-heavy and AQE-on with
    # default partitioning is the right configuration, so profiles are
    # ignored there (the sf1 scale-fidelity pass in SCALE.md runs with
    # this exact policy: no profiles, AQE on).
    from contextlib import contextmanager

    try:
        _sf = float(os.path.basename(SF_DIR.rstrip("/")).replace("sf", ""))
    except ValueError:
        _sf = -1.0
    apply_profiles = 0 < _sf < 1.0

    @contextmanager
    def exec_profile(spec):
        conf = (getattr(spec, "exec_conf", None) or {}) if apply_profiles else {}
        saved = {k: spark.conf.get(k, None) for k in conf}
        for k, v in conf.items():
            spark.conf.set(k, v)
        try:
            yield
        finally:
            for k, v in saved.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)

    # Warmup + measurement run PER ENTRY (warm W times, request a full
    # GC, measure M times) instead of a global warmup pass followed by
    # a global measurement pass. Two reasons:
    # - the reference's numbers are steady-state BenchBase latencies;
    #   JVM tiered compilation needs several executions of each codegen
    #   path before C2 kicks in, so each entry still gets WARMUP_RUNS
    #   passes immediately before its own timing;
    # - a global warmup runs the HEAVY pipeline entries (multi-second
    #   BPE training, LSH dedup) right before the sub-second TPC-H
    #   timings, and their garbage bled GC pauses into the measured
    #   window (r4: q4/q5/q6/q16 drifted +18-36% with no code change —
    #   q16 crossed its 2x-baseline gate on scheduling noise alone).
    #   Per-entry sectioning + an explicit System.gc() outside the
    #   timed window keeps each entry's measurement isolated.
    # Each measured run rebuilds the DataFrame (fresh plan, fresh RDD
    # lineage) so Spark cannot silently reuse shuffle outputs from the
    # previous run — every run pays scan + shuffle + agg like the
    # reference engine does. Plan/optimize time is therefore included.
    if ONLY:
        suite = {
            k: v for k, v in suite.items() if any(p in k for p in ONLY)
        }
    results: dict[str, float] = {}
    BANDS: dict[str, list[float]] = {}
    for key, spec in suite.items():
        with exec_profile(spec):
            n_warm = (
                TPCH_WARMUP_RUNS
                if re.fullmatch(r"q\d+", key)
                else WARMUP_RUNS
            )
            for _ in range(n_warm):
                spec.build(spark, SF_DIR).collect()
            spark._jvm.System.gc()
            times = []
            # TPC-H entries take 7 samples (the median then discards
            # three high outliers, not two — measured r8: the 5-sample
            # median still moved 7% run-to-run on q16); others keep 5
            n_meas = (
                max(MEASURE_RUNS, 7)
                if re.fullmatch(r"q\d+", key)
                else MEASURE_RUNS
            )
            for _ in range(n_meas):
                t0 = time.perf_counter()
                spec.build(spark, SF_DIR).collect()
                times.append(time.perf_counter() - t0)
        times.sort()
        # sub-0.5s TPC-H entries: median (scheduling jitter is a
        # double-digit share of the runtime there — see module
        # docstring); everything else: best-of, as in rounds 1-7
        if re.fullmatch(r"q\d+", key) and times[0] < 0.5:
            value = times[len(times) // 2]
        else:
            value = times[0]
        results[key] = round(value, 4)

    # r10: cross-pass median for the fastest TPC-H entries. A single
    # measurement section is one scheduler draw — the r9 driver run
    # landed q16 at 1.95x baseline while three full invocations put its
    # band median at 1.48x (a host-load spell during ONE section moves
    # every sample in it together, and the intra-section median can't
    # see that). Entries under 0.35 s re-measure in two more sections
    # spaced by the other entries' work; the recorded number is the
    # median of the three section-medians, so the artifact carries the
    # band median instead of one draw. Costs ~2x10 runs per fast entry.
    if not ONLY:
        fast = [
            k for k, v in results.items()
            if re.fullmatch(r"q\d+", k) and v < 0.35
        ]
        passes: dict[str, list[float]] = {k: [results[k]] for k in fast}
        for _ in range(2):
            for key in fast:
                spec = suite[key]
                with exec_profile(spec):
                    for _w in range(3):
                        spec.build(spark, SF_DIR).collect()
                    spark._jvm.System.gc()
                    times = []
                    for _m in range(7):
                        t0 = time.perf_counter()
                        spec.build(spark, SF_DIR).collect()
                        times.append(time.perf_counter() - t0)
                times.sort()
                passes[key].append(times[len(times) // 2])
        for key, vals in passes.items():
            vals.sort()
            results[key] = round(vals[len(vals) // 2], 4)

        # r11: cross-INVOCATION band (VERDICT r10 #10 protocol note —
        # the cross-section median still let one driver draw land q16
        # at 1.94x while same-tree invocations sat at 1.67x). Each run
        # appends its fast-entry section-band medians to a sidecar;
        # the recorded value becomes the median across the last runs
        # at the same sf, and the artifact carries the observed band
        # so a single unlucky scheduler draw can't move the headline.
        band_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            ".bench_band.json",
        )
        try:
            # r12 (ADVICE r11): key the sidecar by sf AND a tree hash
            # so a history recorded under a different code version can
            # never become the headline value; stale keys are pruned.
            # r12 (VERDICT #10): record EVERY entry (pipeline/matview
            # included, not just sub-0.35 s TPC-H) — cross-invocation
            # medians cost nothing extra and make uniform host-drift
            # rounds self-adjudicating.
            sf_key = "%s@%s" % (
                os.path.basename(SF_DIR.rstrip("/")),
                _tree_hash(),
            )
            try:
                with open(band_path) as fh:
                    hist = json.load(fh)
            except Exception:
                hist = {}
            runs = hist.get(sf_key, [])
            runs.append(dict(results))
            runs = runs[-5:]
            hist = {sf_key: runs}  # other tree versions are stale
            with open(band_path, "w") as fh:
                json.dump(hist, fh)
            for k in results:
                vals = sorted(r[k] for r in runs if k in r)
                if len(vals) >= 2:
                    results[k] = round(vals[len(vals) // 2], 4)
                    BANDS[k] = [vals[0], vals[-1]]
                elif k in fast:
                    BANDS[k] = [vals[0], vals[-1]]
        except Exception:
            pass  # the band is advisory; never fail the bench on it

    if ONLY:  # dev loop: print the subset and stop
        print(
            json.dumps(
                {
                    "metric": "dev_partial",
                    "value": round(sum(results.values()), 4),
                    "unit": "sec",
                    "queries": results,
                    "sf": -1,
                }
            )
        )
        eng.stop()
        return

    # Write path: the Arrow appender (reference's performance-critical
    # ingest, connection.rs:163-196) — latency of appending a 10k-row
    # batch (align + insertInto).
    import tempfile

    import pyarrow as pa

    from swanlake_spark.operators.ingest import insert_arrow

    loc = tempfile.mkdtemp(prefix="swl_bench_append_")
    spark.sql(
        "CREATE TABLE bench_append (id BIGINT, v DOUBLE, s STRING) "
        f"USING parquet LOCATION '{loc}'"
    )
    batch = pa.table(
        {
            "id": list(range(10_000)),
            "v": [i * 0.5 for i in range(10_000)],
            "s": [f"row-{i}" for i in range(10_000)],
        }
    )
    insert_arrow(spark, "bench_append", batch)  # warm
    best = float("inf")
    for _ in range(MEASURE_RUNS):
        t0 = time.perf_counter()
        insert_arrow(spark, "bench_append", batch)
        best = min(best, time.perf_counter() - t0)
    results["appender_insert_10k"] = round(best, 4)
    spark.sql("DROP TABLE bench_append")

    # YCSB write mix: the reference's second benchmark is a
    # 50/5/15/10/10/10 read/insert/scan/update/delete/RMW mix on an
    # 11-column usertable (ycsb-flight-sql.xml:24, ycsb-ddl-ducklake.sql)
    # — point read and scan are timed above as oracle entries; these put
    # the copy-on-write write path (UPDATE / DELETE / read-modify-write
    # through the DML layer) on the perf record. Each run targets a
    # fresh key so the affected-row short-circuit never turns the op
    # into a no-op.
    ycsb_loc = tempfile.mkdtemp(prefix="swl_bench_ycsb_")
    fields = ", ".join(f"field{i} STRING" for i in range(10))
    spark.sql(
        f"CREATE TABLE ycsb_usertable (ycsb_key STRING, {fields}) "
        f"USING parquet LOCATION '{ycsb_loc}'"
    )
    from pyspark.sql import functions as F

    n_rows = 100_000
    load = spark.range(n_rows).select(
        F.concat(F.lit("user"), F.col("id")).alias("ycsb_key"),
        *[
            F.md5(F.concat(F.lit(str(i)), F.col("id").cast("string"))).alias(
                f"field{i}"
            )
            for i in range(10)
        ],
    )
    load.repartition(CPUS).write.insertInto("ycsb_usertable")

    from swanlake_spark.operators.dml import delete_from, update_table

    key_seq = iter(range(n_rows))

    def ycsb_update():
        k = next(key_seq)
        return update_table(
            spark, "ycsb_usertable", {"field1": "'updated'"},
            f"ycsb_key = 'user{k}'",
        )

    def ycsb_delete():
        k = next(key_seq)
        return delete_from(spark, "ycsb_usertable", f"ycsb_key = 'user{k}'")

    def ycsb_rmw():
        k = next(key_seq)
        row = spark.sql(
            f"SELECT field2 FROM ycsb_usertable WHERE ycsb_key = 'user{k}'"
        ).collect()
        new_val = row[0][0][:8] + "-rmw"
        return update_table(
            spark, "ycsb_usertable", {"field2": f"'{new_val}'"},
            f"ycsb_key = 'user{k}'",
        )

    ins_seq = iter(range(n_rows, 10 * n_rows))

    def ycsb_insert():
        k = next(ins_seq)
        vals = ", ".join(f"'f{i}-{k}'" for i in range(10))
        spark.sql(f"INSERT INTO ycsb_usertable VALUES ('user{k}', {vals})")
        return 1

    for name, op in [
        ("ycsb_insert", ycsb_insert),
        ("ycsb_update", ycsb_update),
        ("ycsb_delete", ycsb_delete),
        ("ycsb_rmw", ycsb_rmw),
    ]:
        op()  # warm
        best = float("inf")
        for _ in range(MEASURE_RUNS):
            t0 = time.perf_counter()
            n = op()  # NOT inside an assert: python -O must still run it
            best = min(best, time.perf_counter() - t0)
            if n != 1:
                raise RuntimeError(f"{name}: expected 1 affected row, got {n}")
        results[name] = round(best, 4)
    spark.sql("DROP TABLE ycsb_usertable")

    tpch_total = sum(v for k, v in results.items() if k.startswith("q"))
    try:
        sf = float(os.path.basename(SF_DIR.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0
    print(
        json.dumps(
            {
                "metric": "tpch22_total_warm_latency",
                "value": round(tpch_total, 4),
                "unit": "sec",
                "queries": results,
                "sf": sf,
                # cross-invocation [min, max] observed for the fastest
                # TPC-H entries over recent same-sf runs of this tree
                # (their headline value is the band median)
                "bands": BANDS,
            }
        )
    )
    eng.stop()


if __name__ == "__main__":
    main()
