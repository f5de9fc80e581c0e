"""Streaming near-duplicate detection: incoming documents vs a
historical corpus.

The training-data scenario at 100 TB: a deduplicated historical corpus
exists; new documents arrive continuously and must be checked for
near-duplication against it *before* admission. Batch re-clustering per
arrival would rescan the corpus; instead:

- the historical side is indexed ONCE: MinHash signatures → LSH band
  hashes (`(band, bh, doc_id)`), a static DataFrame (persist it as a
  bucketed table on `(band, bh)` at scale so the per-batch join is
  co-located);
- the stream side computes signatures ROW-LOCALLY
  (:func:`~swanlake_spark.operators.dedup.minhash_signature_rowlocal` —
  no aggregation state, so it composes with any output mode) and bands
  them the same way;
- a stream-static equi-join on `(band, bh)` emits
  ``(doc_id, matched_id)`` collisions — append-mode safe, state-free
  (the static side is not stateful join state).

Exact-content streaming dedup (same id/content arriving twice within a
horizon) is the separate watermark-bounded
:func:`~swanlake_spark.streaming.ingest.streaming_dedup`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from swanlake_spark.operators import dedup

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


def stream_docs_from_directory(
    spark: SparkSession,
    source_dir: str,
    fmt: str = "json",
    max_files_per_trigger: int = 16,
) -> DataFrame:
    """File-source document stream (new files appended to the corpus
    landing dir)."""
    return (
        spark.readStream.format(fmt)
        .schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(source_dir)
    )


def historical_band_index(
    historical_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    shingle_n: int = 5,
    bands: int = 8,
) -> DataFrame:
    """The static LSH index of the historical corpus: (band, bh,
    hist_id). Built with the batch signature path (shuffle-based,
    cheaper for large corpora); at scale, write it out bucketed by
    (band, bh) and read it back so every micro-batch join is
    co-located."""
    sig = dedup.minhash_signature(
        historical_docs, id_col, text_col, num_hashes, shingle_n
    )
    return dedup.band_hashes(sig, id_col, bands).withColumnRenamed(
        id_col, "hist_id"
    )


def streaming_near_dup_matches(
    docs_stream: DataFrame,
    band_index: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    shingle_n: int = 5,
    bands: int = 8,
) -> DataFrame:
    """(doc_id, hist_id, band) rows for every incoming document whose
    signature collides with a historical document in ≥1 LSH band.

    Row-local signature + banding on the stream side (no aggregation
    state), then a stream-static inner equi-join on (band, bh) — valid
    in append mode with no watermark requirement. Downstream either
    drops matched docs (admission filter) or routes them to exact
    verification (the batch verify step of minhash_dedup_pairs)."""
    sig = dedup.minhash_signature_rowlocal(
        docs_stream, id_col, text_col, num_hashes, shingle_n
    )
    banded = dedup.band_hashes(sig, id_col, bands)
    return banded.join(band_index, ["band", "bh"]).select(
        F.col(id_col), F.col("hist_id"), F.col("band")
    )
