"""Exact duplicate-SPAN detection and removal (substring dedup).

The dedup modality the document-level families in ``dedup.py`` can't
express: two documents that are globally different but share a long
verbatim passage (boilerplate, license text, quoted articles) — the
case studied in "Deduplicating Training Data Makes Language Models
Better" (Lee et al. 2022, public), whose ExactSubstr tool removes
repeated spans of >= N tokens via a suffix array.

Spark-first re-expression — a suffix array over a concatenated 100 TB
corpus is a single-machine construction, so the same semantics
decompose into window hashing, which is one linear explode + one
hash-keyed shuffle:

1. every ``min_tokens``-long token window (stride 1) of every document
   is hashed (``xxhash64`` of the joined window text, JVM-side);
2. one groupBy(window-hash) finds hashes occurring more than once;
   each surviving group carries its occurrences' (doc, pos) and the
   group's deterministic FIRST occurrence (min (doc, pos)) — only
   groups with >1 occurrence shuffle anything wide, and a cap bounds
   pathological boilerplate groups;
3. per document, its duplicated window starts merge into maximal
   spans (overlapping or adjacent windows coalesce — a repeated
   passage of K tokens yields K-min_tokens+1 windows that fold into
   one span); the merge is an ``aggregate`` fold over the doc's own
   sorted positions, bounded by the doc's token count;
4. removal keeps the globally-first occurrence of every duplicated
   window and strips covered tokens elsewhere (keep_first=True — the
   paper's setting), or strips every occurrence (keep_first=False).

Hash-collision note: xxhash64 over >= 8-token windows makes a false
window-match ~2^-64; the verified-exact variant is the pure-Python
reference implementation in tests/test_span_dedup.py, which this
module is compared against on randomized corpora.

Scale: cost is O(total tokens) rows through one shuffle keyed by
window hash — the same shape as the MinHash shingle pass; no
suffix-array-style global ordering, no driver state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from swanlake_spark.operators.text import tokens

# a window repeated more than this many times (site-wide boilerplate)
# is still fully processed for REMOVAL, but its occurrence list is
# never collected anywhere — the cap only bounds the reported examples
_EXAMPLES_CAP = 8


def _windows(df: DataFrame, min_tokens: int, id_col: str, text_col: str):
    """(id, pos, whash) for every stride-1 token window. ``pos`` is the
    0-based index of the window's first token.

    Window identity = xxhash64 of the window's TOKEN-HASH slice, not of
    joined text: each token hashes once per document, and a window then
    hashes 8 longs instead of building an L-token string — measured
    ~4× less CPU on the window explode, the dominant cost at scale
    (window equality semantics are identical: token-sequence equality,
    with the same 2^-64 per-window collision odds the text hash had).

    The source is spread across cores first (``dedup._spread``): window
    generation is CPU-bound and a single-file source would otherwise
    run it on one core — measured 75 s → ~5 s for 2.4 M windows on the
    single-file sf1 documents table."""
    from swanlake_spark.operators.dedup import _spread

    df = _spread(df)
    toks = tokens(text_col)
    th = F.transform(toks, lambda t: F.xxhash64(t))
    n = F.size(toks)
    # guard: sequence(1, n-L+1) COUNTS DOWN when the doc is shorter
    # than one window (Spark auto-negates the step) — short docs have
    # zero windows, not a descending index walk through slice(start=0)
    win_hash = F.when(
        n >= F.lit(min_tokens),
        F.transform(
            F.sequence(F.lit(1), n - F.lit(min_tokens - 1)),
            lambda i: F.xxhash64(F.slice(th, i, min_tokens)),
        ),
    ).otherwise(F.array().cast("array<long>"))
    # posexplode the INLINE expression in one select: aliasing the
    # array into a column and exploding the alias in a second select
    # measured 17x slower at sf1 (Catalyst pushes a size>0 filter that
    # re-evaluates the whole lambda chain below the spread exchange,
    # single-core); the inline Generate evaluates it once per doc on
    # the spread partitions, and empty arrays yield no rows anyway —
    # no filter needed
    return df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(win_hash).alias("_pos", "_wh"),
    )


def duplicate_spans(
    df: DataFrame,
    min_tokens: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Maximal duplicated spans per document: ``(doc_id, span_start,
    span_end, n_tokens)`` in TOKEN indices (inclusive start, exclusive
    end). A span is any run of tokens covered by windows whose text
    occurs elsewhere in the corpus (another document or another
    position of the same document)."""
    w = _windows(df, min_tokens, id_col, text_col)
    dup_hashes = (
        w.groupBy("_wh")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > 1)
        .select("_wh")
    )
    dup_w = w.join(dup_hashes, "_wh", "left_semi")
    # merge each doc's sorted duplicated window starts into maximal
    # spans: starts s1 <= s2 coalesce when s2 <= prev_end (windows
    # overlap or touch). Fold state: array of [start, end) pairs —
    # bounded by the doc's own token count.
    starts = (
        dup_w.groupBy("_id")
        .agg(F.sort_array(F.collect_list("_pos")).alias("_ss"))
    )
    L = F.lit(min_tokens)
    init = F.array().cast("array<struct<s:long,e:long>>")

    def step(acc, s):
        # try_element_at: NULL on empty acc (plain element_at raises
        # under the engine's ANSI mode, even inside the unmatched
        # branch's condition)
        last = F.try_element_at(acc, F.lit(-1))
        extend = F.concat(
            F.slice(acc, 1, F.size(acc) - 1),
            F.array(
                F.struct(
                    last["s"].alias("s"), (s + L).cast("long").alias("e")
                )
            ),
        )
        new = F.concat(
            acc,
            F.array(
                F.struct(
                    s.cast("long").alias("s"), (s + L).cast("long").alias("e")
                )
            ),
        )
        return F.when(
            last.isNotNull() & (s <= last["e"]), extend
        ).otherwise(new)

    spans = starts.select(
        "_id", F.aggregate("_ss", init, step).alias("_spans")
    )
    return (
        spans.select("_id", F.explode("_spans").alias("_sp"))
        .select(
            F.col("_id").alias(id_col),
            F.col("_sp.s").alias("span_start"),
            F.col("_sp.e").alias("span_end"),
            (F.col("_sp.e") - F.col("_sp.s")).alias("n_tokens"),
        )
    )


def strip_duplicate_spans(
    df: DataFrame,
    min_tokens: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_first: bool = True,
) -> DataFrame:
    """Remove duplicated spans, returning ``(id_col, text,
    n_tokens_removed)`` with the covered tokens stripped.

    ``keep_first=True`` (the Lee et al. setting) preserves the
    corpus-wide FIRST occurrence of every duplicated window —
    deterministically min (doc, pos) per window hash — so exactly one
    copy of each repeated passage survives; ``False`` strips every
    occurrence. Document identity is preserved (empty-text documents
    remain as rows — dropping them is the caller's policy)."""
    w = _windows(df, min_tokens, id_col, text_col)
    occ = w.groupBy("_wh").agg(
        F.count(F.lit(1)).alias("_n"),
        F.min(F.struct("_id", "_pos")).alias("_first"),
    ).filter(F.col("_n") > 1)
    dup_w = w.join(occ.select("_wh", "_first"), "_wh")
    if keep_first:
        dup_w = dup_w.filter(
            ~(
                (F.col("_id") == F.col("_first._id"))
                & (F.col("_pos") == F.col("_first._pos"))
            )
        )
    starts = (
        dup_w.groupBy("_id")
        .agg(F.sort_array(F.collect_set("_pos")).alias("_ss"))
    )
    from swanlake_spark.operators.dedup import _spread

    toks = tokens(text_col)
    # the rebuild is CPU-bound too (per-token span-coverage filter)
    base = _spread(df).select(
        F.col(id_col).alias("_id"), F.struct(*df.columns).alias("_row"),
        toks.alias("_toks"),
    )
    joined = base.join(starts, "_id", "left")
    L = F.lit(min_tokens)
    # token i is removed iff some duplicated window start s covers it
    # (s <= i < s+L); _ss is sorted so EXISTS short-circuits early
    kept = F.when(F.col("_ss").isNull(), F.col("_toks")).otherwise(
        F.filter(
            F.col("_toks"),
            lambda t, i: ~F.exists(
                F.col("_ss"), lambda s: (s <= i) & (i < s + L)
            ),
        )
    )
    return joined.select(
        F.col("_row")[id_col].alias(id_col),
        F.array_join(kept, " ").alias(text_col),
        (F.size("_toks") - F.size(kept)).alias("n_tokens_removed"),
    )


def span_dedup_stats(
    df: DataFrame,
    min_tokens: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """One-row corpus report: documents affected, duplicated spans,
    duplicated tokens, plus up to ``_EXAMPLES_CAP`` example spans —
    the audit output a curation run logs before destructive removal."""
    spans = duplicate_spans(df, min_tokens, id_col, text_col)
    return spans.agg(
        F.count_distinct(id_col).alias("docs_affected"),
        F.count(F.lit(1)).alias("dup_spans"),
        F.sum("n_tokens").alias("dup_tokens"),
        F.slice(
            F.sort_array(
                F.collect_list(
                    F.struct(id_col, "span_start", "span_end")
                )
            ),
            1,
            _EXAMPLES_CAP,
        ).alias("examples"),
    )
