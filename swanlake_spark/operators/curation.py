"""Corpus-curation operators for large-scale training-data pipelines:
PII redaction, repetition scoring, benchmark decontamination, domain
mixing, deterministic global shuffle.

Everything here is built-in-function DataFrame work (JVM-side,
whole-stage codegen; zero Python UDFs) and every operator is
deterministic across runs, engines, and partition layouts, so each one
carries a DuckDB hash-match oracle:

- ``pii_redact``: sequential ``regexp_replace`` over a fixed pattern
  order, plus per-category match counts. Narrow projection — no
  shuffle; scales as a pure scan.
- ``repetition_scores``: Gopher-style repetition signals (distinct
  n-gram ratios, top-token fraction) from higher-order array functions.
  Per-row cost is O(tokens · distinct tokens); no shuffle.
- ``decontaminate``: flags corpus documents sharing any token n-gram
  with a benchmark set — the standard pretraining decontamination step.
  Benchmark n-grams are broadcast (benchmarks are MBs, corpora are TBs),
  so the corpus side is scan → explode → broadcast-join → one groupBy
  on doc id.
- ``domain_mix``: per-domain deterministic downsampling rates (domain
  reweighting for training mixtures), built on the same md5 hash-range
  membership as ``sampling`` — reproducible on any engine or layout.
- ``deterministic_shuffle``: a stable global permutation of the corpus
  (training-order shuffle) as a two-phase distributed rank — bucketed
  ``row_number`` plus broadcast bucket offsets — never a
  single-partition global window.

Reference scope note: the reference engine (swanlake-core) has no
curation surface; these extend the pipeline layer the same way
dedup/similarity do (SURVEY.md §7.2 step 10).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from swanlake_spark.operators.sampling import _threshold_hex, sample_key
from swanlake_spark.operators.text import tokens

# PII patterns, applied (and counted) in this order. Common Java-regex /
# RE2 subset only — no lookarounds, no backreferences — so Spark and
# DuckDB match identically. Counts are per-pattern over the ORIGINAL
# text (categories are written to be disjoint; sequential counting over
# intermediate rewrites would make the oracle SQL quadratic).
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("card", r"\b\d{4}[ -]\d{4}[ -]\d{4}[ -]\d{4}\b", "<CC>"),
    ("phone", r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
)


def pii_redact(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Replace PII spans with typed placeholders and count matches per
    category. Adds ``text_redacted`` and one ``n_<category>`` column per
    pattern. Pure narrow projection — the 100 TB cost is the scan."""
    c = F.col(text_col)
    out = df
    red = c
    for name, pat, repl in PII_PATTERNS:
        out = out.withColumn(
            f"n_{name}",
            F.size(F.regexp_extract_all(c, F.lit(pat), F.lit(0))).cast("int"),
        )
        red = F.regexp_replace(red, pat, repl)
    return out.withColumn("text_redacted", red)


def _grams(t: Column, n: int) -> Column:
    """Token n-grams as space-joined strings (same shape as the dedup
    shingles — ``array_to_string(t[i:i+n], ' ')`` on the DuckDB side).

    The input array is LET-BOUND via a single-element transform before
    the per-gram slice (the ``dedup.shingles`` pattern): callers pass
    the whole tokenize chain as ``t``, and referencing it directly
    inside the lambda would re-evaluate the split once per gram —
    Catalyst does no CSE through lambda bodies, so the inline form is
    quadratic in document length."""

    def _per_doc(arr):
        return F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(arr) - n, F.lit(0))),
            lambda i: F.array_join(F.slice(arr, i + 1, n), " "),
        )

    return F.flatten(F.transform(F.array(t), _per_doc))


def _round4(x: Column) -> Column:
    # floor(x*1e4 + 0.5) instead of round(x, 4): token-count ratios are
    # small rationals that can land within 1 ulp of a decimal half
    # boundary, where engines' round() modes diverge; floor of identical
    # IEEE doubles cannot (all inputs >= 0, so this IS half-up).
    return F.floor(x * 10000 + 0.5).cast("double") / 10000.0


def repetition_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition signals per document:

    - ``uniq_1gram_ratio`` / ``uniq_2gram_ratio`` / ``uniq_3gram_ratio``:
      distinct/total n-gram ratios (1.0 = no repetition; duplicated
      n-grams pull it down),
    - ``top_token_frac``: fraction of tokens taken by the single most
      frequent token (boilerplate/spam detector).

    All higher-order array expressions over the token list — per-row,
    no shuffle, codegen'd.

    The token array and both gram arrays are LET-BOUND once per row
    (nested single-element transforms) and the four ratios come out as
    one struct column expanded in a separate projection: the inline
    form re-evaluated the tokenize chain inside the ``top`` lambda once
    per DISTINCT token (quadratic) and re-split the text once per
    output column (Catalyst does no CSE through lambda bodies, and
    ``CollapseProject`` would otherwise inline the chain per use)."""
    uniq = lambda g: _round4(F.size(F.array_distinct(g)) / F.size(g))  # noqa: E731

    def _metrics(b):
        arr, g2, g3 = b["t"], b["g2"], b["g3"]
        top = F.array_max(
            F.transform(
                F.array_distinct(arr),
                lambda w: F.size(F.filter(arr, lambda x: x == w)),
            )
        )
        return F.struct(
            uniq(arr).alias("u1"),
            uniq(g2).alias("u2"),
            uniq(g3).alias("u3"),
            _round4(top / F.size(arr)).alias("tf"),
        )

    def _bound(arr):
        return F.transform(
            F.array(
                F.struct(
                    arr.alias("t"),
                    _grams(arr, 2).alias("g2"),
                    _grams(arr, 3).alias("g3"),
                )
            ),
            _metrics,
        )[0]

    scores = F.transform(F.array(tokens(text_col)), _bound)[0]
    out = df.withColumn("_rs", scores)
    return out.select(
        *[F.col(c) for c in df.columns],
        F.col("_rs.u1").alias("uniq_1gram_ratio"),
        F.col("_rs.u2").alias("uniq_2gram_ratio"),
        F.col("_rs.u3").alias("uniq_3gram_ratio"),
        F.col("_rs.tf").alias("top_token_frac"),
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination: find corpus documents sharing at least
    one token ``n``-gram with any benchmark document (the standard
    n-gram-collision test-set-leakage check for pretraining corpora).

    Returns one row per contaminated corpus document:
    ``(id_col, n_hits, n_bench_docs)`` — distinct colliding n-grams and
    distinct benchmark documents hit.

    Scale shape: the benchmark's distinct n-grams are broadcast (bench
    sets are MB-scale against TB corpora), so the corpus side is a
    single narrow explode + broadcast hash join + one groupBy on the
    document id. No shuffle touches the full corpus text. The join and
    the hit counts run on xxhash64 of the gram, not the gram string —
    the broadcast table carries 8 bytes per gram instead of the n-token
    text, and the probe compares longs (a 64-bit collision would need
    ~10⁹ distinct grams per bench doc to matter). Narrow single-file
    inputs are spread across cores before the CPU-bound explode
    (``_spread``), a no-op on wide scans."""
    from swanlake_spark.operators.dedup import _spread

    c_grams = _spread(corpus).select(
        F.col(id_col),
        F.explode(
            F.array_distinct(
                F.transform(_grams(tokens(text_col), n), lambda g: F.xxhash64(g))
            )
        ).alias("_gh"),
    )
    b_grams = (
        _spread(benchmark)
        .select(
            F.col(id_col).alias("_bench_id"),
            F.explode(
                F.array_distinct(
                    F.transform(_grams(tokens(text_col), n), lambda g: F.xxhash64(g))
                )
            ).alias("_gh"),
        )
        .distinct()
    )
    return (
        c_grams.join(F.broadcast(b_grams), "_gh")
        .groupBy(id_col)
        .agg(
            F.countDistinct("_gh").cast("long").alias("n_hits"),
            F.countDistinct("_bench_id").cast("long").alias("n_bench_docs"),
        )
    )


def domain_mix(
    df: DataFrame,
    weights: dict[str, float],
    default_weight: float = 1.0,
    domain_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Domain reweighting: keep each row with its domain's sampling rate
    (a deterministic per-domain Bernoulli — the downsampling half of a
    training-mixture recipe; upweighting is repetition at the loader).
    Membership is the md5 hash-range rule from ``sampling``, so the kept
    set is identical on every run, engine, and layout. Narrow filter —
    no shuffle."""
    thr = F.lit(_threshold_hex(default_weight))
    for dom, w in sorted(weights.items()):
        thr = F.when(F.col(domain_col) == dom, F.lit(_threshold_hex(w))).otherwise(
            thr
        )
    full = F.lit(_threshold_hex(1.0))
    return df.filter(
        (thr >= full) | (sample_key(id_col, salt) < thr)
    )


def deterministic_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    seed: str = "shuffle",
    buckets: int = 256,
    pos_col: str = "shuffle_pos",
) -> DataFrame:
    """Stable global training-order shuffle: every row gets its position
    in the permutation ordered by ``md5(seed || id)`` (id tiebreak).
    Re-runs, engines, and partition layouts all produce the identical
    permutation — the property pretraining dataloaders need for resume
    and ablation reproducibility.

    Never a single-partition global window: rank = two-phase distributed
    prefix sum (the ``packing`` scheme) — bucket on the key's top byte
    (uniform by construction, md5) through a MONOTONE range map, so all
    of bucket b sorts before all of bucket b+1; per-bucket
    ``row_number`` in parallel, plus broadcast exclusive-cumsum bucket
    offsets over ``buckets`` rows."""
    buckets = min(max(buckets, 1), 256)  # one byte of key granularity
    keyed = df.withColumn("_sk", sample_key(id_col, seed)).withColumn(
        "_bkt",
        F.floor(
            F.conv(F.substring("_sk", 1, 2), 16, 10).cast("long") * buckets / 256
        ).cast("long"),
    )
    w_in = Window.partitionBy("_bkt").orderBy("_sk", id_col)
    ranked = keyed.withColumn("_rk", F.row_number().over(w_in))

    totals = keyed.groupBy("_bkt").agg(F.count("*").alias("_tot"))
    w_b = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.withColumn(
        "_base", F.coalesce(F.sum("_tot").over(w_b), F.lit(0))
    ).select("_bkt", "_base")

    return (
        ranked.join(F.broadcast(offsets), "_bkt")
        .withColumn(pos_col, (F.col("_base") + F.col("_rk") - 1).cast("long"))
        .drop("_sk", "_bkt", "_rk", "_base")
    )


def line_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-level line deduplication (the C4-style global step): a
    non-blank line survives only in the document where it first occurs
    (lowest ``(doc_id, line_no)``); every later occurrence corpus-wide
    is dropped. Blank lines are structural, not content, and pass
    through untouched. Documents keep their surviving lines in original
    order; documents whose every non-blank line was claimed elsewhere
    drop out.

    Returns ``(id_col, text, n_kept, n_dropped)`` with ``text``
    rebuilt from the kept lines.

    Scale shape (r12): explode lines ONCE → one analytic pass over the
    line-hash partition finds each line's corpus-wide first occurrence
    (``min(struct(doc, line_no)) OVER (PARTITION BY blank?, hash)``) →
    groupBy(doc) reassembly. Two shuffles. The former groupBy(hash) +
    join-back shape evaluated the corpus line-explode three times
    (content leg, blank leg, join probe) and shuffled the content rows
    twice. Blank lines are structural and always kept: they get a
    per-row partition key (hash of (doc, line_no)) in a SEPARATE
    key namespace (the boolean blank flag is part of the partition
    key), so they spread uniformly instead of collapsing one
    billion-blank-line partition onto one task, can never collide
    with a content group, and their ``_keep`` is unconditional.
    """
    from swanlake_spark.operators.dedup import _spread

    lines = _spread(df).select(
        F.col(id_col).alias("_d"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("_ln", "_line"),
    )
    keyed = lines.withColumn(
        "_blank", F.trim("_line") == ""
    ).withColumn(
        "_h",
        F.when(
            F.col("_blank"), F.xxhash64(F.col("_d"), F.col("_ln"))
        ).otherwise(F.xxhash64("_line")),
    )
    ww = Window.partitionBy("_blank", "_h")
    marked = keyed.withColumn(
        "_w", F.min(F.struct("_d", "_ln")).over(ww)
    ).select(
        "_d",
        "_ln",
        "_line",
        (
            F.col("_blank")
            | (
                (F.col("_w._d") == F.col("_d"))
                & (F.col("_w._ln") == F.col("_ln"))
            )
        ).alias("_keep"),
    )
    per_doc = marked.groupBy("_d").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("_keep"), F.struct("_ln", "_line"))
                    )
                ),
                lambda s: s["_line"],
            ),
            "\n",
        ).alias("text"),
        F.count(F.when(F.col("_keep") & (F.trim("_line") != ""), 1)).alias(
            "_nk"
        ),
        F.count(F.when(~F.col("_keep"), 1)).alias("_nd"),
    )
    return (
        per_doc.filter(F.col("_nk") > 0)
        .select(
            F.col("_d").alias(id_col),
            "text",
            F.col("_nk").cast("long").alias("n_kept"),
            F.col("_nd").cast("long").alias("n_dropped"),
        )
    )


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 128,
    overlap: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Context-window chunking: split each document's token stream into
    windows of ``chunk_tokens`` tokens advancing by
    ``chunk_tokens - overlap`` (so consecutive chunks share ``overlap``
    tokens) — the standard pre-tokenization step for long-document
    training and retrieval indexing.

    Returns one row per chunk: ``(id_col, chunk_id, chunk_text,
    n_tokens)``. A document shorter than one window yields exactly one
    chunk. Pure row-local explode — the 100 TB cost is the scan plus
    the output multiplier; no shuffle.
    """
    from swanlake_spark.errors import InvalidArgument
    from swanlake_spark.operators.dedup import _spread

    stride = chunk_tokens - overlap
    if stride <= 0:
        raise InvalidArgument(
            f"overlap ({overlap}) must be smaller than chunk_tokens "
            f"({chunk_tokens})"
        )
    t = tokens(text_col)
    n_chunks = F.greatest(
        F.ceil((F.size(t) - F.lit(overlap)) / F.lit(stride)), F.lit(1)
    ).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            F.array_join(
                F.slice(t, i * stride + 1, chunk_tokens), " "
            ).alias("chunk_text"),
            F.size(F.slice(t, i * stride + 1, chunk_tokens))
            .cast("long")
            .alias("n_tokens"),
        ),
    )
    return _spread(df).select(
        F.col(id_col),
        F.posexplode(chunks).alias("chunk_id", "_c"),
    ).select(
        id_col,
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.col("_c.chunk_text").alias("chunk_text"),
        F.col("_c.n_tokens").alias("n_tokens"),
    )


def unigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    reference: DataFrame | None = None,
) -> DataFrame:
    """Per-document mean unigram log-probability under the corpus (or a
    supplied ``reference`` corpus) unigram model — the cheap stand-in
    for KenLM perplexity filtering: documents whose tokens are unlikely
    under the reference distribution (gibberish, boilerplate soup, wrong
    language) score low and can be thresholded out.

    Model: p(w) = count(w) / total, add-one smoothed over the vocab for
    unseen tokens; score = mean over doc tokens of ln p(w), rounded to
    4 decimals (the cross-engine float discipline).

    Shape: one token-keyed shuffle to build the model, one broadcast-or
    shuffle join of doc tokens against it, one per-doc aggregation — no
    Python in the hot path, no global sort. The model side is vocab-
    sized (small relative to the corpus), so Spark broadcasts it."""
    from swanlake_spark.operators.text import build_vocab

    ref = reference if reference is not None else df
    vocab = build_vocab(ref, text_col=text_col)
    totals = vocab.agg(
        F.sum("count").alias("_total"), F.count("*").alias("_v")
    ).collect()[0]
    total, v = float(totals["_total"]), float(totals["_v"])
    toks = (
        df.select(id_col, F.explode(tokens(text_col)).alias("token"))
        .withColumn("token", F.lower("token"))
        .filter(F.col("token") != "")
    )
    # add-one smoothing: unseen tokens get ln(1 / (total + |V|))
    joined = toks.join(F.broadcast(vocab), "token", "left").withColumn(
        "_lp",
        F.log(
            (F.coalesce(F.col("count"), F.lit(0)) + 1.0)
            / F.lit(total + v)
        ),
    )
    return (
        joined.groupBy(id_col)
        .agg(
            _round4(F.avg("_lp")).alias("mean_logprob"),
            F.count("*").cast("long").alias("n_tokens"),
        )
    )


def select_top_tokens(
    df: DataFrame,
    token_budget: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    quality_col: str | None = None,
    buckets: int = 64,
) -> DataFrame:
    """Greedy corpus selection under a token budget: take documents in
    descending quality order (ties broken by ``id_col``) until the
    cumulative whitespace-token count would exceed ``token_budget`` —
    the "keep the best N tokens" step every pretraining data recipe
    ends with once scores exist. Returns ``(id, n_tokens, cum_tokens)``
    for the kept documents.

    ``quality_col`` names a precomputed score column; when None the
    rule-based ``text.quality_score`` is computed inline.

    Scale shape — the naive ``sum(len) OVER (ORDER BY quality DESC)``
    is a single-partition global sort (one task sorts 100 TB). This is
    the distributed two-phase prefix sum instead (the
    ``packing.pack_sequences`` pattern, re-keyed for a SCORE order):

    1. bucket by quality BAND — ``floor((1-q) * buckets)`` — a pure
       projection (deterministic on any layout; no range sampling), and
       ordering-compatible: every doc in band k outranks every doc in
       band k+1, so band-local order + band base offsets reproduce the
       exact global order;
    2. per-band windowed cumsum (each band sorts only its slice);
    3. band base offsets via a cumsum over the *bucket-count* totals
       (KBs), broadcast back.

    Skew note: a corpus whose scores all collapse into one band
    degrades to the single-partition sort for that band — real score
    distributions spread; raise ``buckets`` to narrow bands."""
    from swanlake_spark.operators import text as _text

    if quality_col is None:
        df = _text.quality_score(df, text_col)
        quality_col = "quality"
    b = df.select(
        F.col(id_col),
        F.size(tokens(text_col)).cast("long").alias("n_tokens"),
        F.col(quality_col).cast("double").alias("_q"),
    ).withColumn(
        "_bkt",
        F.least(
            F.greatest(
                F.floor((F.lit(1.0) - F.col("_q")) * buckets), F.lit(0)
            ),
            F.lit(buckets - 1),
        ).cast("long"),
    )
    w_in = (
        Window.partitionBy("_bkt")
        .orderBy(F.col("_q").desc(), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # r12: ONE pass computes scores, bands and the in-band cumsum; the
    # per-band totals are then just max(_cum_in) (n_tokens >= 0, so the
    # running sum's last value IS the band total) instead of a second
    # scan of the corpus — the former `b.groupBy(_bkt).sum` leg
    # re-ran the quality_score regex battery over the full text a
    # second time. The scored frame is pinned executor-local before
    # branching (it feeds both the totals agg and the final join); it
    # is a NARROW projection — id + three numerics, the same rows the
    # band window already shuffled — never the document text.
    # eager=False: the offsets (broadcast) job materializes the
    # checkpoint as a side effect and the probe side then reads the
    # pinned blocks — no extra serialized job on the measured path
    within = b.withColumn(
        "_cum_in", F.sum("n_tokens").over(w_in)
    ).localCheckpoint(eager=False)
    totals = within.groupBy("_bkt").agg(F.max("_cum_in").alias("_tot"))
    w_b = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.withColumn(
        "_base", F.coalesce(F.sum("_tot").over(w_b), F.lit(0))
    ).select("_bkt", "_base")
    return (
        within.join(F.broadcast(offsets), "_bkt")
        .withColumn("cum_tokens", F.col("_base") + F.col("_cum_in"))
        .filter(F.col("cum_tokens") <= F.lit(int(token_budget)))
        .select(id_col, "n_tokens", "cum_tokens")
    )
