"""Text-analysis operators for large-scale training-data pipelines.

All operators are pure built-in-function DataFrame transforms (JVM-side,
whole-stage codegen, no Python UDFs) so they scale linearly over 100 TB
of documents: narrow per-row transforms, no shuffles.

Operators: tokenization, token counting, quality scoring, language-ID
heuristic, document fingerprinting.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Stopword profiles for the language-ID heuristic (n-gram/stopword
# frequency heuristics are the classic cheap lang-ID approach).
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "für", "auf", "ein"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "por", "con", "para"],
    "fr": ["le", "la", "de", "et", "un", "que", "pour", "dans", "est", "sur"],
}


def tokens(text_col: str | Column = "text") -> Column:
    """Whitespace tokenization of trimmed text."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.split(F.trim(c), r"\s+")


def token_count(text_col: str | Column = "text") -> Column:
    """Whitespace token count (INT)."""
    return F.size(tokens(text_col)).cast("int")


def bpe_ish_token_count(text_col: str | Column = "text") -> Column:
    """A BPE-ish proxy token count: word-piece split on non-alphanumerics
    plus a length/4 penalty for long words (approximates subword
    splitting without a vocab)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    words = F.split(F.trim(c), r"[^A-Za-z0-9]+")
    return F.aggregate(
        words,
        F.lit(0),
        lambda acc, w: acc + F.greatest(F.lit(1), F.ceil(F.length(w) / 4).cast("int")),
    ).cast("int")


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append quality-signal columns: n_chars_q, n_tokens, avg_token_len,
    alpha_ratio, space_ratio, stopword_ratio."""
    t = tokens(text_col)
    c = F.col(text_col)
    n_chars = F.length(c)
    n_tokens = F.size(t)
    sw = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    return (
        df.withColumn("n_chars_q", n_chars.cast("int"))
        .withColumn("n_tokens", n_tokens.cast("int"))
        .withColumn(
            "avg_token_len",
            F.round((n_chars - n_tokens + 1) / n_tokens, 4),
        )
        .withColumn(
            "alpha_ratio",
            F.round(
                F.length(F.regexp_replace(c, r"[^A-Za-z]", "")) / n_chars, 4
            ),
        )
        .withColumn(
            "stopword_ratio",
            F.round(
                F.size(F.filter(t, lambda w: F.array_contains(sw, F.lower(w))))
                / n_tokens,
                4,
            ),
        )
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """A single [0,1] quality score: rewards mid-length documents,
    alphabetic content and natural stopword rates.

    Computed from *unrounded* ratios — combining pre-rounded 4-decimal
    features through the 0.4/0.3 weights lands exactly on decimal half
    boundaries, where engines' rounding modes diverge."""
    out = quality_features(df, text_col)
    t = tokens(text_col)
    c = F.col(text_col)
    n_tokens = F.size(t)
    sw = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    alpha_raw = F.length(F.regexp_replace(c, r"[^A-Za-z]", "")) / F.length(c)
    stop_raw = (
        F.size(F.filter(t, lambda w: F.array_contains(sw, F.lower(w)))) / n_tokens
    )
    length_term = F.least(n_tokens / F.lit(64.0), F.lit(1.0))
    score = (
        0.4 * length_term
        + 0.3 * alpha_raw
        + 0.3 * F.least(stop_raw * 4, F.lit(1.0))
    )
    # floor(x*1e4 + 0.5)/1e4 instead of round(x, 4): the weighted blend
    # can land within 1 ulp of a decimal half-boundary, where engines'
    # round() implementations diverge; floor of identical IEEE doubles
    # cannot (score >= 0, so this IS half-up).
    return out.withColumn(
        "quality", F.floor(score * 10000 + 0.5).cast("double") / 10000.0
    )


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Cheap language ID: per-language stopword hit-rate; argmax wins,
    'und' (undetermined) if the best rate is below 2%."""
    t = tokens(text_col)
    out = df
    for lang, words in STOPWORDS.items():
        sw = F.array(*[F.lit(w) for w in words])
        out = out.withColumn(
            f"_sc_{lang}",
            F.size(F.filter(t, lambda w: F.array_contains(sw, F.lower(w))))
            / F.size(t),
        )
    best = F.greatest(*[F.col(f"_sc_{lang}") for lang in STOPWORDS])
    pred = F.lit("und")
    # deterministic tie-break: first language (in dict order) achieving max
    for lang in reversed(list(STOPWORDS)):
        pred = F.when(F.col(f"_sc_{lang}") == best, F.lit(lang)).otherwise(pred)
    out = out.withColumn(
        "pred_lang", F.when(best >= 0.02, pred).otherwise(F.lit("und"))
    )
    return out.drop(*[f"_sc_{lang}" for lang in STOPWORDS])


def fingerprint(text_col: str | Column = "text", bits: int = 64) -> Column:
    """Deterministic document fingerprint: md5 of whitespace-normalized,
    lower-cased text, truncated to bits/4 hex chars. Cross-engine
    reproducible (md5 is standard everywhere)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    norm = F.lower(F.regexp_replace(F.trim(c), r"\s+", " "))
    return F.substring(F.md5(norm), 1, bits // 4)


def build_vocab(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 1,
    top_k: int | None = None,
) -> DataFrame:
    """Corpus vocabulary: global token counts (lower-cased whitespace
    tokens), the tokenizer-training prerequisite. One explode + one
    map-side-combinable groupBy — a single shuffle keyed on token, no
    global window. ``top_k`` bounds the result via a count-ordered limit
    (a top-k reduce, not a full sort of the vocabulary); ``rank`` is
    assigned only within that bounded set."""
    from pyspark.sql.window import Window

    counts = (
        df.select(F.explode(tokens(text_col)).alias("token"))
        .withColumn("token", F.lower("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").cast("long").alias("count"))
        .filter(F.col("count") >= min_count)
    )
    if top_k is None:
        return counts
    top = counts.orderBy(F.col("count").desc(), F.col("token")).limit(top_k)
    w = Window.orderBy(F.col("count").desc(), F.col("token"))
    # the window runs over <= top_k rows (bounded small), not the corpus
    return top.withColumn("rank", F.row_number().over(w).cast("long"))


def tfidf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_per_doc: int = 3,
) -> DataFrame:
    """Smooth TF-IDF (sklearn's formula: idf = ln((N+1)/(df+1)) + 1) with
    the top ``n_per_doc`` terms per document.

    Shape (r12): ONE corpus explode. The ``(doc, token)`` count table
    already holds exactly one row per document-term pair, so document
    frequency is an analytic ``count(*) OVER (PARTITION BY token)`` on
    it — the former separate explode → distinct → groupBy(token) →
    join leg re-tokenized the whole corpus a second time for a number
    derivable from the first pass. Three token/doc-keyed shuffles
    total (tf groupBy, df window, top-n window), never a global sort;
    values are identical (integer pair counts either way)."""
    from pyspark.sql.window import Window

    toks = (
        df.select(id_col, F.explode(tokens(text_col)).alias("token"))
        .withColumn("token", F.lower("token"))
        .filter(F.col("token") != "")
    )
    tf = toks.groupBy(id_col, "token").agg(
        F.count("*").cast("long").alias("tf")
    )
    n_docs = df.select(id_col).distinct().count()
    w_t = Window.partitionBy("token")
    idf = F.log((F.lit(float(n_docs)) + 1.0) / (F.col("df") + 1.0)) + 1.0
    scored = tf.withColumn(
        "df", F.count(F.lit(1)).over(w_t).cast("long")
    ).withColumn(
        "tfidf",
        F.floor(F.col("tf") * idf * 10000 + 0.5) / 10000.0,
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("token")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= n_per_doc)
        .select(id_col, "token", "tf", "df", "tfidf", "rk")
    )
