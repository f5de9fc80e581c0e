"""Model-based quality classification for training-data curation.

The standard LLM-curation quality filter (CCNet / GPT-3 / DCLM
lineage, all public): train a linear classifier to separate a trusted
high-quality reference set from raw corpus documents, score every
document with the model's probability, and keep documents above a
threshold (or importance-sample by score). Complements the
rule-based ``text.quality_score`` heuristics with a LEARNED signal.

Spark-first shape — every stage is JVM-side ``pyspark.ml``:

- featurization: regex tokenization → hashed bag-of-words
  (``HashingTF``, murmur3 into a fixed 2^18 space — no vocabulary
  state to ship, identical hashing on any cluster) + the rule-based
  quality features as dense extras;
- training: ``LogisticRegression`` (distributed L-BFGS, deterministic
  for a fixed dataset — no sampling, no random init);
- scoring: one ``model.transform`` — a narrow projection + vector dot
  per row, no shuffle, trivially 100 TB-parallel.

Verification (tests/test_quality_model.py): determinism under
repartitioning; separation on synthetic clean/garbage corpora; and
ranking agreement against an independent numpy gradient-descent
logistic regression trained on the exact same feature vectors (the
features are extracted FROM the fitted pipeline, so the reference
model sees identical inputs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_LABEL = "_swl_quality_label"
_TOKENS = "_swl_tokens"
_TF = "_swl_tf"


def _pipeline(text_col: str, n_features: int, reg_param: float):
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF, RegexTokenizer

    tok = RegexTokenizer(
        inputCol=text_col,
        outputCol=_TOKENS,
        pattern=r"\W+",
        toLowercase=True,
    )
    tf = HashingTF(
        inputCol=_TOKENS, outputCol=_TF, numFeatures=n_features
    )
    lr = LogisticRegression(
        featuresCol=_TF,
        labelCol=_LABEL,
        maxIter=60,
        regParam=reg_param,
        standardization=False,
        family="binomial",
    )
    return Pipeline(stages=[tok, tf, lr])


def train_quality_classifier(
    positives: DataFrame,
    negatives: DataFrame,
    text_col: str = "text",
    n_features: int = 1 << 18,
    reg_param: float = 0.01,
):
    """Fit the reference-vs-raw classifier. ``positives`` is the
    trusted high-quality set (e.g. curated reference documents),
    ``negatives`` a sample of the raw corpus. Returns the fitted
    ``PipelineModel`` (tokenize → hash-TF → logistic regression).

    Scale: training cost is one L-BFGS run over the (typically
    dim-sized) labeled sample — the 100 TB corpus is only touched at
    SCORING time, one model.transform pass."""
    pos = positives.select(F.col(text_col)).withColumn(_LABEL, F.lit(1.0))
    neg = negatives.select(F.col(text_col)).withColumn(_LABEL, F.lit(0.0))
    return _pipeline(text_col, n_features, reg_param).fit(
        pos.unionByName(neg)
    )


def score_quality(
    model, df: DataFrame, text_col: str = "text",
    out_col: str = "quality_prob",
) -> DataFrame:
    """Append ``out_col`` = P(high quality | text) to ``df`` — the
    model's class-1 probability. One narrow JVM pass; no shuffle."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(df)
    return scored.withColumn(
        out_col, vector_to_array(F.col("probability"))[1]
    ).drop(_TOKENS, _TF, "rawPrediction", "probability", "prediction")


def filter_by_quality(
    model, df: DataFrame, threshold: float = 0.5,
    text_col: str = "text",
) -> DataFrame:
    """Keep documents the model scores at or above ``threshold`` —
    the curation filter itself (score column retained for auditing)."""
    return score_quality(model, df, text_col).filter(
        F.col("quality_prob") >= F.lit(threshold)
    )


def train_domain_classifier(
    labeled: DataFrame,
    text_col: str = "text",
    label_col: str = "domain",
    n_features: int = 1 << 18,
    reg_param: float = 0.01,
):
    """Multiclass twin of the quality classifier: fit a softmax
    LogisticRegression over the same hashed bag-of-words features to
    assign DOMAINS (web/code/academic/...) to unlabeled corpus
    documents — the upstream step of mixture balancing
    (``curation.domain_mix`` reweights once documents carry a domain).
    ``labeled`` provides (text, domain) examples; returns
    ``(pipeline_model, labels)`` where ``labels[i]`` is the domain
    string for predicted class ``i`` (StringIndexer order:
    frequency-desc, ties lexicographic — deterministic)."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF, RegexTokenizer, StringIndexer

    tok = RegexTokenizer(
        inputCol=text_col,
        outputCol=_TOKENS,
        pattern=r"\W+",
        toLowercase=True,
    )
    tf = HashingTF(
        inputCol=_TOKENS, outputCol=_TF, numFeatures=n_features
    )
    idx = StringIndexer(
        inputCol=label_col, outputCol=_LABEL, stringOrderType="frequencyDesc"
    )
    lr = LogisticRegression(
        featuresCol=_TF,
        labelCol=_LABEL,
        maxIter=60,
        regParam=reg_param,
        standardization=False,
        family="multinomial",
    )
    model = Pipeline(stages=[tok, tf, idx, lr]).fit(labeled)
    labels = list(model.stages[2].labels)
    return model, labels


def classify_domains(
    model, labels: list[str], df: DataFrame, text_col: str = "text",
    out_col: str = "domain", conf_col: str = "domain_conf",
) -> DataFrame:
    """Assign each document its predicted domain string and the
    model's confidence (max softmax probability). One shuffle-free
    transform pass, like :func:`score_quality`."""
    from pyspark.ml.functions import vector_to_array

    lab = F.array(*[F.lit(x) for x in labels])
    scored = model.transform(df)
    return (
        scored.withColumn(
            out_col, lab[F.col("prediction").cast("int")]
        )
        .withColumn(
            conf_col, F.array_max(vector_to_array(F.col("probability")))
        )
        .drop(_TOKENS, _TF, _LABEL, "rawPrediction", "probability",
              "prediction")
    )


def pareto_sample_by_quality(
    model, df: DataFrame, alpha: float = 9.0, seed: int = 0,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """GPT-3-style stochastic quality filter (public description:
    keep a document iff ``score > 1 - pareto_sample(alpha)``): instead
    of a hard threshold, low-scoring documents survive with small
    probability, preserving distributional diversity. The Pareto draw
    is a deterministic hash of the document id (same keep-set on any
    layout, rerun, or cluster — no RNG state)."""
    scored = score_quality(model, df, text_col)
    # u ~ Uniform(0,1] from a stable 64-bit hash; pareto = u^(-1/alpha)-1
    u = (
        (F.abs(F.xxhash64(F.col(id_col), F.lit(seed))) % F.lit(1_000_000))
        + F.lit(1)
    ) / F.lit(1_000_000.0)
    pareto = F.pow(u, F.lit(-1.0 / alpha)) - F.lit(1.0)
    return scored.filter(F.col("quality_prob") > F.lit(1.0) - pareto)
