"""Model-based quality classifier (operators/quality_model.py):
determinism, separation, and ranking agreement with an independent
numpy logistic regression trained on the exact same feature vectors."""

import numpy as np
import pytest

from swanlake_spark.operators import quality_model as QM


def _clean_docs():
    return [
        "the quick brown fox jumps over the lazy dog in the garden",
        "a well written paragraph contains clear sentences and ideas",
        "research shows that careful writing improves reader outcomes",
        "the committee published a detailed report on water quality",
        "students read books about history science and mathematics",
        "the museum opened a new exhibition of renaissance paintings",
    ]


def _garbage_docs():
    return [
        "zzxq zzxq zzxq zzxq zzxq zzxq zzxq zzxq",
        "click here buy now cheap cheap cheap !!!! $$$$",
        "asdf jkl qwerty uiop zxcv bnm asdf jkl",
        "aaaaaaa bbbbbbb ccccccc ddddddd eeeeeee",
        "lorem12 ip5um d0l0r 5it am3t c0n53ct3tur",
        "xx yy zz xx yy zz xx yy zz xx yy zz",
    ]


@pytest.fixture(scope="module")
def model_and_dfs(spark):
    pos = spark.createDataFrame(
        [(i, t) for i, t in enumerate(_clean_docs())],
        "doc_id int, text string",
    )
    neg = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(_garbage_docs())],
        "doc_id int, text string",
    )
    model = QM.train_quality_classifier(
        pos, neg, n_features=1 << 12, reg_param=0.01
    )
    return model, pos, neg


class TestQualityClassifier:
    def test_separates_clean_from_garbage(self, spark, model_and_dfs):
        model, pos, neg = model_and_dfs
        ps = [
            r.quality_prob for r in QM.score_quality(model, pos).collect()
        ]
        ns = [
            r.quality_prob for r in QM.score_quality(model, neg).collect()
        ]
        assert min(ps) > max(ns)
        assert min(ps) > 0.5 > max(ns)

    def test_training_is_deterministic(self, spark, model_and_dfs):
        model, pos, neg = model_and_dfs
        m2 = QM.train_quality_classifier(
            pos.repartition(5), neg.repartition(3),
            n_features=1 << 12, reg_param=0.01,
        )
        w1 = model.stages[-1].coefficients.toArray()
        w2 = m2.stages[-1].coefficients.toArray()
        assert np.allclose(w1, w2, atol=1e-6)

    def test_filter_keeps_clean_only(self, spark, model_and_dfs):
        model, pos, neg = model_and_dfs
        both = pos.unionByName(neg)
        kept = {r.doc_id for r in QM.filter_by_quality(model, both).collect()}
        assert kept == {r.doc_id for r in pos.collect()}

    def test_ranking_agrees_with_numpy_reference(self, spark, model_and_dfs):
        """An independent numpy gradient-descent logistic regression
        trained on the SAME hashed feature vectors must rank held-out
        documents the same way (identical order — both are linear
        models on one separable feature set)."""
        from pyspark.ml.functions import vector_to_array

        model, pos, neg = model_and_dfs
        # extract the exact features the pipeline builds
        feats = model.transform(pos.unionByName(neg)).select(
            "doc_id", vector_to_array(QM._TF).alias("f")
        )
        rows = feats.collect()
        ids = [r.doc_id for r in rows]
        X = np.array([r.f for r in rows])
        y = np.array([1.0 if i < 100 else 0.0 for i in ids])
        # plain batch gradient descent to convergence
        w = np.zeros(X.shape[1])
        b = 0.0
        for _ in range(4000):
            z = X @ w + b
            p = 1.0 / (1.0 + np.exp(-z))
            g = p - y
            w -= 0.5 * (X.T @ g / len(y) + 0.01 * w)
            b -= 0.5 * g.mean()
        held = spark.createDataFrame(
            [
                (0, "the quick committee published clear research books"),
                (1, "a detailed garden report on history and science"),
                (2, "zzxq asdf cheap cheap !!!! qwerty zz"),
                (3, "buy now cheap zzxq aaaaaaa bbbbbbb"),
            ],
            "doc_id int, text string",
        )
        sp = {
            r.doc_id: r.quality_prob
            for r in QM.score_quality(model, held).collect()
        }
        hf = model.transform(held).select(
            "doc_id", vector_to_array(QM._TF).alias("f")
        ).collect()
        np_scores = {
            r.doc_id: float(1.0 / (1.0 + np.exp(-(np.array(r.f) @ w + b))))
            for r in hf
        }
        spark_order = sorted(sp, key=sp.get)
        np_order = sorted(np_scores, key=np_scores.get)
        assert spark_order == np_order
        # and both agree on which side of 0.5 each held-out doc falls
        for d in sp:
            assert (sp[d] > 0.5) == (np_scores[d] > 0.5)

    def test_pareto_sampling_is_deterministic_and_lenient(
        self, spark, model_and_dfs
    ):
        model, pos, neg = model_and_dfs
        both = pos.unionByName(neg)
        k1 = {r.doc_id for r in
              QM.pareto_sample_by_quality(model, both, seed=1).collect()}
        k2 = {r.doc_id for r in
              QM.pareto_sample_by_quality(
                  model, both.repartition(7), seed=1
              ).collect()}
        assert k1 == k2  # layout-independent keep-set
        # stochastic by design (GPT-3 semantics: keep iff
        # score > 1 - pareto): high scorers survive with prob ≈
        # 1 - P(pareto < 1-score) — near-certain but NOT certain, and
        # garbage survives only on heavy-tail draws. Assert the
        # direction, not certainty.
        clean = {r.doc_id for r in pos.collect()}
        garbage = {r.doc_id for r in neg.collect()}
        assert len(clean & k1) >= len(clean) - 1
        assert len(garbage & k1) <= 2


class TestDomainClassifier:
    def _labeled(self, spark):
        rows = []
        web = ["click the subscribe button and share this post online",
               "breaking news update weather traffic and local events",
               "best recipes for quick dinner meals at home tonight"]
        code = ["def main args return int printf include std vector",
                "class object public static void function import module",
                "for loop index array pointer malloc free struct union"]
        acad = ["we propose a novel method and evaluate on benchmarks",
                "the theorem follows from lemma two by induction proof",
                "experimental results demonstrate significant improvements"]
        for i, t in enumerate(web):
            rows.append((i, t, "web"))
        for i, t in enumerate(code):
            rows.append((10 + i, t, "code"))
        for i, t in enumerate(acad):
            rows.append((20 + i, t, "academic"))
        return spark.createDataFrame(
            rows, "doc_id int, text string, domain string"
        )

    def test_assigns_held_out_docs_to_right_domain(self, spark):
        from swanlake_spark.operators import quality_model as QM

        labeled = self._labeled(spark)
        model, labels = QM.train_domain_classifier(
            labeled, n_features=1 << 12
        )
        assert sorted(labels) == ["academic", "code", "web"]
        held = spark.createDataFrame(
            [
                (0, "subscribe and share the news post", "web"),
                (1, "static void function with pointer array", "code"),
                (2, "we evaluate the proposed method on benchmarks",
                 "academic"),
            ],
            "doc_id int, text string, want string",
        )
        got = QM.classify_domains(model, labels, held)
        for r in got.collect():
            assert r.domain == r.want, (r.doc_id, r.domain, r.want)
            assert 0.0 <= r.domain_conf <= 1.0

    def test_training_deterministic_under_layout(self, spark):
        import numpy as np

        from swanlake_spark.operators import quality_model as QM

        labeled = self._labeled(spark)
        m1, l1 = QM.train_domain_classifier(labeled, n_features=1 << 12)
        m2, l2 = QM.train_domain_classifier(
            labeled.repartition(7), n_features=1 << 12
        )
        assert l1 == l2
        w1 = m1.stages[-1].coefficientMatrix.toArray()
        w2 = m2.stages[-1].coefficientMatrix.toArray()
        assert np.allclose(w1, w2, atol=1e-6)
