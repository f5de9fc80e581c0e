"""BPE tokenizer training (operators/tokenizer.py) verified against an
independent pure-Python reference implementation of classic BPE
(Sennrich et al. 2016): same word-frequency input → the merge sequence,
final segmentations, and document encodings must match exactly."""

import pytest

from swanlake_spark.operators import tokenizer


def _ref_bpe(word_freqs: dict[str, int], n_merges: int):
    """Straightforward single-node BPE: dict of word → symbol list,
    loop: count pairs, merge the (count DESC, pair ASC) winner."""
    words = {
        w: tuple(list(w) + [tokenizer.END]) for w in word_freqs
    }
    merges = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in words.items():
            f = word_freqs[w]
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] <= 1:
            break
        (a, b), _n = best
        merges.append((a, b))
        merged = {}
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            merged[w] = tuple(out)
        words = merged
    return merges, {w: list(s) for w, s in words.items()}


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "the cat sat on the mat"),
        (2, "the cat ate the rat"),
        (3, "a cat and a rat and a mat"),
        (4, "low lower lowest low low"),
        (5, "new newer newest new new newer"),
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


class TestTrainBpe:
    def test_merges_match_reference(self, spark, corpus):
        freqs = {
            r.word: r.freq
            for r in tokenizer.word_freqs(corpus).collect()
        }
        ref_merges, ref_segs = _ref_bpe(freqs, n_merges=12)
        merges, segmented = tokenizer.train_bpe(corpus, n_merges=12)
        assert merges == ref_merges
        got = {r.word: list(r.tokens) for r in segmented.collect()}
        assert got == ref_segs

    def test_training_is_deterministic(self, spark, corpus):
        m1, _ = tokenizer.train_bpe(corpus, n_merges=6)
        m2, _ = tokenizer.train_bpe(
            corpus.repartition(7), n_merges=6
        )  # layout must not matter
        assert m1 == m2

    def test_encode_reconstructs_word_order(self, spark, corpus):
        merges, segmented = tokenizer.train_bpe(corpus, n_merges=12)
        enc = tokenizer.encode(corpus, segmented)
        row = {r.doc_id: (list(r.tokens), r.n_tokens) for r in enc.collect()}
        # decoding: strip end markers → the original words in order
        for doc in corpus.collect():
            toks, n = row[doc.doc_id]
            assert n == len(toks)
            text = "".join(toks).replace(tokenizer.END, " ").strip()
            assert text == " ".join(doc.text.split())

    def test_encode_oov_falls_back_to_chars(self, spark, corpus):
        _, segmented = tokenizer.train_bpe(corpus, n_merges=4)
        oov = spark.createDataFrame(
            [(9, "zzz the")], "doc_id int, text string"
        )
        enc = tokenizer.encode(oov, segmented).collect()[0]
        toks = list(enc.tokens)
        # "zzz" never seen → char symbols; "the" seen → trained tokens
        assert toks[:4] == ["z", "z", "z", tokenizer.END]

    def test_sf_corpus_runs_and_counts(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
        merges, segmented = tokenizer.train_bpe(docs, n_merges=16)
        assert 1 <= len(merges) <= 16
        enc = tokenizer.encode(docs, segmented)
        agg = enc.agg({"n_tokens": "sum"}).collect()[0][0]
        assert agg > 0


class TestTrainBpeProperties:
    def test_random_corpora_match_reference(self, spark):
        """Property check: random corpora over a 2-letter alphabet
        (maximally merge-ambiguous — runs like 'aaaa' stress the greedy
        left-to-right fold and lexicographic tie-breaks) must reproduce
        the reference implementation exactly."""
        import random

        rng = random.Random(1234)
        for trial in range(6):
            words = [
                "".join(rng.choice("ab") for _ in range(rng.randint(1, 6)))
                for _ in range(rng.randint(4, 10))
            ]
            text_rows = [
                (i, " ".join(rng.choices(words, k=rng.randint(2, 8))))
                for i in range(4)
            ]
            corpus = spark.createDataFrame(
                text_rows, "doc_id int, text string"
            )
            freqs = {
                r.word: r.freq
                for r in tokenizer.word_freqs(corpus).collect()
            }
            ref_merges, ref_segs = _ref_bpe(freqs, n_merges=8)
            merges, segmented = tokenizer.train_bpe(corpus, n_merges=8)
            assert merges == ref_merges, (trial, words)
            got = {r.word: list(r.tokens) for r in segmented.collect()}
            assert got == ref_segs, (trial, words)


def _apply_merges(word_freqs: dict[str, int], merges):
    """Segment every word by applying an ordered merge list greedily
    left-to-right — the definition both trainers must agree with."""
    words = {w: tuple(list(w) + [tokenizer.END]) for w in word_freqs}
    for a, b in merges:
        merged = {}
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            merged[w] = tuple(out)
        words = merged
    return {w: list(s) for w, s in words.items()}


def _ref_bpe_batched(word_freqs: dict[str, int], n_merges: int, k: int):
    """Pure-Python batched BPE mirroring train_bpe(merge_batch=k):
    rank pairs (count DESC, pair ASC, count>1), greedily take up to k
    symbol-disjoint pairs, apply them in order, repeat."""
    words = {w: tuple(list(w) + [tokenizer.END]) for w in word_freqs}
    merges = []
    while len(merges) < n_merges:
        counts: dict[tuple[str, str], int] = {}
        for w, syms in words.items():
            f = word_freqs[w]
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + f
        ranked = sorted(
            ((a, b, n) for (a, b), n in counts.items() if n > 1),
            key=lambda t: (-t[2], t[0], t[1]),
        )
        batch = tokenizer.select_batch(ranked, min(k, n_merges - len(merges)))
        if not batch:
            break
        for a, b in batch:
            merges.append((a, b))
            merged = {}
            for w, syms in words.items():
                out, i = [], 0
                while i < len(syms):
                    if (
                        i + 1 < len(syms)
                        and syms[i] == a
                        and syms[i + 1] == b
                    ):
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                merged[w] = tuple(out)
            words = merged
    return merges, {w: list(s) for w, s in words.items()}


class TestBatchedMerges:
    """merge_batch > 1: up to K non-interacting merges per driver
    round-trip (the r4 verdict's batched-BPE ask). Selection and
    application must match an independent pure-Python batched
    reference, and segmentations must equal applying the returned
    merge list sequentially (equal merge lists → identical
    segmentations)."""

    def test_batched_matches_batched_reference(self, spark):
        rows = [
            (1, "the cat sat on the mat"),
            (2, "the cat ate the rat"),
            (3, "a cat and a rat and a mat"),
            (4, "low lower lowest low low"),
            (5, "new newer newest new new newer"),
        ]
        corpus = spark.createDataFrame(rows, "doc_id int, text string")
        freqs = {
            r.word: r.freq for r in tokenizer.word_freqs(corpus).collect()
        }
        for k in (2, 4, 8):
            ref_merges, ref_segs = _ref_bpe_batched(freqs, 12, k)
            merges, segmented = tokenizer.train_bpe(
                corpus, n_merges=12, merge_batch=k
            )
            assert merges == ref_merges, k
            got = {r.word: list(r.tokens) for r in segmented.collect()}
            assert got == ref_segs, k
            # equal merge lists → identical segmentations (the
            # sequential-application property)
            assert got == _apply_merges(freqs, merges), k

    def test_batched_random_corpora(self, spark):
        import random

        rng = random.Random(77)
        for trial in range(4):
            words = [
                "".join(rng.choice("abc") for _ in range(rng.randint(1, 6)))
                for _ in range(rng.randint(4, 12))
            ]
            text_rows = [
                (i, " ".join(rng.choices(words, k=rng.randint(2, 10))))
                for i in range(5)
            ]
            corpus = spark.createDataFrame(
                text_rows, "doc_id int, text string"
            )
            freqs = {
                r.word: r.freq
                for r in tokenizer.word_freqs(corpus).collect()
            }
            ref_merges, ref_segs = _ref_bpe_batched(freqs, 10, 4)
            merges, segmented = tokenizer.train_bpe(
                corpus, n_merges=10, merge_batch=4
            )
            assert merges == ref_merges, (trial, words)
            got = {r.word: list(r.tokens) for r in segmented.collect()}
            assert got == ref_segs, (trial, words)

    def test_batch_selection_is_disjoint(self):
        ranked = [
            ("a", "b", 10),
            ("b", "c", 9),    # shares b → skipped
            ("c", "d", 8),
            ("ab", "cd", 7),  # symbols equal selected CONCATS → skipped
            ("a", "d", 6),    # shares a and d → skipped
            ("e", "f", 5),
            ("g", "ef", 4),   # "ef" equals (e,f)'s concat → skipped
            ("x", "y", 3),
        ]
        assert tokenizer.select_batch(ranked, 5) == [
            ("a", "b"), ("c", "d"), ("e", "f"), ("x", "y"),
        ]


class TestOovEncodeWithMerges:
    def test_oov_words_get_true_bpe_segmentation(self, spark, corpus):
        """Unseen words at encode time must segment through the merge
        list exactly as the pure-Python reference applies it — not as
        character symbols."""
        merges, segmented = tokenizer.train_bpe(corpus, n_merges=12)
        unseen = spark.createDataFrame(
            [(100, "lowest newest catnap the thee")],
            "doc_id int, text string",
        )
        enc = tokenizer.encode(unseen, segmented, merges=merges)
        got = {r.doc_id: list(r.tokens) for r in enc.collect()}
        words = ["lowest", "newest", "catnap", "the", "thee"]
        ref = _apply_merges({w: 1 for w in words}, merges)
        expected = [t for w in words for t in ref[w]]
        assert got[100] == expected

    def test_char_fallback_unchanged_without_merges(self, spark, corpus):
        _, segmented = tokenizer.train_bpe(corpus, n_merges=6)
        unseen = spark.createDataFrame(
            [(1, "zqzq")], "doc_id int, text string"
        )
        enc = tokenizer.encode(unseen, segmented)
        assert list(enc.collect()[0].tokens) == ["z", "q", "z", "q",
                                                 tokenizer.END]

    def test_backtick_column_name_is_escaped(self, spark, corpus):
        """ADVICE r12: the SQL-text helpers splice column names into
        backtick quotes; a name CONTAINING a backtick must escape (by
        doubling) instead of producing a malformed/injected
        expression. segment_words passes its public word_col straight
        through, so drive it end-to-end with such a name."""
        merges, _ = tokenizer.train_bpe(corpus, n_merges=4)
        words = spark.createDataFrame([("aaab",), ("ba",)], "word string")
        plain = {
            r.word: list(r.tokens)
            for r in tokenizer.segment_words(words, merges).collect()
        }
        weird = words.withColumnRenamed("word", "wo`rd")
        got = {
            r["wo`rd"]: list(r.tokens)
            for r in tokenizer.segment_words(
                weird, merges, word_col="wo`rd"
            ).collect()
        }
        assert got == plain

    def test_group_merges_preserves_sequential_semantics(self, spark):
        """Grouped fused application over a merge list with
        INTERACTING consecutive merges (forcing group splits) equals
        sequential application."""
        rows = [(1, "aaab aab ab abb bb aabb")]
        corpus = spark.createDataFrame(rows, "doc_id int, text string")
        freqs = {
            r.word: r.freq for r in tokenizer.word_freqs(corpus).collect()
        }
        merges, _ = tokenizer.train_bpe(corpus, n_merges=8)
        # interacting list: groups must split (e.g. (a,b) then (ab,x))
        assert len(tokenizer.group_merges(merges)) > 1
        words = spark.createDataFrame(
            [("aaabbb",), ("abab",), ("ba",)], "word string"
        )
        got = {
            r.word: list(r.tokens)
            for r in tokenizer.segment_words(words, merges).collect()
        }
        ref = _apply_merges({w: 1 for w in ["aaabbb", "abab", "ba"]}, merges)
        assert got == ref


class TestBatchSelectionProperties:
    """Pure-Python invariants of select_batch / group_merges — the
    rules that make fused batch application exactly equal sequential
    application (hypothesis-driven)."""

    def test_select_batch_invariants(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        sym = st.text(alphabet="abc", min_size=1, max_size=3)
        ranked_strategy = st.lists(
            st.tuples(sym, sym, st.integers(min_value=2, max_value=99)),
            max_size=24,
        )

        @given(ranked_strategy, st.integers(min_value=1, max_value=8))
        @settings(max_examples=200, deadline=None)
        def prop(ranked, k):
            out = tokenizer.select_batch(ranked, k)
            assert len(out) <= k
            # subsequence of the ranked order
            pos = [-1]
            seq = [(a, b) for a, b, _ in ranked]
            for p in out:
                i = seq.index(p, pos[-1] + 1)
                pos.append(i)
            # pairwise conflict-free: no shared symbols, no
            # symbol-equals-concat in either direction
            for i in range(len(out)):
                for j in range(i + 1, len(out)):
                    a1, b1 = out[i]
                    a2, b2 = out[j]
                    assert {a1, b1}.isdisjoint({a2, b2})
                    assert a1 + b1 not in (a2, b2, a2 + b2)
                    assert a2 + b2 not in (a1, b1)

        prop()

    def test_group_merges_invariants(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        sym = st.text(alphabet="ab", min_size=1, max_size=2)

        @given(st.lists(st.tuples(sym, sym), max_size=20))
        @settings(max_examples=200, deadline=None)
        def prop(merges):
            groups = tokenizer.group_merges(merges)
            # concatenation reproduces the original ordered list
            assert [m for g in groups for m in g] == merges
            # every group internally passes the select_batch rule
            for g in groups:
                ranked = [(a, b, 2) for a, b in g]
                assert tokenizer.select_batch(ranked, len(g)) == g

        prop()
