"""Text-analysis family: token counts, quality, langid, fingerprints."""

import pyarrow as pa

from deepseek_ocr_customvllm_ray.functions import textstats as ts
from deepseek_ocr_customvllm_ray.stages import analysis


class TestKernels:
    def test_whitespace_tokens(self):
        assert ts.whitespace_token_count("a b  c") == 3
        assert ts.whitespace_token_count("") == 0

    def test_bpe_tokens(self):
        assert ts.bpe_token_count("Hello, world!") >= 3

    def test_quality_features(self):
        f = ts.quality_features("The cat sat on the mat.")
        assert f["n_tokens"] == 6
        assert f["stopword_ratio"] > 0.2
        assert 0 < f["punct_ratio"] < 0.1
        assert ts.quality_features("")["n_tokens"] == 0

    def test_langid(self):
        assert ts.detect_language("the cat is on the mat and it is happy") == "en"
        assert ts.detect_language("le chat est sur la table et il est content") == "fr"
        assert ts.detect_language("el gato es feliz y la casa es grande") == "es"
        assert ts.detect_language("der hund und die katze sind mit den kindern") == "de"
        assert ts.detect_language("đây là một văn bản tiếng việt của người dùng") == "vi"
        assert ts.detect_language("这是一个中文文本") == "zh"
        assert ts.detect_language("") == "und"
        assert ts.detect_language("xyzzy plugh") == "und"

    def test_fingerprint_deterministic_and_order_sensitive(self):
        assert ts.doc_fingerprint("a b c") == ts.doc_fingerprint("a b c")
        assert ts.doc_fingerprint("a b c") != ts.doc_fingerprint("c b a")
        assert 0 <= ts.doc_fingerprint("x") < 2 ** 63


class TestStages:
    def test_token_count_batch(self, ray_session):
        import ray.data as rd

        t = pa.table({"doc_id": [1, 2, 3], "text": ["a b c", "", "one two"]})
        out = (
            rd.from_arrow(t)
            .map_batches(analysis.make_token_count_batch("text", "doc_id"), batch_format="pyarrow")
            .to_pandas()
            .sort_values("doc_id")
        )
        assert out["n_tokens"].tolist() == [3, 0, 2]

    def test_quality_batch(self, ray_session):
        import ray.data as rd

        t = pa.table({"doc_id": [1], "text": ["The quick, brown fox."]})
        out = (
            rd.from_arrow(t)
            .map_batches(analysis.make_quality_batch("text", "doc_id"), batch_format="pyarrow")
            .to_pandas()
        )
        assert out["n_tokens"].iloc[0] == 4
        assert out["n_chars"].iloc[0] == 21

    def test_langid_batch(self, ray_session):
        import ray.data as rd

        t = pa.table({"doc_id": [1, 2], "text": ["the cat is on the mat", "这是中文"]})
        out = (
            rd.from_arrow(t)
            .map_batches(analysis.make_langid_batch("text", "doc_id"), batch_format="pyarrow")
            .to_pandas()
            .sort_values("doc_id")
        )
        assert out["pred_lang"].tolist() == ["en", "zh"]


class TestBpeTokenCounts:
    def test_kernel_counts(self):
        from deepseek_ocr_customvllm_ray.functions.textstats import bpe_token_count

        assert bpe_token_count("") == 0
        # GPT-2 pre-tokenizer: contraction split + leading-space words
        assert bpe_token_count("I'll go") == 3   # ["I", "'ll", " go"]
        assert bpe_token_count("hello, world") == 3  # ["hello", ",", " world"]

    def test_stage(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from deepseek_ocr_customvllm_ray.stages.analysis import (
            make_bpe_token_count_batch,
        )

        t = pa.table({"doc_id": [1, 2], "text": ["I'll go", ""]})
        out = (
            rd.from_arrow(t)
            .map_batches(make_bpe_token_count_batch("text", "doc_id"), batch_format="pyarrow")
            .to_pandas()
            .sort_values("doc_id")
        )
        assert out["n_bpe_tokens"].tolist() == [3, 0]


def test_token_diversity_counts():
    import pyarrow as pa

    from deepseek_ocr_customvllm_ray.stages.analysis import (
        make_token_diversity_batch,
    )

    out = make_token_diversity_batch("text", "doc_id")(
        pa.table({
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(["a b a b a", "x y z", "   ", None], pa.string()),
        })
    )
    # empty and null texts are dropped (oracle's unnest emits no row)
    assert out["doc_id"].to_pylist() == [0, 1]
    assert out["n_tokens"].to_pylist() == [5, 3]
    assert out["n_distinct_tokens"].to_pylist() == [2, 3]


class TestRepetitionStats:
    """Gopher-style repetition signals (stages/analysis.py)."""

    @staticmethod
    def _stats(texts):
        from deepseek_ocr_customvllm_ray.stages.analysis import (
            make_repetition_stats_batch,
        )

        return make_repetition_stats_batch("text", "doc_id")(pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }))

    def test_hand_computed(self):
        out = self._stats([
            "a b a b a",      # bigrams: ab ba ab ba -> 4 total, 2 distinct; top a=3
            "x y z",          # 2 bigrams, 2 distinct, top 1
            "w",              # no bigrams
        ])
        assert out["n_words"].to_pylist() == [5, 3, 1]
        assert out["n_bigrams"].to_pylist() == [4, 2, 0]
        assert out["n_distinct_bigrams"].to_pylist() == [2, 2, 0]
        assert out["top_word_n"].to_pylist() == [3, 1, 1]

    def test_null_and_blank_dropped(self):
        out = self._stats([None, "", "  ", "ok fine"])
        assert out["doc_id"].to_pylist() == [3]

    def test_serial_parity_randomized(self):
        from collections import Counter
        import random

        rng = random.Random(11)
        texts = [
            " ".join(rng.choice(["a", "b", "cc", "d"]) for _ in range(rng.randint(1, 25)))
            for _ in range(150)
        ]
        out = self._stats(texts)
        got = {
            r["doc_id"]: (r["n_words"], r["n_bigrams"],
                          r["n_distinct_bigrams"], r["top_word_n"])
            for r in out.to_pylist()
        }
        for i, t in enumerate(texts):
            w = t.split()
            bg = list(zip(w, w[1:]))
            assert got[i] == (len(w), len(bg), len(set(bg)),
                              max(Counter(w).values())), i

    def test_repetition_filter_thresholds(self, ray_session):
        import ray.data as rd

        from deepseek_ocr_customvllm_ray.stages.analysis import repetition_filter

        t = pa.table({
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array([
                "spam spam spam spam spam spam",      # top-word + dup bigrams
                "clean prose with many different words here",
                "tiny",
            ], pa.string()),
        })
        out = repetition_filter(
            rd.from_arrow(t), "text", "doc_id",
            max_dup_bigram_frac=0.2, max_top_word_frac=0.5, min_words=2,
        ).to_pandas()
        assert sorted(out["doc_id"]) == [1]


class TestVectorizedParity:
    """The vectorized quality/langid/fingerprint kernels must reproduce the
    serial ``functions/textstats.py`` references EXACTLY — over the driver
    corpus and over adversarial unicode edge cases (exotic whitespace,
    accented words, CJK, digits beyond ASCII)."""

    EDGE_TEXTS = [
        None, "", "   ", "\t\n\x0b\x1c\x85\xa0 　",
        "one two two THE the of!",
        "l'été où ça? déjà-vu: 42,7% élève",      # fr accents + punct
        "der die das und zu den",                  # de stopwords
        "和平与发展 the of",                        # CJK fast path
        "a b c d",                  # nbsp/LS/PS separators
        "x " * 600 + "le la les de des et un",     # >500-word langid cap
        "１２３ 123 ٣٤٥",                           # fullwidth + arabic-indic Nd
        "word",
        "...!!!,,,",
        "Và của là có cho một ngườI đƯợc",         # vi + mixed case
    ]

    def _corpus_texts(self):
        import os
        import pyarrow.parquet as pq

        p = "/root/testdata/sf0.01/documents.parquet"
        if not os.path.exists(p):
            return []
        return pq.read_table(p, columns=["text"])["text"].to_pylist()

    def _table(self, texts):
        return pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        })

    def test_quality_batch_matches_serial(self):
        texts = self.EDGE_TEXTS + self._corpus_texts()
        out = analysis.make_quality_batch("text", "doc_id")(self._table(texts))
        for i, t in enumerate(texts):
            f = ts.quality_features(t or "")
            for k in ("n_chars", "n_tokens", "mean_token_len", "punct_ratio",
                      "stopword_ratio", "digit_ratio"):
                got = out[k][i].as_py()
                assert got == f[k], (i, k, got, f[k], (t or "")[:80])

    def test_langid_batch_matches_serial(self):
        texts = self.EDGE_TEXTS + self._corpus_texts()
        out = analysis.make_langid_batch("text", "doc_id")(self._table(texts))
        got = out["pred_lang"].to_pylist()
        want = [ts.detect_language(t or "") for t in texts]
        assert got == want

    def test_fingerprint_batch_matches_serial(self):
        texts = self.EDGE_TEXTS + self._corpus_texts()
        out = analysis.make_fingerprint_batch("text", "doc_id")(self._table(texts))
        got = out["fingerprint"].to_pylist()
        want = [ts.doc_fingerprint(t or "") for t in texts]
        assert got == want


def test_utf8proc_whitespace_kernels_match_python_split():
    """The split/trim kernels the vectorized stages rely on must agree with
    str.split()/str.strip() on EVERY Unicode whitespace character (and not
    split on lookalikes like ZWSP/BOM/Mongolian vowel separator)."""
    import pyarrow.compute as pc

    ws = [chr(c) for c in range(0x110000) if chr(c).isspace()]
    lookalikes = [chr(c) for c in (0x180E, 0x200B, 0xFEFF)]
    probes = ws + lookalikes
    arr = pa.array([f"a{c}b" for c in probes])
    got = pc.utf8_split_whitespace(arr).to_pylist()
    want = [f"a{c}b".split() for c in probes]
    assert got == want
    trimmed = pc.utf8_trim_whitespace(pa.array([f"{c}x{c}" for c in probes]))
    assert trimmed.to_pylist() == [f"{c}x{c}".strip() for c in probes]


def test_py_word_class_equivalence_sweep():
    """The punct class builds on `isalnum() or '_'` as the word-char
    predicate; pin its equivalence to Python re's \\w over all of Unicode
    (the guarantee the vectorized punct_ratio rests on)."""
    import re

    w = re.compile(r"\w", re.UNICODE)
    # full sweep is ~0.6 s; sample densely around class boundaries instead
    probes = list(range(0, 0x3000)) + list(range(0x1D400, 0x1D800)) + [
        0x00B2, 0x00BC, 0x2070, 0x2460, 0x3007, 0x31350, 0x10FFFF,
    ]
    for c in probes:
        ch = chr(c)
        assert bool(w.match(ch)) == (ch.isalnum() or ch == "_"), hex(c)


class TestBigramFrequencies:
    def _run(self, texts, top_k=None):
        import ray.data as rd

        ds = rd.from_arrow(pa.table({"text": pa.array(texts, pa.string())}))
        df = analysis.bigram_frequencies(ds, "text", top_k=top_k).to_pandas()
        return {r.pair: int(r.n) for r in df.itertuples(index=False)}

    def test_hand_computed(self, ray_session):
        got = self._run([
            "a b a b c",        # "a b" x2, "b a", "b c"
            "x",                # single token: no bigram
            None,               # null: nothing
            "",                 # empty: nothing
            "  a   b  ",        # trim + multi-space split: one "a b"
        ])
        assert got == {"a b": 3, "b a": 1, "b c": 1}

    def test_pairs_do_not_cross_documents(self, ray_session):
        """The last token of one doc never pairs with the first of the
        next, regardless of batch layout."""
        got = self._run(["p q", "q r"])
        assert got == {"p q": 1, "q r": 1}

    def test_top_k_order_is_deterministic(self, ray_session):
        import ray.data as rd

        texts = ["m n m n", "z z z", "a a"]  # m n:2, n m:1, z z:2, a a:1
        ds = rd.from_arrow(pa.table({"text": pa.array(texts, pa.string())}))
        df = analysis.bigram_frequencies(ds, "text", top_k=3).to_pandas()
        assert list(df.pair) == ["m n", "z z", "a a"]  # n desc, pair asc
        assert list(df.n) == [2, 2, 1]


class TestCompressionStats:
    def _run(self, texts):
        import ray.data as rd

        t = pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        })
        fn = analysis.make_compression_stats_batch("text", "doc_id")
        return fn(t)

    def test_repetitive_compresses_better_than_random(self, ray_session):
        import random

        rng = random.Random(1)
        rand = "".join(rng.choice("abcdefghij ") for _ in range(2000))
        rep = "spam boilerplate " * 125  # same 2000ish bytes, repetitive
        out = self._run([rand, rep])
        nb = out["n_bytes"].to_pylist()
        nz = out["n_zlib"].to_pylist()
        assert nz[1] / nb[1] < nz[0] / nb[0] / 2  # template << random

    def test_null_and_empty(self, ray_session):
        out = self._run([None, ""])
        assert out["n_bytes"].to_pylist() == [0, 0]
        z = out["n_zlib"].to_pylist()
        assert z[0] == z[1] > 0  # zlib header bytes, deterministic

    def test_deterministic(self, ray_session):
        a = self._run(["hello world " * 10])
        b = self._run(["hello world " * 10])
        assert a == b


class TestTokenEntropy:
    def _run(self, texts):
        t = pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        })
        return analysis.make_token_entropy_batch("text", "doc_id")(t)

    def test_hand_computed(self):
        import math

        out = self._run(["a a b"])
        assert out["n_tokens"].to_pylist() == [3]
        q = math.floor(2 * math.log(2.0) * 1048576.0 + 0.5)  # c=2 term; ln(1)=0
        assert out["clnc_q20"].to_pylist() == [q]
        ln3_q = math.floor(math.log(3.0) * 1048576.0 + 0.5)
        assert out["entropy"].to_pylist() == [(ln3_q - q / 3.0) / 1048576.0]

    def test_uniform_vs_repetitive(self):
        out = self._run(["a b c d e f g h", "x x x x x x x x"])
        ent = out["entropy"].to_pylist()
        assert ent[0] > 2.0  # ln(8) ~ 2.08, all distinct
        assert abs(ent[1]) < 1e-5  # single repeated token -> ~0

    def test_empty_and_null_dropped(self):
        out = self._run(["", None, "one two"])
        assert out["doc_id"].to_pylist() == [2]

    def test_batch_split_invariance(self):
        texts = [f"w{i % 5} common w{i % 3}" for i in range(40)]
        whole = self._run(texts)
        parts = [self._run(texts[:13]), self._run(texts[13:])]
        merged = pa.concat_tables([
            parts[0],
            parts[1].set_column(
                0, "doc_id",
                pa.array([i + 13 for i in parts[1]["doc_id"].to_pylist()],
                         pa.int64()),
            ),
        ])
        assert whole.equals(merged)


class TestSentenceStats:
    def _run(self, texts):
        t = pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        })
        return analysis.make_sentence_stats_batch("text", "doc_id")(t)

    def test_hand_computed(self):
        out = self._run(["One. Two! Three? Four"])
        assert out["n_sentences"].to_pylist() == [4]
        assert out["sum_sent_chars"].to_pylist() == [len("One") + 3 + 5 + 4]

    def test_trailing_punct_and_empty(self):
        out = self._run(["Trail. ", "", "NoPunct"])
        assert out["n_sentences"].to_pylist() == [1, 0, 1]
        assert out["sum_sent_chars"].to_pylist() == [5, 0, 7]

    def test_null_dropped(self):
        out = self._run([None, "A. B"])
        assert out["doc_id"].to_pylist() == [1]
        assert out["n_sentences"].to_pylist() == [2]

    def test_abbreviation_not_split(self):
        # no whitespace after the dot -> not a boundary (A.B stays one)
        out = self._run(["A.B stays"])
        assert out["n_sentences"].to_pylist() == [1]
