"""Unicode normalization + context-window chunking units."""

import pyarrow as pa
import pytest

from deepseek_ocr_customvllm_ray.stages.chunking import chunk_documents, make_chunk_batch
from deepseek_ocr_customvllm_ray.stages.normalize import normalize_texts


class TestNormalize:
    def test_composed_and_decomposed_converge(self):
        out = normalize_texts(pa.array(["Caf\xe9", "Café"])).to_pylist()
        assert out[0] == out[1] == "Caf\xe9"  # NFC = composed form

    def test_control_strip_ws_collapse_trim(self):
        out = normalize_texts(pa.array(["  a\x07b \t\n c\x00d  "])).to_pylist()
        assert out == ["ab cd"]  # controls vanish (no space left behind)

    def test_tab_cr_survive_as_whitespace(self):
        # TAB..CR are whitespace, not stripped controls: they collapse to
        # one space instead of vanishing
        assert normalize_texts(pa.array(["a\tb", "a\x07b"])).to_pylist() == ["a b", "ab"]

    def test_null_propagates(self):
        assert normalize_texts(pa.array([None, "x"], pa.string())).to_pylist() == [None, "x"]

    def test_nfkc_folds_compatibility_chars(self):
        out = normalize_texts(pa.array(["ＡＢ c"]), form="NFKC").to_pylist()
        assert out == ["AB c"]  # fullwidth A/B fold under NFKC, not NFC
        assert normalize_texts(pa.array(["ＡＢ c"])).to_pylist() == ["ＡＢ c"]

    def test_pure_ascii_unchanged(self):
        a = pa.array(["plain text here"])
        assert normalize_texts(a).to_pylist() == ["plain text here"]


def _serial_chunks(texts, ids, chunk, overlap):
    stride = chunk - overlap
    out = []
    for did, t in zip(ids, texts):
        toks = (t or "").split()
        if not toks:
            continue
        m = (max(len(toks) - overlap, 1) + stride - 1) // stride
        for j in range(m):
            c = toks[j * stride : j * stride + chunk]
            out.append((did, j, len(c), " ".join(c)))
    return out


class TestChunking:
    def _mixed_corpus(self):
        import random

        rng = random.Random(0)
        texts, ids = [], []
        for i in range(60):
            n = rng.choice([0, 1, 2, 3, 5, 7, 8, 9, 15, 40, 100])
            texts.append(
                " ".join(f"t{i}_{k}" for k in range(n))
                if n
                else rng.choice(["", "   ", None])
            )
            ids.append(i)
        return ids, texts

    @pytest.mark.parametrize("chunk,overlap", [(8, 0), (8, 2), (8, 7), (128, 16), (2, 1)])
    def test_matches_serial_reference(self, chunk, overlap):
        ids, texts = self._mixed_corpus()
        fn = make_chunk_batch("text", "doc_id", chunk, overlap)
        b = pa.table(
            {"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts, pa.string())}
        )
        got = [tuple(r.values()) for r in fn(b).to_pylist()]
        assert got == _serial_chunks(texts, ids, chunk, overlap)

    def test_every_token_covered_and_strides_align(self):
        ids, texts = self._mixed_corpus()
        fn = make_chunk_batch("text", "doc_id", 8, 2)
        b = pa.table(
            {"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts, pa.string())}
        )
        rows = fn(b).to_pylist()
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r["doc_id"], []).append(r)
        for did, rs in by_doc.items():
            toks = texts[did].split()
            covered = []
            for r in sorted(rs, key=lambda x: x["chunk_id"]):
                s = r["chunk_id"] * 6
                assert r["chunk_text"].split() == toks[s : s + 8]
                covered.extend(toks[s : s + 8])
            assert set(covered) == set(toks)

    def test_empty_and_all_blank_batches_keep_schema(self):
        fn = make_chunk_batch("text", "doc_id", 8, 2)
        empty = pa.table(
            {"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())}
        )
        blank = pa.table(
            {"doc_id": pa.array([1, 2], pa.int64()), "text": pa.array(["", None], pa.string())}
        )
        for b in (empty, blank):
            out = fn(b)
            assert out.num_rows == 0
            assert out.schema.names == ["doc_id", "chunk_id", "n_chunk_tokens", "chunk_text"]

    def test_overlap_validation(self):
        with pytest.raises(ValueError):
            make_chunk_batch("text", "doc_id", 8, 8)
        with pytest.raises(ValueError):
            make_chunk_batch("text", "doc_id", 8, -1)

    def test_dataset_wrapper(self, ray_session):
        import ray.data as rd

        ds = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([1, 2], pa.int64()),
                    "text": pa.array(["a b c d e", ""], pa.string()),
                }
            )
        ).repartition(2)
        out = chunk_documents(ds, "text", "doc_id", chunk_tokens=3, overlap=1).to_pandas()
        got = sorted(map(tuple, out.itertuples(index=False, name=None)))
        assert got == [(1, 0, 3, "a b c"), (1, 1, 3, "c d e")]


class TestDocTopTerms:
    """document_frequencies + doc_top_terms (rational tf/df ranking)."""

    def _ds(self, texts):
        import ray.data as rd

        return rd.from_arrow(pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        })).repartition(3)

    def test_document_frequencies_dedupe_within_doc(self, ray_session):
        from deepseek_ocr_customvllm_ray.stages.analysis import document_frequencies

        # 'a' twice in doc0 still counts df=1 for doc0
        out = document_frequencies(self._ds(["a a b", "a c", "", None]), "text").to_pandas()
        got = dict(zip(out["token"], out["df"]))
        assert got == {"a": 2, "b": 1, "c": 1}

    def test_hand_computed_ranking(self, ray_session):
        from deepseek_ocr_customvllm_ray.stages.analysis import doc_top_terms

        # doc0: rare appears twice (tf=2, df=1 -> 2.0), common once
        # (tf=1, df=3 -> 1/3); doc1/doc2 share 'common'
        out = doc_top_terms(
            self._ds(["rare rare common", "common x", "common y"]),
            "text", "doc_id", k=2,
        ).to_pandas().sort_values(["doc_id", "rank"]).reset_index(drop=True)
        d0 = out[out["doc_id"] == 0]
        assert list(d0["token"]) == ["rare", "common"]
        assert list(d0["tf"]) == [2, 1] and list(d0["df"]) == [1, 3]
        assert list(d0["rank"]) == [1, 2]
        # doc1: x (1/1) beats common (1/3)
        d1 = out[out["doc_id"] == 1]
        assert list(d1["token"]) == ["x", "common"]

    def test_tie_breaks_on_token(self, ray_session):
        from deepseek_ocr_customvllm_ray.stages.analysis import doc_top_terms

        # both tokens unique to the doc: equal score 1.0 -> lexicographic
        out = doc_top_terms(self._ds(["zeta alpha"]), "text", "doc_id", k=2).to_pandas()
        out = out.sort_values("rank")
        assert list(out["token"]) == ["alpha", "zeta"]

    def test_k_bounds_rows_and_empty_docs_vanish(self, ray_session):
        from deepseek_ocr_customvllm_ray.stages.analysis import doc_top_terms

        out = doc_top_terms(
            self._ds(["a b c d e f", "", None, "   "]), "text", "doc_id", k=3
        ).to_pandas()
        assert sorted(out["doc_id"].unique()) == [0]
        assert len(out) == 3 and sorted(out["rank"]) == [1, 2, 3]
