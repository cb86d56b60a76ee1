"""Hypothesis property tests for round-4 kernels whose contracts are
byte-level equivalences: fastjson vs json.dumps, the exact n-gram
precheck vs the sequential walk, split assignment totality, and the
vectorized quality/langid/fingerprint kernels vs their serial twins."""

from __future__ import annotations

import json

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

# --- fastjson ---------------------------------------------------------------

json_scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(10**18), max_value=10**18),
    st.floats(allow_nan=False, allow_infinity=False),
    st.text(max_size=40),
)
json_values = st.recursive(
    json_scalars,
    lambda children: st.one_of(
        st.lists(children, max_size=4),
        st.dictionaries(st.text(max_size=10), children, max_size=4),
    ),
    max_leaves=25,
)


@settings(max_examples=300, deadline=None)
@given(json_values)
def test_fastjson_byte_identical(obj):
    from deepseek_ocr_customvllm_ray.functions.fastjson import dumps_indent2

    assert dumps_indent2(obj) == json.dumps(obj, ensure_ascii=False, indent=2)


# --- n-gram precheck exactness ----------------------------------------------

token_streams = st.lists(
    st.sampled_from(["a", "b", "c", "<td>", "</td>"]), min_size=0, max_size=120
)


@settings(max_examples=300, deadline=None)
@given(
    tokens=token_streams,
    ngram=st.integers(min_value=2, max_value=6),
    window=st.integers(min_value=2, max_value=30),
)
def test_precheck_flags_exactly_the_streams_the_walk_edits(tokens, ngram, window):
    from deepseek_ocr_customvllm_ray.functions.ngram import (
        _has_potential_repeat,
        suppress_repeats,
    )

    wl = frozenset({"<td>", "</td>"})
    flagged = _has_potential_repeat(tokens, ngram, window, wl)
    changed = suppress_repeats(tokens, ngram, window, wl) != list(tokens)
    # one-sided exactness: unflagged MUST be identity; with a 5-symbol
    # alphabet hash collisions are absent, so flagged == changed here
    assert flagged == changed, (tokens, ngram, window)


# --- split assignment totality ----------------------------------------------


@settings(max_examples=100, deadline=None)
@given(
    ids=st.lists(st.integers(min_value=0, max_value=10**9), min_size=1,
                 max_size=50, unique=True),
    w=st.floats(min_value=0.05, max_value=0.95),
)
def test_split_assignment_total_and_stable(ids, w):
    from deepseek_ocr_customvllm_ray.stages.sampling import (
        make_split_assign_batch,
    )

    splits = {"train": w, "rest": 1.0 - w}
    t = pa.table({"doc_id": pa.array(ids, pa.int64())})
    out = make_split_assign_batch("doc_id", splits)(t)
    vals = out["split"].to_pylist()
    assert all(v in splits for v in vals)
    # stability: re-running assigns identically
    assert make_split_assign_batch("doc_id", splits)(t)["split"].to_pylist() == vals


# --- vectorized analysis kernels vs serial twins ------------------------------

texts_strategy = st.lists(
    st.one_of(
        st.none(),
        st.text(
            alphabet=st.characters(
                codec="utf-8", exclude_categories=("Cs",)
            ),
            max_size=80,
        ),
    ),
    min_size=1,
    max_size=12,
)


@settings(max_examples=150, deadline=None)
@given(texts_strategy)
def test_vectorized_kernels_match_serial_on_arbitrary_unicode(texts):
    from deepseek_ocr_customvllm_ray.functions import textstats as ts
    from deepseek_ocr_customvllm_ray.stages import analysis

    batch = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    q = analysis.make_quality_batch("text", "doc_id")(batch)
    li = analysis.make_langid_batch("text", "doc_id")(batch)
    fp = analysis.make_fingerprint_batch("text", "doc_id")(batch)
    for i, t in enumerate(texts):
        f = ts.quality_features(t or "")
        for k in ("n_chars", "n_tokens", "mean_token_len", "punct_ratio",
                  "stopword_ratio", "digit_ratio"):
            assert q[k][i].as_py() == f[k], (repr(t), k)
        assert li["pred_lang"][i].as_py() == ts.detect_language(t or ""), repr(t)
        assert fp["fingerprint"][i].as_py() == ts.doc_fingerprint(t or ""), repr(t)
