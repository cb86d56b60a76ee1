"""Bigram LM perplexity (stages/lm.py): serial-reference parity,
hand-computed fixed-point values, parallelism invariance, edge cases.
The bit-exact DuckDB oracle for the wired query lives in
``__ray_entry__.py`` (``bigram_lm_perplexity``)."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pyarrow as pa

from deepseek_ocr_customvllm_ray.stages.lm import (
    LP_QUANTUM,
    bigram_lm_perplexity,
)


def _serial(texts, ids, alpha=0.5):
    """Pure-Python reference: add-alpha bigram LM trained on the corpus,
    scored per doc, fixed-point quantized like the engine."""
    docs = [
        (i, t.split())
        for i, t in zip(ids, texts)
        if t is not None and t.strip()
    ]
    uni = Counter(w for _i, ws in docs for w in ws)
    big = Counter(
        (ws[j], ws[j + 1])
        for _i, ws in docs
        for j in range(len(ws) - 1)
    )
    V = float(len(uni))
    out = {}
    for i, ws in docs:
        if len(ws) < 2:
            continue
        qs = []
        for j in range(len(ws) - 1):
            cb = big[(ws[j], ws[j + 1])]
            cu = uni[ws[j]]
            lp = math.log((cb + alpha) / (cu + alpha * V))
            qs.append(math.floor(lp * LP_QUANTUM + 0.5))
        out[i] = (len(qs), sum(qs))
    return out


def _run(texts, ids=None, parallelism=4):
    import ray.data as rd

    if ids is None:
        ids = list(range(len(texts)))
    t = pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    ds = rd.from_arrow(t).repartition(parallelism)
    df = bigram_lm_perplexity(ds, "text", "doc_id").to_pandas()
    return {
        int(r.doc_id): (int(r.n_bigrams), int(r.lp_q20))
        for r in df.itertuples(index=False)
    }


def test_matches_serial_reference(ray_session):
    import random

    rng = random.Random(11)
    vocab = ["the", "cat", "sat", "on", "mat", "dog", "ran", "far"]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 40)))
        for _ in range(150)
    ] + [None, "", "   ", "solo"]
    ids = list(range(len(texts)))
    assert _run(texts, ids) == _serial(texts, ids)


def test_hand_computed_tiny_corpus(ray_session):
    # corpus: "a b a", "a b" -> uni: a=3, b=2; big: (a,b)=2, (b,a)=1; V=2
    got = _run(["a b a", "a b"], ids=[7, 8], parallelism=2)
    V = 2.0
    lp_ab = math.log((2 + 0.5) / (3 + 0.5 * V))
    lp_ba = math.log((1 + 0.5) / (2 + 0.5 * V))
    q_ab = math.floor(lp_ab * LP_QUANTUM + 0.5)
    q_ba = math.floor(lp_ba * LP_QUANTUM + 0.5)
    assert got == {7: (2, q_ab + q_ba), 8: (1, q_ab)}


def test_parallelism_invariance(ray_session):
    import random

    rng = random.Random(3)
    vocab = ["x", "y", "z", "w"]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(2, 20)))
        for _ in range(80)
    ]
    assert _run(texts, parallelism=1) == _run(texts, parallelism=7)


def test_short_and_empty_docs_excluded(ray_session):
    got = _run(["only", "", None, "  ", "two words"], ids=[1, 2, 3, 4, 5])
    assert set(got) == {5}
    assert got[5][0] == 1


def test_heldout_reference_corpus(ray_session):
    """ref_ds training: unseen tokens/pairs score with count 0 (pure
    add-alpha mass), matching the serial formula with Counter defaults."""
    import ray.data as rd

    ref_texts = ["a b a b", "b a"]
    score_texts = ["a b c"]
    ref = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(ref_texts, pa.string()),
    }))
    tgt = rd.from_arrow(pa.table({
        "doc_id": pa.array([9], pa.int64()),
        "text": pa.array(score_texts, pa.string()),
    }))
    df = bigram_lm_perplexity(tgt, "text", "doc_id", ref_ds=ref).to_pandas()
    uni = Counter("a b a b".split() + "b a".split())
    big = Counter([("a", "b"), ("b", "a"), ("a", "b")])
    V = float(len(uni))
    q = 0
    for w1, w2 in [("a", "b"), ("b", "c")]:
        lp = math.log((big[(w1, w2)] + 0.5) / (uni[w1] + 0.5 * V))
        q += math.floor(lp * LP_QUANTUM + 0.5)
    assert df.iloc[0].n_bigrams == 2
    assert int(df.iloc[0].lp_q20) == q


def test_ppl_derivation_is_finite(ray_session):
    got = _run(["a a a a", "a b b a"])
    for n, s in got.values():
        ppl = np.exp(-((s / LP_QUANTUM) / n))
        assert np.isfinite(ppl) and ppl > 1.0

def test_ccnet_ppl_buckets_serial_parity(ray_session):
    """CCNet head/middle/tail: per-lang tertiles of mean log-prob via
    the quantile_disc rule (1-indexed rank ceil(p*n)), bucket rule
    mlp <= t1 -> tail, <= t2 -> middle, else head."""
    import random

    import ray.data as rd

    from deepseek_ocr_customvllm_ray.stages.lm import ccnet_ppl_buckets

    rng = random.Random(21)
    vocab = ["the", "cat", "sat", "on", "mat", "dog"]
    texts, langs = [], []
    for _ in range(120):
        texts.append(
            " ".join(rng.choice(vocab) for _ in range(rng.randint(2, 30))))
        langs.append(rng.choice(["en", "vi", "fr"]))
    # edge rows: null lang (dropped), empty text (dropped), 1-token doc
    texts += ["a b c", "", "solo"]
    langs += [None, "en", "en"]
    ids = list(range(len(texts)))

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
    })).repartition(5)
    df = ccnet_ppl_buckets(ds, "text", "doc_id", "lang").to_pandas()

    serial = _serial(texts, ids)
    lang_of = dict(zip(ids, langs))
    mlps = {
        i: s / n for i, (n, s) in serial.items() if lang_of[i] is not None
    }
    import math as m

    expect = {}
    for lg in {v for v in langs if v is not None}:
        vals = sorted(v for i, v in mlps.items() if lang_of[i] == lg)
        if not vals:
            continue
        t1 = vals[m.ceil(len(vals) / 3) - 1]
        t2 = vals[m.ceil(2 * len(vals) / 3) - 1]
        for i, v in mlps.items():
            if lang_of[i] != lg:
                continue
            expect[i] = "tail" if v <= t1 else ("middle" if v <= t2 else "head")

    got = {int(r.doc_id): r.bucket for r in df.itertuples(index=False)}
    assert got == expect
    # carried columns are intact
    assert set(df.columns) == {"doc_id", "lang", "n_bigrams", "lp_q20",
                               "bucket"}
    for r in df.itertuples(index=False):
        assert (int(r.n_bigrams), int(r.lp_q20)) == serial[int(r.doc_id)]
        assert r.lang == lang_of[int(r.doc_id)]


def test_sorted_probe_path_parity(ray_session, monkeypatch):
    """The large-vocabulary sorted searchsorted lookup must agree exactly
    with the small-vocabulary Arrow hash probe.  The scorer is driven
    DIRECTLY on the driver (a class-attribute monkeypatch would not
    propagate to Ray workers — module classes pickle by reference), with
    the threshold forced to 0 so every vocab takes the sorted path."""
    import random

    import ray.data as rd

    from deepseek_ocr_customvllm_ray.stages.lm import (
        BigramLmScorer,
        train_bigram_lm,
    )

    rng = random.Random(17)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 25)))
        for _ in range(100)
    ] + [None, "", "solo"]
    ids = list(range(len(texts)))
    want = _serial(texts, ids)

    t = pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    model_ref, V = train_bigram_lm(rd.from_arrow(t), "text")

    monkeypatch.setattr(BigramLmScorer, "SORTED_PROBE_MIN_VOCAB", 0)
    scorer = BigramLmScorer(model_ref, "text", "doc_id", V)
    assert all(kind == "sorted" for kind, _, _ in (scorer._uni, scorer._pair))
    out = scorer(t)
    got = {
        int(i): (int(n), int(s))
        for i, n, s in zip(out["doc_id"].to_pylist(),
                           out["n_bigrams"].to_pylist(),
                           out["lp_q20"].to_pylist())
    }
    assert got == want
