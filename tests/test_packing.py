"""Sequence packing (stages/packing.py) — greedy semantics, serial-reference
parity, and parallelism invariance."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from deepseek_ocr_customvllm_ray.stages.packing import (
    _SEQ_STRIDE,
    pack_greedy,
    pack_sequences,
)


def _greedy(ids, toks, mx):
    return pack_greedy(np.asarray(ids, np.int64), np.asarray(toks, np.int64), mx)


def test_greedy_basic_fill():
    # 40+50=90; +20 would be 110 > 100 -> close; 20+100=120 > 100 -> close
    seqs = _greedy([1, 2, 3, 4], [40, 50, 20, 100], 100)
    assert seqs == [([1, 2], 90, False), ([3], 20, False), ([4], 100, False)]


def test_greedy_exact_fit_stays():
    """cur + t == max_tokens does NOT overflow (strict > comparison)."""
    seqs = _greedy([1, 2], [60, 40], 100)
    assert seqs == [([1, 2], 100, False)]


def test_greedy_oversized_doc():
    """An oversized doc closes the open sequence, ships alone flagged
    truncated, and packing continues after it."""
    seqs = _greedy([1, 2, 3], [10, 500, 10], 100)
    assert seqs == [([1], 10, False), ([2], 500, True), ([3], 10, False)]


def test_greedy_leading_oversized_and_empty():
    assert _greedy([9], [300], 100) == [([9], 300, True)]
    assert _greedy([], [], 100) == []


def _corpus(n=300, seed=7):
    rng = np.random.default_rng(seed)
    words = ["alpha", "beta", "gamma", "delta"]
    texts = [
        " ".join(rng.choice(words, size=int(k)))
        for k in rng.integers(5, 120, size=n)
    ]
    # a couple of oversized docs to exercise the truncated path
    texts[10] = " ".join(["big"] * 400)
    texts[200] = " ".join(["big"] * 999)
    return pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })


def _serial_reference(table, max_tokens, range_size):
    """Driver-side reference: group by id range, pack each range in doc_id
    order with the same greedy kernel."""
    ids = np.asarray(table["doc_id"].to_pylist(), np.int64)
    toks = np.asarray(
        [len(t.split()) if t.strip() else 0 for t in table["text"].to_pylist()],
        np.int64,
    )
    order = np.argsort(ids)
    ids, toks = ids[order], toks[order]
    rows = []
    for rng_id in np.unique(ids // range_size):
        m = (ids // range_size) == rng_id
        for i, (sids, tot, trunc) in enumerate(
            pack_greedy(ids[m], toks[m], max_tokens)
        ):
            rows.append((
                int(rng_id) * _SEQ_STRIDE + i,
                ",".join(map(str, sids)), len(sids), tot, trunc,
            ))
    return sorted(rows)


def _as_rows(df):
    return sorted(
        (int(r.seq_id), r.doc_ids, int(r.n_docs), int(r.total_tokens),
         bool(r.truncated))
        for r in df.itertuples(index=False)
    )


def test_distributed_matches_serial_reference(ray_session):
    import ray.data as rd

    t = _corpus()
    got = _as_rows(
        pack_sequences(
            rd.from_arrow(t), max_tokens=128, range_size=50, num_partitions=4
        ).to_pandas()
    )
    want = _serial_reference(t, max_tokens=128, range_size=50)
    assert got == want
    assert any(r[4] for r in got)  # truncated path exercised


def test_parallelism_invariance(ray_session):
    """Block structure must not change the packing (the id-range assignment
    is a pure function of the row)."""
    import ray.data as rd

    t = _corpus(seed=11)
    base = _as_rows(
        pack_sequences(
            rd.from_arrow(t), max_tokens=96, range_size=40, num_partitions=3
        ).to_pandas()
    )
    # different block structure AND different shuffle width
    perm = np.random.default_rng(0).permutation(t.num_rows)
    reshaped = rd.from_arrow(t.take(pa.array(perm))).repartition(13)
    again = _as_rows(
        pack_sequences(
            reshaped, max_tokens=96, range_size=40, num_partitions=7
        ).to_pandas()
    )
    assert base == again


def test_range_size_beyond_stride_rejected():
    import pytest

    with pytest.raises(ValueError):
        pack_sequences(None, range_size=_SEQ_STRIDE + 1)


def test_null_and_empty_text_pack_as_zero_tokens(ray_session):
    import ray.data as rd

    t = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["one two", None, "   "], pa.string()),
    })
    df = pack_sequences(
        rd.from_arrow(t), max_tokens=10, range_size=10, num_partitions=2
    ).to_pandas()
    assert df["doc_ids"].tolist() == ["0,1,2"]
    assert df["total_tokens"].tolist() == [2]


def test_every_doc_packed_once(ray_session):
    import ray.data as rd

    t = _corpus(seed=3)
    df = pack_sequences(
        rd.from_arrow(t), max_tokens=200, range_size=100, num_partitions=4
    ).to_pandas()
    seen = [int(d) for ids in df["doc_ids"] for d in ids.split(",")]
    assert sorted(seen) == list(range(t.num_rows))
    ok = df[~df.truncated]
    assert (ok.total_tokens <= 200).all()
