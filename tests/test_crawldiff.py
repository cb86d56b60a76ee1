"""Crawl-delta classification (stages/crawldiff.py): full-outer-join
semantics over two snapshots, hand-computed statuses, empty sides,
within-snapshot duplicate determinism, partition invariance.  The DuckDB
oracle for the wired query lives in ``__ray_entry__.py`` (``crawl_delta``).
"""

from __future__ import annotations

import pyarrow as pa

from deepseek_ocr_customvllm_ray.stages.crawldiff import snapshot_delta


def _ds(rows):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    }))


def _run(new_rows, old_rows, parts=4):
    df = snapshot_delta(
        _ds(new_rows), _ds(old_rows), "doc_id", "text", num_partitions=parts
    ).to_pandas()
    return {int(r.doc_id): r.status for r in df.itertuples(index=False)}


def test_hand_computed(ray_session):
    new = [(1, "alpha"), (2, "beta v2"), (3, "gamma"), (5, "new page")]
    old = [(1, "alpha"), (2, "beta"), (3, "gamma"), (4, "retired")]
    assert _run(new, old) == {
        1: "unchanged",
        2: "changed",
        3: "unchanged",
        4: "gone",
        5: "new",
    }


def test_empty_old_snapshot_everything_new(ray_session):
    new = [(i, f"doc {i}") for i in range(10)]
    got = _run(new, [(999, "x")])  # minimal old: one retired url
    assert got.pop(999) == "gone"
    assert got == {i: "new" for i in range(10)}


def test_null_text_compares_as_empty(ray_session):
    """Digest of null text == digest of '' (both engines coalesce)."""
    assert _run([(1, None)], [(1, "")]) == {1: "unchanged"}
    assert _run([(1, None)], [(1, "x")]) == {1: "changed"}


def test_within_snapshot_duplicates_use_min_digest(ray_session):
    """Out-of-contract duplicate ids stay deterministic: each side
    contributes its minimum digest, so the comparison is stable under
    row order and partitioning."""
    new = [(1, "a"), (1, "b")]
    old = [(1, "b"), (1, "a")]
    got = {}
    for parts in (1, 2, 8):
        got[parts] = _run(new, old, parts=parts)
    assert got[1] == got[2] == got[8]
    assert got[1][1] in ("changed", "unchanged")  # deterministic either way


def test_partition_invariant(ray_session):
    new = [(i, f"text {i if i % 2 else 'edited'}") for i in range(60)]
    old = [(i, f"text {i}") for i in range(40)] + [(100 + i, "old") for i in range(5)]
    want = _run(new, old, parts=1)
    for parts in (3, 16):
        assert _run(new, old, parts=parts) == want, parts
