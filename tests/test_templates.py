"""Host-consensus template stripping (stages/templates.py): hand-computed
winners, share/min_docs gates, tie-breaks, single-line docs, null text,
partition invariance.  The DuckDB oracle for the wired query lives in
``__ray_entry__.py`` (``host_template_strip``).
"""

from __future__ import annotations

import pyarrow as pa
import pytest

from deepseek_ocr_customvllm_ray.stages.templates import host_template_strip


def _ds(rows):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "host": pa.array([r[1] for r in rows], pa.string()),
        "text": pa.array([r[2] for r in rows], pa.string()),
    }))


def _run(rows, parts=4, **kw):
    df = host_template_strip(
        _ds(rows), "text", "doc_id", "host", num_partitions=parts, **kw
    ).to_pandas()
    return {int(r.doc_id): (r.text, bool(r.stripped)) for r in df.itertuples(index=False)}


def test_hand_computed(ray_session):
    rows = [
        # host a: banner on 3 of 4 docs -> share 3/4 >= 1/2, stripped
        (1, "a", "NAV\nbody one"),
        (2, "a", "NAV\nbody two"),
        (3, "a", "NAV"),                 # single-line template doc -> ""
        (4, "a", "original first\nrest"),
        # host b: no majority first line (2 distinct lines, 1 each... use 4)
        (5, "b", "x\ncontent"),
        (6, "b", "y\ncontent"),
        (7, "b", "z\ncontent"),
        (8, "b", "w\ncontent"),
    ]
    got = _run(rows)
    assert got[1] == ("body one", True)
    assert got[2] == ("body two", True)
    assert got[3] == ("", True)
    assert got[4] == ("original first\nrest", False)
    for i in (5, 6, 7, 8):
        assert got[i] == (rows[i - 1][2], False), i


def test_min_docs_floor_blocks_one_doc_hosts(ray_session):
    rows = [(1, "solo", "only page\nbody")]
    got = _run(rows)
    assert got[1] == ("only page\nbody", False)
    got2 = _run(rows, min_docs=1)
    assert got2[1] == ("body", True)


def test_tie_breaks_to_smallest_line(ray_session):
    """Two first lines with equal counts: the lexicographically smaller
    one is the modal template (deterministic under any partitioning)."""
    rows = [
        (1, "h", "bbb\none"),
        (2, "h", "bbb\ntwo"),
        (3, "h", "aaa\nthree"),
        (4, "h", "aaa\nfour"),
    ]
    got = _run(rows)  # share 2/4 >= 1/2 for the winner 'aaa'
    assert got[3] == ("three", True)
    assert got[4] == ("four", True)
    assert got[1] == ("bbb\none", False)
    assert got[2] == ("bbb\ntwo", False)


def test_share_gate_exact_integer(ray_session):
    rows = [
        (1, "h", "T\na"), (2, "h", "T\nb"),  # 2 of 5 < 1/2 -> no strip
        (3, "h", "u\nc"), (4, "h", "v\nd"), (5, "h", "w\ne"),
    ]
    got = _run(rows)
    assert all(not s for _t, s in got.values())
    # 2 of 4 == exactly 1/2 -> strip (>= is inclusive)
    got2 = _run(rows[:4])
    assert got2[1] == ("a", True) and got2[2] == ("b", True)


def test_null_text_passthrough(ray_session):
    rows = [(1, "h", "T\na"), (2, "h", "T\nb"), (3, "h", None)]
    got = _run(rows)
    assert got[3] == (None, False)
    assert got[1] == ("a", True)


def test_partition_invariant(ray_session):
    rows = [
        (i, f"h{i % 3}", ("BANNER\n" if i % 5 else "free\n") + f"doc {i}")
        for i in range(90)
    ]
    want = _run(rows, parts=1)
    for parts in (2, 16):
        assert _run(rows, parts=parts) == want, parts


def test_no_consensus_corpus_is_identity(ray_session):
    """Every doc has a distinct first line -> no host clears the share
    gate -> output is byte-identical input with stripped=false."""
    rows = [(i, f"h{i % 4}", f"unique head {i}\nbody {i}") for i in range(40)]
    got = _run(rows)
    assert got == {i: (t, False) for i, _h, t in rows}
