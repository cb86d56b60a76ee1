"""Per-host template (boilerplate) line stripping.

Web hosts prepend the same navigation / banner line to most of their
pages; WET-style extraction strips it by HOST-LEVEL consensus, not
per-page heuristics (the line is perfectly fluent text — only its
cross-page repetition within a host marks it as chrome).  The operator:

1. per host, find the MODAL first line of its documents (ties broken by
   lexicographically smallest line, so the winner is deterministic);
2. a host "has a template" iff the modal line's share of the host's docs
   clears ``min_share`` — expressed as an integer fraction
   ``(num, den)`` and tested as ``n * den >= num * total`` so the
   engine and the SQL oracle compare in exact integer arithmetic;
3. every doc whose first line equals its host's template loses that line
   (and the following separator); other docs pass through byte-identical.

Scale shape:

* pass 1 ships THIN partial rows ``(host, first_line, n)`` pre-counted
  per batch (distinct pairs per batch, not docs); ONE host-hash exchange
  co-locates each host's counts; per-partition modal resolution is a
  single lexsort + ``reduceat`` sweep emitting ONE row per host;
* the winner table (#hosts with a template) is collected and broadcast
  once via ``ray.put`` — at the web's ~10^7 hosts x ~100 B that is a
  ~1 GB ceiling; beyond it, swap the probe for a host-key co-partition
  of winners with doc rows (the ``paragraph_dedup`` shuffle shape);
* pass 2 is map-only: vectorized ``index_in`` winner lookup + one
  ``max_splits=1`` split per batch.  Corpus bytes never shuffle.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .partition import with_hash_partition

__all__ = ["host_template_strip"]

#: unit separator — cannot occur in a host name; joins (host, line) into
#: one value_counts key inside the partial kernel
_US = "\x1f"


def _first_lines(texts: pa.Array, sep: str) -> pa.Array:
    lists = pc.split_pattern(texts, pattern=sep, max_splits=1)
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    # element 0 always exists for non-null strings
    return pc.list_element(lists, 0)


def host_template_strip(
    ds,
    text_col: str,
    id_col: str,
    host_col: str,
    min_share: Tuple[int, int] = (1, 2),
    min_docs: int = 2,
    sep: str = "\n",
    num_partitions: int = 32,
):
    """``Dataset -> Dataset (id, text, stripped)`` with host-consensus
    first-line templates removed.

    ``min_share`` is a fraction ``(num, den)``: the modal first line must
    cover at least ``num/den`` of the host's non-null docs, and the host
    must have at least ``min_docs`` docs (a one-doc host trivially has a
    100% modal line — that is a page, not a template).  Null-text
    rows pass through unchanged (``stripped = false``) and do not count
    toward host totals.  A stripped single-line doc becomes ``""``.
    """
    num, den = min_share
    if num < 0 or den <= 0:
        raise ValueError(f"min_share must be a non-negative fraction, got {min_share}")

    def partial(batch: pa.Table) -> pa.Table:
        keep = pc.and_(batch[text_col].is_valid(), batch[host_col].is_valid())
        sub = batch.filter(keep)
        if not sub.num_rows:
            return pa.table({
                "host": pa.array([], pa.string()),
                "line": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
            })
        first = _first_lines(sub[text_col], sep)
        key = pc.binary_join_element_wise(sub[host_col], first, _US)
        vc = key.combine_chunks().value_counts() if isinstance(
            key, pa.ChunkedArray
        ) else key.value_counts()
        pair = pc.split_pattern(vc.field("values"), pattern=_US, max_splits=1)
        return pa.table({
            "host": pc.list_element(pair, 0),
            "line": pc.list_element(pair, 1),
            "n": vc.field("counts").cast(pa.int64()),
        })

    thin = ds.map_batches(partial, batch_format="pyarrow")
    parts = with_hash_partition(thin, "host", num_partitions)

    def modal(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "host": pa.array([], pa.string()),
            "line": pa.array([], pa.string()),
        })
        if not t.num_rows:
            return empty
        host = t["host"].to_numpy(zero_copy_only=False)
        line = t["line"].to_numpy(zero_copy_only=False)
        n = t["n"].to_numpy(zero_copy_only=False)
        # fold duplicate (host, line) rows from different batches, then
        # pick the modal line per host: one lexsort, boundary sweeps
        order = np.lexsort((line, host))
        host, line, n = host[order], line[order], n[order]
        new_pair = np.concatenate(
            [[True], (host[1:] != host[:-1]) | (line[1:] != line[:-1])]
        )
        pi = np.flatnonzero(new_pair)
        p_host, p_line = host[pi], line[pi]
        p_n = np.add.reduceat(n, pi)
        new_host = np.concatenate([[True], p_host[1:] != p_host[:-1]])
        hi = np.flatnonzero(new_host)
        totals = np.add.reduceat(p_n, hi)
        gid = np.cumsum(new_host) - 1
        # modal = max n, ties -> smallest line: rows are line-sorted within
        # host, so the FIRST row attaining the per-host max wins the tie.
        # Fully vectorized: per-host max via reduceat, first attaining
        # position via unique-first-occurrence over the candidate gids.
        maxes = np.maximum.reduceat(p_n, hi)
        cand = np.flatnonzero(p_n == maxes[gid])
        best = cand[np.unique(gid[cand], return_index=True)[1]]
        ok = (totals >= min_docs) & (p_n[best] * den >= num * totals)
        best = best[ok]
        return pa.table({
            "host": pa.array(p_host[best], pa.string()),
            "line": pa.array(p_line[best], pa.string()),
        })

    winners = parts.groupby("_part").map_groups(modal, batch_format="pyarrow")

    import ray

    wt = winners.to_arrow_refs()

    def _gather(refs):
        ts = [t for t in ray.get(refs) if t.num_rows]
        if not ts:
            return pa.array([], pa.string()), pa.array([], pa.string())
        cat = pa.concat_tables(ts)
        h = cat["host"].to_numpy(zero_copy_only=False)
        l_ = cat["line"].to_numpy(zero_copy_only=False)
        order = np.argsort(h, kind="stable")
        return (
            pa.array(h[order], pa.string()),
            pa.array(l_[order], pa.string()),
        )

    win_ref = ray.remote(num_cpus=1)(_gather).remote(list(wt))

    def strip(batch: pa.Table) -> pa.Table:
        hosts_arr, lines_arr = ray.get(win_ref)
        ids = batch[id_col].cast(pa.int64())
        texts = batch[text_col]
        n_rows = batch.num_rows
        valid = pc.and_(texts.is_valid(), batch[host_col].is_valid())
        valid_np = np.asarray(valid)
        out_text = texts
        stripped_np = np.zeros(n_rows, dtype=bool)
        if valid_np.any() and len(hosts_arr):
            idx = pc.index_in(batch[host_col], hosts_arr)
            wline = pc.take(lines_arr, idx)
            first = _first_lines(pc.fill_null(texts, ""), sep)
            is_win = pc.fill_null(pc.equal(first, wline), False)
            is_win = pc.and_(is_win, valid)
            lists = pc.split_pattern(
                pc.fill_null(texts, ""), pattern=sep, max_splits=1
            )
            # rest-of-doc = second split element when present, "" for
            # single-line docs: list_slice pads nothing, binary_join of an
            # empty list is ""
            rest = pc.binary_join(pc.list_slice(lists, 1, 2), sep)
            out_text = pc.if_else(is_win, rest, texts)
            stripped_np = np.asarray(is_win)
        return pa.table({
            id_col: ids,
            "text": out_text,
            "stripped": pa.array(stripped_np, pa.bool_()),
        })

    return ds.map_batches(strip, batch_format="pyarrow")
