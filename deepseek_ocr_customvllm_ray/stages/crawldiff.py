"""Crawl-delta classification: what changed between two snapshots.

The incremental-processing primitive of a recurring crawl (CCNet / FineWeb
re-dump handling): given the PRIOR snapshot and the NEW snapshot of the
same url space, classify every url as

* ``new``       — in the new snapshot only (crawl discovered it);
* ``unchanged`` — in both, content byte-identical (skip re-extraction);
* ``changed``   — in both, content differs (re-extract, re-embed);
* ``gone``      — in the prior snapshot only (page retired; tombstone
  downstream artifacts).

This is a FULL OUTER JOIN shape Ray Data has no built-in for.  Scale
shape (the whole point — neither snapshot's payload ever shuffles):

1. each side is projected in its read tasks to THIN rows
   ``(id, side, h)`` — 8-byte blake2b content digest, 17 B/row;
2. the tagged union crosses ONE ``crc``-mixed id-hash exchange
   (``partition.with_hash_partition_int``), co-locating every row of an
   id regardless of side;
3. each partition classifies all its ids in a single composite lexsort +
   boundary sweep (no per-id Python); output is ``(id, status)``.

Content equality is digest equality (64-bit blake2b) — identical to the
``snapshot_dedup`` membership contract; the DuckDB oracle compares the
TEXT itself, independently checking the digest semantics (collision odds
~n^2/2^64, ~0 at any feasible corpus).

Duplicate ids WITHIN a snapshot are out of contract (snapshots key on
url); behavior is still deterministic — each side contributes its MINIMUM
digest to the comparison (the lexsort makes that the run head).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .dedup import _text_digests
from .partition import with_hash_partition_int

__all__ = ["snapshot_delta"]

#: classification labels, indexed by (has_old * 2 + has_new) with a
#: changed/unchanged split when both sides are present
_STATUS_NEW = "new"
_STATUS_GONE = "gone"
_STATUS_CHANGED = "changed"
_STATUS_UNCHANGED = "unchanged"


def _thin(batch: pa.Table, id_col: str, text_col: str, side: int) -> pa.Table:
    ids = batch[id_col].cast(pa.int64())
    h = _text_digests(batch[text_col].to_pylist())
    return pa.table({
        "id": ids,
        "side": pa.array(np.full(batch.num_rows, side, np.int8), pa.int8()),
        "h": pa.array(h.view(np.int64), pa.int64()),
    })


def snapshot_delta(
    new_ds, old_ds, id_col: str, text_col: str, num_partitions: int = 32
):
    """``(new, old) Datasets -> Dataset (id, status)`` over the id union.

    ``status`` is one of ``new | unchanged | changed | gone`` (see module
    docstring).  Both inputs need ``(id_col, text_col)``; everything else
    is ignored (project upstream so payloads stay behind).
    """
    thin_old = old_ds.map_batches(
        lambda b: _thin(b, id_col, text_col, 0), batch_format="pyarrow"
    )
    thin_new = new_ds.map_batches(
        lambda b: _thin(b, id_col, text_col, 1), batch_format="pyarrow"
    )
    parts = with_hash_partition_int(
        thin_old.union(thin_new), "id", num_partitions
    )

    def classify(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.table({
                id_col: pa.array([], pa.int64()),
                "status": pa.array([], pa.string()),
            })
        ids = t["id"].to_numpy(zero_copy_only=False)
        side = t["side"].to_numpy(zero_copy_only=False)
        h = t["h"].to_numpy(zero_copy_only=False).view(np.uint64)
        # lexsort (h, side, id): within each (id, side) run the head row
        # carries the minimum digest — the deterministic representative
        order = np.lexsort((h, side, ids))
        ids, side, h = ids[order], side[order], h[order]
        new_id = np.concatenate([[True], ids[1:] != ids[:-1]])
        new_run = new_id | np.concatenate([[True], side[1:] != side[:-1]])
        run_start = np.flatnonzero(new_run)          # head of each (id, side)
        grp_of_run = (np.cumsum(new_id) - 1)[run_start]
        run_side = side[run_start]
        run_h = h[run_start]
        n_grp = int(new_id.sum())
        has = np.zeros((n_grp, 2), dtype=bool)
        hmin = np.zeros((n_grp, 2), dtype=np.uint64)
        has[grp_of_run, run_side] = True
        hmin[grp_of_run, run_side] = run_h
        grp_ids = ids[np.flatnonzero(new_id)]
        status = np.where(
            ~has[:, 0],
            _STATUS_NEW,
            np.where(
                ~has[:, 1],
                _STATUS_GONE,
                np.where(
                    hmin[:, 0] == hmin[:, 1], _STATUS_UNCHANGED, _STATUS_CHANGED
                ),
            ),
        )
        return pa.table({
            id_col: pa.array(grp_ids, pa.int64()),
            "status": pa.array(status, pa.string()),
        })

    return parts.groupby("_part").map_groups(classify, batch_format="pyarrow")
