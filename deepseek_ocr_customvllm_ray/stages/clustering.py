"""Distributed k-means over an embedding column, and SemDeDup-style
semantic deduplication built on it.

The reference has no clustering operator; this is part of the net-new
training-data family (brief: "embedding-cosine near-dup", "IVF ... as the
scale path").  ``similarity.train_centroids`` fits on a driver-side
SAMPLE; this module fits on the FULL corpus, Ray-Data-first:

- **kmeans_fit** — Lloyd iterations where each step is a map-only pass:
  centroids broadcast once per iteration (``ray.put``), every batch
  computes its cluster assignments and emits per-cluster PARTIAL sums
  (a ≤ ``n_clusters``-row table per batch); the driver folds the tiny
  partials.  The corpus is never shuffled and never leaves the object
  store.
- **Exact associativity.** A float partial sum is order-dependent, so
  centroids would drift with block arrival order and the operator could
  not be golden-snapshot-pinned.  The partials therefore accumulate
  FIXED-POINT vectors (``round(unit_vec * 2^20)`` as int64): integer
  addition is associative, so any cluster shape, batch size, or retry
  produces bit-identical centroid sums.  int64 overflows only past
  ~2^43 rows per cluster; the quantization error (~1e-6 per coordinate)
  is far below any clustering-relevant signal.
- **Deterministic init.** Seeds are the ``n_clusters`` vectors whose ids
  have the smallest ``md5(f"{seed}:{id}")`` digest — a distributed top-k
  (local top-k per batch, driver merges ≤ k rows per batch), not a
  block-order-dependent ``limit()``.
- **Iteration re-reads the input.**  A Dataset is lazy, so each Lloyd
  pass would re-execute the upstream read; ``kmeans_fit`` materializes
  the pruned (id, vec) projection once.  At 100 TB the same two lines
  become "write the projection to parquet once, iterate over that" —
  the loop body is unchanged.

- **semantic_dedup** — SemDeDup (Abbas et al. 2023): duplicates are
  detected only WITHIN a cluster, turning the O(n^2) all-pairs cosine
  into per-cluster work bounded by cluster size.  One thin exchange
  co-locates each cluster's (id, vec) rows; every partition resolves its
  clusters vectorized (ids sorted, one gram matrix per cluster, greedy
  keep-first sweep).  Output is (id, cluster, keep, dup_of) — pure
  function of the input, so snapshot-safe.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.vectors import to_matrix

#: fixed-point scale for the associative centroid accumulation
_SCALE = 1 << 20


def _unit_rows(mat: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(mat, axis=1)
    n[n == 0] = 1.0
    return mat / n[:, None]


def _seed_centroids(ds, vec_col: str, id_col: str, k: int, seed: int, dim: int) -> np.ndarray:
    """Deterministic init: unit vectors of the k smallest-digest ids."""

    def local_topk(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        digs = [hashlib.md5(f"{seed}:{i}".encode()).hexdigest()[:16] for i in ids]
        order = np.argsort(np.asarray(digs, dtype=object), kind="stable")[:k]
        vecs = to_matrix(batch[vec_col], dim=dim)
        return pa.table({
            "_dig": pa.array([digs[i] for i in order], pa.string()),
            "_id": pa.array([str(ids[i]) for i in order], pa.string()),
            "_vec": pa.array([vecs[i].tolist() for i in order], pa.list_(pa.float64())),
        })

    top = ds.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    top = top.sort_values(["_dig", "_id"], kind="mergesort").head(k)
    return _unit_rows(np.asarray(top["_vec"].tolist(), dtype=np.float64))


def kmeans_fit(
    ds,
    vec_col: str,
    id_col: str,
    n_clusters: int,
    iters: int = 5,
    seed: int = 7,
    dim: int | None = None,
) -> np.ndarray:
    """Full-corpus spherical k-means.  Returns (n_clusters, dim) unit
    centroids; assignment is ``argmax(unit_vec @ centroids.T)`` with ties
    to the lowest cluster index (numpy argmax), so labels are a pure
    function of (input, seed) on any cluster shape."""
    import ray

    if dim is None:
        first = ds.take(1)[0][vec_col]
        dim = len(first)
    # one materialization of the pruned projection; the 100-TB swap is a
    # one-time write_parquet + read_parquet around the loop
    proj = ds.select_columns([id_col, vec_col]).materialize()
    cents = _seed_centroids(proj, vec_col, id_col, n_clusters, seed, dim)

    for _ in range(iters):
        c_ref = ray.put(cents)

        def partials(batch: pa.Table) -> pa.Table:
            c = ray.get(c_ref)
            vecs = _unit_rows(to_matrix(batch[vec_col], dim=c.shape[1]))
            q = np.rint(vecs * _SCALE).astype(np.int64)
            assign = (vecs @ c.T).argmax(axis=1)
            present = np.unique(assign)
            sums = np.zeros((len(present), c.shape[1]), dtype=np.int64)
            counts = np.zeros(len(present), dtype=np.int64)
            pos = np.searchsorted(present, assign)
            np.add.at(sums, pos, q)
            np.add.at(counts, pos, 1)
            return pa.table({
                "cluster": pa.array(present.astype(np.int32), pa.int32()),
                "cnt": pa.array(counts, pa.int64()),
                "qsum": pa.array([s.tolist() for s in sums], pa.list_(pa.int64())),
            })

        part = proj.map_batches(partials, batch_format="pyarrow").to_pandas()
        new = cents.copy()
        for cl, grp in part.groupby("cluster"):
            cnt = int(grp["cnt"].sum())
            if cnt == 0:
                continue
            qsum = np.sum(np.asarray(grp["qsum"].tolist(), dtype=np.int64), axis=0)
            v = qsum.astype(np.float64) / (_SCALE * cnt)
            n = np.linalg.norm(v)
            if n > 0:
                new[int(cl)] = v / n
        cents = new
    return cents


def kmeans_assign(ds, centroids: np.ndarray, vec_col: str, id_col: str):
    """Map-only label assignment against broadcast centroids."""
    import ray

    c_ref = ray.put(np.asarray(centroids, dtype=np.float64))

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(c_ref)
        vecs = _unit_rows(to_matrix(batch[vec_col], dim=c.shape[1]))
        lab = (vecs @ c.T).argmax(axis=1).astype(np.int32)
        return pa.table({
            id_col: batch[id_col],
            "cluster": pa.array(lab, pa.int32()),
        })

    return ds.map_batches(assign, batch_format="pyarrow")


def semantic_dedup(
    ds,
    vec_col: str,
    id_col: str,
    centroids: np.ndarray,
    threshold: float,
    num_partitions: int = 16,
):
    """SemDeDup: within each k-means cluster, id-ordered greedy keep —
    a row is a duplicate iff its cosine to an already-kept row of the
    SAME cluster exceeds ``threshold``.

    Scale shape: assignment is map-only; ONE thin exchange co-locates each
    cluster's rows (cluster-id hash partition); each partition then builds
    one id-sorted gram matrix per cluster (vectorized matmul, O(c) greedy
    sweep with vectorized row ops).  Cross-cluster near-dups are missed by
    design — the SemDeDup trade; raise ``n_clusters`` to shrink clusters,
    not the other way.  Per-cluster memory is O(c * d); at crawl scale cap
    cluster sizes by over-clustering (n_clusters ~ n / 10^4), the same
    guidance as the LSH hot-bucket cap.

    Returns (id, cluster, keep, dup_of); ``dup_of`` is the kept row with
    the highest cosine (-1 for keepers) — pure function of the input."""
    import ray

    from .partition import with_hash_partition_int

    c_ref = ray.put(np.asarray(centroids, dtype=np.float64))

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(c_ref)
        vecs = _unit_rows(to_matrix(batch[vec_col], dim=c.shape[1]))
        lab = (vecs @ c.T).argmax(axis=1).astype(np.int64)
        return pa.table({
            id_col: batch[id_col],
            "cluster": pa.array(lab, pa.int64()),
            "_unit": pa.array([v.tolist() for v in vecs], pa.list_(pa.float64())),
        })

    labeled = with_hash_partition_int(
        ds.map_batches(assign, batch_format="pyarrow"), "cluster", num_partitions
    )

    def resolve(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return pa.schema([
                (id_col, pa.int64()), ("cluster", pa.int64()),
                ("keep", pa.bool_()), ("dup_of", pa.int64()),
            ]).empty_table()
        ids_all = part[id_col].to_numpy(zero_copy_only=False)
        cl_all = part["cluster"].to_numpy(zero_copy_only=False)
        V_all = np.asarray(part["_unit"].to_pylist(), dtype=np.float64)
        order = np.lexsort((ids_all, cl_all))
        ids_s, cl_s, V_s = ids_all[order], cl_all[order], V_all[order]
        n = len(ids_s)
        keep = np.zeros(n, dtype=bool)
        dup_of = np.full(n, -1, dtype=np.int64)
        new_cl = np.empty(n, dtype=bool)
        new_cl[0] = True
        new_cl[1:] = cl_s[1:] != cl_s[:-1]
        starts = np.flatnonzero(new_cl)
        for s, e in zip(starts, np.append(starts[1:], n)):
            ids, V = ids_s[s:e], V_s[s:e]
            kept_rows: list = []
            for i in range(e - s):
                if kept_rows:
                    sims = V[kept_rows] @ V[i]
                    j = int(np.argmax(sims))  # first max -> lowest kept id
                    if sims[j] > threshold:
                        dup_of[s + i] = ids[kept_rows[j]]
                        continue
                keep[s + i] = True
                kept_rows.append(i)
        return pa.table({
            id_col: pa.array(ids_s, pa.int64()),
            "cluster": pa.array(cl_s, pa.int64()),
            "keep": pa.array(keep, pa.bool_()),
            "dup_of": pa.array(dup_of, pa.int64()),
        })

    return labeled.groupby("_part").map_groups(resolve, batch_format="pyarrow")
