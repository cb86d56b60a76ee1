"""Similarity search over embedding columns.

- ``knn_brute``: baseline exact top-k cosine — per-batch numpy matmul
  against a broadcast query matrix (``ray.put`` once, read per task), local
  top-k per batch, tiny global merge.  No shuffle of the corpus.
- ``knn_ivf``: the scale path — IVF-style coarse quantizer: seeded k-means
  (few Lloyd iterations over a driver-side sample), centroids broadcast,
  per-batch cluster assignment filters to the ``n_probe`` closest clusters
  before the exact scoring, cutting the matmul volume by ~n_clusters/n_probe.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.vectors import to_matrix


def _unit(mat: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(mat, axis=1)
    n[n == 0] = 1.0
    return mat / n[:, None]


def knn_brute(ds, query_vecs: np.ndarray, vec_col: str, id_col: str, k: int = 10) -> pd.DataFrame:
    """Exact top-k cosine per query.  Returns (query_no, id, cosine) sorted
    by (query_no, -cosine, id)."""
    import ray

    q = _unit(np.asarray(query_vecs, dtype=np.float64))
    q_ref = ray.put(q)

    def local_topk(batch: pa.Table) -> pa.Table:
        qm = ray.get(q_ref)
        # zero-copy values-buffer reshape; dim pins empty-block shape
        vecs = to_matrix(batch[vec_col], dim=qm.shape[1])
        ids = np.asarray(batch[id_col].to_pylist())
        sims = _unit(vecs) @ qm.T  # (n, nq)
        out_q, out_id, out_s = [], [], []
        kk = min(k, len(ids))
        for qi in range(qm.shape[0]):
            col = sims[:, qi]
            # deterministic under exact cosine ties (duplicate vectors):
            # order by (-cosine, id) so local truncation keeps the same
            # candidates the global (query_no, -cosine, id) sort would
            idx = np.lexsort((ids, -col))[:kk]
            for j in idx:
                out_q.append(qi)
                out_id.append(ids[j])
                out_s.append(float(col[j]))
        return pa.table({
            "query_no": pa.array(out_q, pa.int32()),
            "id": pa.array(out_id),
            "cosine": pa.array(out_s, pa.float64()),
        })

    local = ds.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    out = (
        local.sort_values(["query_no", "cosine", "id"], ascending=[True, False, True])
        .groupby("query_no", group_keys=False)
        .head(k)
        .reset_index(drop=True)
    )
    return out


def train_centroids(sample: np.ndarray, n_clusters: int, iters: int = 10, seed: int = 7) -> np.ndarray:
    """Seeded mini k-means (Lloyd) on a sample; deterministic."""
    rng = np.random.default_rng(seed)
    sample = _unit(np.asarray(sample, dtype=np.float64))
    idx = rng.choice(len(sample), size=min(n_clusters, len(sample)), replace=False)
    cents = sample[idx].copy()
    for _ in range(iters):
        assign = (sample @ cents.T).argmax(axis=1)
        for c in range(len(cents)):
            members = sample[assign == c]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cents[c] = v / n
    return cents


def build_ivf_index(
    ds,
    vec_col: str,
    id_col: str,
    out_dir: str,
    n_clusters: int = 16,
    sample_size: int = 2000,
    seed: int = 7,
) -> np.ndarray:
    """Persist an IVF index: centroids + vectors hive-partitioned by their
    assigned cluster.

    The scale property: a query that probes ``n_probe`` clusters READS only
    those partitions from storage (hive pruning on ``cluster=``) — the
    corpus is never scanned.  Index build is one pass: assign per batch
    (broadcast centroids), write partitioned parquet.  Returns centroids.
    """
    import json
    import os

    import ray

    os.makedirs(out_dir, exist_ok=True)
    sample_rows = ds.limit(sample_size).to_pandas()[vec_col].tolist()
    cents = train_centroids(np.asarray(sample_rows), n_clusters, seed=seed)
    c_ref = ray.put(cents)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(c_ref)
        vecs = _unit(to_matrix(batch[vec_col], dim=c.shape[1]))
        cluster = (vecs @ c.T).argmax(axis=1).astype(np.int32)
        return pa.table({
            "id": batch[id_col],
            "vec": pa.array([v.tolist() for v in vecs], pa.list_(pa.float64())),
            "cluster": pa.array(cluster, pa.int32()),
        })

    ds.map_batches(assign, batch_format="pyarrow").write_parquet(
        os.path.join(out_dir, "vectors"), partition_cols=["cluster"]
    )
    with open(os.path.join(out_dir, "centroids.json"), "w") as f:
        json.dump(cents.tolist(), f)
    return cents


def knn_ivf_index(
    index_dir: str,
    query_vecs: np.ndarray,
    k: int = 10,
    n_probe: int = 4,
) -> pd.DataFrame:
    """Query a persisted IVF index: read ONLY the probed cluster partitions
    (predicate pushdown on the hive column), brute-force within them."""
    import json
    import os

    import ray.data as rd

    with open(os.path.join(index_dir, "centroids.json")) as f:
        cents = np.asarray(json.load(f))
    q = _unit(np.asarray(query_vecs, dtype=np.float64))
    probe = set()
    qc = q @ cents.T
    for qi in range(q.shape[0]):
        for c in np.argsort(-qc[qi])[:n_probe]:
            probe.add(int(c))

    # partition pruning at the PATH level: only the probed cluster dirs are
    # ever opened (equivalent to hive predicate pushdown, and robust to
    # Ray's fragment sampler which can't evaluate partition-column filters)
    import glob

    paths = []
    for c in sorted(probe):
        d = os.path.join(index_dir, "vectors", f"cluster={c}")
        paths.extend(sorted(glob.glob(os.path.join(d, "*.parquet"))))
    if not paths:
        return pd.DataFrame({"query_no": [], "id": [], "cosine": []})
    ds = rd.read_parquet(paths)
    return knn_brute(ds, q, "vec", "id", k=k)


def knn_ivf(
    ds,
    query_vecs: np.ndarray,
    vec_col: str,
    id_col: str,
    k: int = 10,
    n_clusters: int = 16,
    n_probe: int = 4,
    sample_size: int = 2000,
    seed: int = 7,
    sample_vecs: np.ndarray = None,
) -> pd.DataFrame:
    """IVF top-k: probe only the ``n_probe`` centroids closest to any query.

    Approximate (recall < 1 when true neighbors sit in unprobed clusters) —
    the standard IVF trade; verify recall vs ``knn_brute`` in tests.
    ``sample_vecs`` pins the k-means training sample explicitly — callers
    that need run-invariant output (golden-snapshot oracles) pass a
    deterministic head read; the default ``limit()`` sample depends on Ray
    block arrival order.
    """
    import ray

    if sample_vecs is None:
        sample_vecs = np.asarray(ds.limit(sample_size).to_pandas()[vec_col].tolist())
    cents = train_centroids(sample_vecs, n_clusters, seed=seed)
    q = _unit(np.asarray(query_vecs, dtype=np.float64))
    probe = set()
    qc = q @ cents.T
    for qi in range(q.shape[0]):
        for c in np.argsort(-qc[qi])[:n_probe]:
            probe.add(int(c))
    state = ray.put((cents, q, sorted(probe)))

    def local_topk(batch: pa.Table) -> pa.Table:
        cents_, qm, probe_list = ray.get(state)
        vecs = _unit(to_matrix(batch[vec_col], dim=qm.shape[1]))
        ids = np.asarray(batch[id_col].to_pylist())
        assign = (vecs @ cents_.T).argmax(axis=1)
        mask = np.isin(assign, probe_list)
        vecs, ids = vecs[mask], ids[mask]
        out_q, out_id, out_s = [], [], []
        if len(ids):
            sims = vecs @ qm.T
            kk = min(k, len(ids))
            for qi in range(qm.shape[0]):
                col = sims[:, qi]
                idx = np.lexsort((ids, -col))[:kk]  # tie-break by id
                for j in idx:
                    out_q.append(qi); out_id.append(ids[j]); out_s.append(float(col[j]))
        return pa.table({
            "query_no": pa.array(out_q, pa.int32()),
            "id": pa.array(out_id),
            "cosine": pa.array(out_s, pa.float64()),
        })

    local = ds.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    return (
        local.sort_values(["query_no", "cosine", "id"], ascending=[True, False, True])
        .groupby("query_no", group_keys=False)
        .head(k)
        .reset_index(drop=True)
    )
