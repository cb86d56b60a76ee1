"""Serial / driver-side REFERENCE implementations of the near-dup
operators, used only as parity oracles in the test suite.

These are the quarantined twins of the distributed stages in
``deepseek_ocr_customvllm_ray/stages/dedup.py`` (VERDICT r2 item 7): they
materialize whole corpora on the driver, which is exactly what the
production paths must never do, so they live here where nobody can wire
them into a pipeline by accident.  Each one shares its per-bucket kernel
with the distributed implementation, so parity tests exercise the
distribution machinery (partitioning, exchanges, dedup shuffles), not a
re-derivation of the math.
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import pandas as pd

from deepseek_ocr_customvllm_ray.functions import hashing as hx
from deepseek_ocr_customvllm_ray.stages.dedup import (
    _cosine_pairs_in_bucket,
    _pairs_from_band,
    _simhash_pairs_in_bucket,
    make_minhash_batch,
)


def minhash_near_dup_clusters_local(
    ds,
    text_col: str,
    id_col: str,
    num_perm: int = 64,
    n_bands: int = 16,
    shingle_k: int = 3,
    threshold: float = 0.8,
    seed: int = 1234,
) -> pd.DataFrame:
    """Driver-side union-find MinHash clustering -> DataFrame
    (id, cluster_id).  Materializes the candidate-pair list AND the whole
    id column on the driver; parity reference for
    ``minhash_near_dup_clusters_ds``."""
    sig_ds = ds.map_batches(
        make_minhash_batch(text_col, id_col, num_perm, n_bands, shingle_k, seed),
        batch_format="pyarrow",
    )
    pairs = (
        sig_ds.groupby(["band_no", "band_key"])
        .map_groups(_pairs_from_band, batch_format="pandas")
        .to_pandas()
    )
    if len(pairs) == 0 or "id_a" not in pairs.columns:
        pairs = pd.DataFrame({"id_a": [], "id_b": [], "sig_a": [], "sig_b": []})
    parent: Dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    def union(x, y):
        rx, ry = find(x), find(y)
        if rx != ry:
            if ry < rx:
                rx, ry = ry, rx
            parent[ry] = rx

    seen_pair = set()
    for ia, ib, sa, sb in zip(pairs["id_a"], pairs["id_b"], pairs["sig_a"], pairs["sig_b"]):
        key = (ia, ib)
        if key in seen_pair:
            continue
        seen_pair.add(key)
        sig_a = np.frombuffer(sa, dtype=np.uint64)
        sig_b = np.frombuffer(sb, dtype=np.uint64)
        if hx.signature_similarity(sig_a, sig_b) >= threshold:
            union(ia, ib)

    all_ids = ds.select_columns([id_col]).to_pandas()[id_col].tolist()
    return pd.DataFrame(
        {"id": all_ids, "cluster_id": [find(i) for i in all_ids]}
    ).sort_values("id").reset_index(drop=True)


def simhash_near_dup_pairs_local(
    texts, ids, max_hamming: int = 3
) -> pd.DataFrame:
    """Pure-serial SimHash pair reference: same 4x16-bit banding and the
    SAME per-bucket kernel as the distributed stage."""
    sims = [hx.simhash64(t or "") for t in texts]
    buckets: Dict[int, set] = {}
    for i, s in zip(ids, sims):
        u = s & 0xFFFFFFFFFFFFFFFF
        for bn in range(4):
            key = (bn << 16) | ((u >> (16 * bn)) & 0xFFFF)
            buckets.setdefault(key, set()).add((i, s))
    a_l, b_l, h_l = [], [], []
    for rows in buckets.values():
        if len(rows) < 2:
            continue
        a, b, h = _simhash_pairs_in_bucket(sorted(rows), max_hamming)
        a_l.extend(a); b_l.extend(b); h_l.extend(h)
    out = pd.DataFrame({
        "id_a": pd.Series(a_l, dtype="int64"),
        "id_b": pd.Series(b_l, dtype="int64"),
        "hamming": pd.Series(h_l, dtype="int64"),
    })
    return (
        out.groupby(["id_a", "id_b"], as_index=False)["hamming"].min()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )


def embedding_near_dup_pairs_local(
    vecs: np.ndarray,
    ids,
    threshold: float = 0.95,
    n_planes: int = 12,
    seed: int = 99,
) -> pd.DataFrame:
    """Pure-serial hyperplane-LSH pair reference: same plane RNG, same
    bucket keys, SAME per-bucket cosine kernel, min() on cross-set dups."""
    if len(ids) == 0:
        return pd.DataFrame({
            "id_a": pd.Series([], dtype="int64"),
            "id_b": pd.Series([], dtype="int64"),
            "cosine": pd.Series([], dtype="float64"),
        })
    dim = vecs.shape[1]
    rng = np.random.default_rng(seed)
    planes = [rng.standard_normal((dim, n_planes)) for _ in range(2)]
    norms = np.linalg.norm(vecs, axis=1)
    norms[norms == 0] = 1.0
    unit = vecs / norms[:, None]
    weights = 1 << np.arange(n_planes)
    frames = []
    for pl in planes:
        keys = ((unit @ pl) > 0).dot(weights).astype(np.int64)
        df = pd.DataFrame({"id": ids, "key": keys})
        a_l, b_l, c_l = [], [], []
        for _, g in df.groupby("key", sort=False):
            if len(g) < 2:
                continue
            g = g.sort_values("id")
            mat = unit[g.index.to_numpy()]
            a, b, c = _cosine_pairs_in_bucket(g["id"].tolist(), mat, threshold)
            a_l.extend(a); b_l.extend(b); c_l.extend(c)
        frames.append(pd.DataFrame({
            "id_a": pd.Series(a_l, dtype="int64"),
            "id_b": pd.Series(b_l, dtype="int64"),
            "cosine": pd.Series(c_l, dtype="float64"),
        }))
    out = pd.concat(frames, ignore_index=True)
    return (
        out.groupby(["id_a", "id_b"], as_index=False)["cosine"].min()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
