"""Deduplication stages: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale design (100 TB):
- exact dedup: content hash added in a vectorized ``map_batches``, then ONE
  ``groupby(hash)`` shuffle of (hash, id) pairs — never the payloads — and a
  broadcast keeper-set filter.  Here the corpus is small enough to shuffle
  rows directly; both paths are implemented and the pair-shuffle one is the
  default for wide tables.
- MinHash LSH: signatures per batch (numpy-vectorized), explode to
  (band_no, band_key, id) rows, ``groupby(band)`` emits candidate pairs,
  pairs verified by signature similarity, connected components by iterative
  min-label propagation over the pair list (bounded rounds; the pair list is
  orders of magnitude smaller than the corpus).  No stage materializes the
  documents.
- SimHash: 64-bit signature, 4x16-bit band buckets, Hamming-verify.
- embedding near-dup: random-hyperplane LSH buckets then exact cosine
  verify within buckets.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions import hashing as hx


# --- exact dedup ----------------------------------------------------------


def add_sha1(text_col: str, out_col: str = "content_sha1"):
    import hashlib

    def fn(batch: pa.Table) -> pa.Table:
        hashes = [
            hashlib.sha1((t or "").encode("utf-8")).hexdigest()
            for t in batch[text_col].to_pylist()
        ]
        return batch.append_column(out_col, pa.array(hashes, pa.string()))

    return fn


def exact_dedup(ds, text_col: str, id_col: str):
    """One row per distinct text, keeper = min(id).  Shuffles only
    (hash, id); keeps payload rows in place and filters them with a
    broadcast keeper-id set (scale path: the keeper set is ids only; for
    corpora where even that is large, swap the final filter for a
    hash-partitioned semi-join on ``content_sha1``)."""
    import ray

    hashed = ds.map_batches(add_sha1(text_col), batch_format="pyarrow")
    from ray.data.aggregate import Min

    keepers = (
        hashed.select_columns(["content_sha1", id_col])
        .groupby("content_sha1")
        .aggregate(Min(id_col, alias_name="keeper_id"))
    )
    keeper_ids = set(keepers.to_pandas()["keeper_id"].tolist())
    ref = ray.put(keeper_ids)

    def keep(batch: pa.Table) -> pa.Table:
        ids = ray.get(ref)
        mask = pa.array([i in ids for i in batch[id_col].to_pylist()], pa.bool_())
        return batch.filter(mask)

    return hashed.map_batches(keep, batch_format="pyarrow")


def exact_dedup_shuffle(ds, text_col: str, id_col: str, num_partitions: int = 64):
    """Scale-path exact dedup: NO driver-side keeper set.

    Hash-partition rows by content sha (co-locating all copies of a text),
    then one vectorized partition-local drop-duplicates keeping min(id) —
    partition-local is globally correct because copies always co-locate.
    Works at any corpus size; the broadcast variant (:func:`exact_dedup`) is
    faster when the keeper-id set fits driver memory.
    """
    import pandas as pd

    from .partition import with_hash_partition

    hashed = ds.map_batches(add_sha1(text_col), batch_format="pyarrow")
    parted = with_hash_partition(hashed, "content_sha1", num_partitions)

    def drop_dups(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=["_part"])
        return (
            df.sort_values([id_col], kind="mergesort")
            .drop_duplicates("content_sha1", keep="first")
        )

    return parted.groupby("_part").map_groups(drop_dups, batch_format="pandas")


def exact_dedup_keepers(ds, text_col: str, id_col: str):
    """Just the keeper ids (min id per distinct text) — the SQL-checkable
    core of exact dedup."""
    from ray.data.aggregate import Min

    hashed = ds.map_batches(add_sha1(text_col), batch_format="pyarrow")
    return (
        hashed.select_columns(["content_sha1", id_col])
        .groupby("content_sha1")
        .aggregate(Min(id_col, alias_name="doc_id"))
        .select_columns(["doc_id"])
    )


# --- MinHash + LSH --------------------------------------------------------


def make_minhash_batch(text_col: str, id_col: str, num_perm: int, n_bands: int,
                       shingle_k: int, seed: int = 1234):
    a, b = hx.minhash_params(num_perm, seed)

    def fn(batch: pa.Table) -> pa.Table:
        ids: List = []
        band_nos: List[int] = []
        band_vals: List[int] = []
        sigs: List[bytes] = []
        for i, t in zip(batch[id_col].to_pylist(), batch[text_col].to_pylist()):
            sig = hx.minhash_signature(hx.shingle_hashes(t or "", shingle_k), a, b)
            keys = hx.band_keys(sig, n_bands)
            sig_bytes = sig.tobytes()
            for bn, bv in enumerate(keys):
                ids.append(i)
                band_nos.append(bn)
                band_vals.append(bv)
                sigs.append(sig_bytes)
        return pa.table(
            {
                "id": pa.array(ids),
                "band_no": pa.array(band_nos, pa.int32()),
                "band_key": pa.array(band_vals, pa.int64()),
                "sig": pa.array(sigs, pa.binary()),
            }
        )

    return fn


def _empty_pairs_df() -> pd.DataFrame:
    """Typed empty pair frame so empty LSH buckets keep the int64/object
    schema (an untyped ``{"id_a": []}`` infers float64 and poisons the
    Dataset schema when the pairs stay distributed)."""
    return pd.DataFrame({
        "id_a": pd.Series([], dtype="int64"),
        "id_b": pd.Series([], dtype="int64"),
        "sig_a": pd.Series([], dtype=object),
        "sig_b": pd.Series([], dtype=object),
    })


def _pairs_from_band(group: pd.DataFrame) -> pd.DataFrame:
    """Candidate pairs within one (band_no, band_key) bucket; emits each pair
    once with a<b.  Hot buckets (all-identical boilerplate) fall back to a
    STAR pairing against the bucket-minimum id — O(n) pairs instead of
    O(n^2), and every member stays connected to the cluster root (a
    truncating cap would silently report members beyond it as unique)."""
    ids = sorted(set(group["id"].tolist()))
    if len(ids) < 2:
        return _empty_pairs_df()
    cap = 200  # quadratic-blowup guard for degenerate buckets
    sig_of = {}
    for i, s in zip(group["id"], group["sig"]):
        sig_of.setdefault(i, s)
    a_l, b_l, sa, sb = [], [], [], []
    if len(ids) <= cap:
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                a_l.append(ids[x]); b_l.append(ids[y])
                sa.append(sig_of[ids[x]]); sb.append(sig_of[ids[y]])
    else:
        root = ids[0]
        for y in ids[1:]:
            a_l.append(root); b_l.append(y)
            sa.append(sig_of[root]); sb.append(sig_of[y])
    return pd.DataFrame({"id_a": a_l, "id_b": b_l, "sig_a": sa, "sig_b": sb})


def minhash_near_dup_clusters(
    ds,
    text_col: str,
    id_col: str,
    num_perm: int = 64,
    n_bands: int = 16,
    shingle_k: int = 3,
    threshold: float = 0.8,
    seed: int = 1234,
) -> pd.DataFrame:
    """Full MinHash-LSH near-dup pipeline -> DataFrame (id, cluster_id).

    cluster_id = min id of the connected component under the "signature
    similarity >= threshold" relation.  Singleton docs get cluster_id = id.
    The candidate-pair list and the union-find run driver-side: the pair
    list is the post-LSH survivor set (tiny vs corpus); the scale path for a
    truly huge pair list is iterative min-label propagation with
    groupby(id) — same result, documented here as the swap-in.
    """
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
        # all buckets were singletons — no candidates at all
        pairs = pd.DataFrame({"id_a": [], "id_b": [], "sig_a": [], "sig_b": []})
    # verify by signature similarity (estimate of Jaccard)
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


def minhash_candidate_pairs(
    ds,
    text_col: str,
    id_col: str,
    num_perm: int = 64,
    n_bands: int = 16,
    shingle_k: int = 3,
    threshold: float = 0.8,
    seed: int = 1234,
    num_partitions: int = 32,
):
    """LSH candidate pairs verified by signature similarity — fully
    distributed, returned as a Dataset (id_a, id_b).

    A pair colliding in several bands is emitted once per band; duplicate
    edges are NOT deduped (that would cost a shuffle) because min-label
    propagation is idempotent over repeated edges — callers that need
    unique pairs dedup the (tiny) verified survivor set themselves.

    Bucket enumeration is PARTITION-level: buckets are co-located by a
    hash of (band_no, band_key) and iterated with a pandas groupby inside
    one task per partition — Ray's per-GROUP ``map_groups`` costs one
    Python task dispatch per bucket, measured ~10x slower at 80k buckets.
    """
    from .partition import with_hash_partition_int

    sig_ds = ds.map_batches(
        make_minhash_batch(text_col, id_col, num_perm, n_bands, shingle_k, seed),
        batch_format="pyarrow",
    )

    def add_bucket_key(batch: pa.Table) -> pa.Table:
        bno = batch["band_no"].to_numpy(zero_copy_only=False).astype(np.int64)
        bkey = batch["band_key"].to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.append_column(
            "_bkey", pa.array((bno << np.int64(32)) | bkey, pa.int64())
        )

    def pairs_from_partition(df: pd.DataFrame) -> pd.DataFrame:
        frames = [
            _pairs_from_band(g)
            for _, g in df.groupby(["band_no", "band_key"], sort=False)
        ]
        return pd.concat(frames, ignore_index=True) if frames else _empty_pairs_df()

    pairs = (
        with_hash_partition_int(
            sig_ds.map_batches(add_bucket_key, batch_format="pyarrow"),
            "_bkey",
            num_partitions,
        )
        .groupby("_part")
        .map_groups(pairs_from_partition, batch_format="pandas")
    )

    def verify(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table(
                {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())}
            )
        sa = np.frombuffer(b"".join(batch["sig_a"].to_pylist()), dtype=np.uint64)
        sb = np.frombuffer(b"".join(batch["sig_b"].to_pylist()), dtype=np.uint64)
        sim = (sa.reshape(n, -1) == sb.reshape(n, -1)).mean(axis=1)
        keep = pa.array(sim >= threshold)
        return pa.table({
            "id_a": batch["id_a"].cast(pa.int64()).filter(keep),
            "id_b": batch["id_b"].cast(pa.int64()).filter(keep),
        })

    return pairs.map_batches(verify, batch_format="pyarrow")


def propagate_min_labels(pairs_ds, num_partitions: int = 16, max_rounds: int = 30):
    """Connected components by iterative min-label propagation over an edge
    Dataset (id_a, id_b) -> Dataset (node, label) for every edge endpoint,
    label = min id of the component.

    Each round: broadcast-free label exchange — labels and symmetric edges
    are unioned, hash-partitioned on the node key, joined per partition with
    one vectorized pandas merge (NOT one Python call per node), then reduced
    with a Ray-native ``groupby(node).min``.  Labels decrease monotonically,
    so the (tiny) per-round label sum is a convergence certificate: equal
    sums <=> fixpoint.  Rounds are bounded by component diameter; the
    star-capped LSH buckets keep that small.  Everything is a Dataset — the
    driver only sees per-round scalar sums.
    """
    import ray.data as rd
    from ray.data.aggregate import Min

    from .partition import with_hash_partition_int

    def sym(batch: pa.Table) -> pa.Table:
        a = batch["id_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch["id_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "key": pa.array(np.concatenate([a, b]), pa.int64()),
            "dst": pa.array(np.concatenate([b, a]), pa.int64()),
        })

    edges = pairs_ds.map_batches(sym, batch_format="pyarrow").materialize()
    if edges.count() == 0:
        return rd.from_arrow(
            pa.table({"node": pa.array([], pa.int64()), "label": pa.array([], pa.int64())})
        )

    # round 0: label(node) = min(node, neighbors) straight off the edges
    def seed_labels(batch: pa.Table) -> pa.Table:
        return pa.table({
            "node": batch["key"],
            "label": pc.min_element_wise(batch["key"], batch["dst"]),
        })

    labels = (
        edges.map_batches(seed_labels, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Min("label", alias_name="label"))
        .materialize()
    )
    prev_sum = labels.sum("label")

    def tag_edges(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            "key": batch["key"],
            "dst": batch["dst"],
            "label": pa.nulls(n, pa.int64()),
        })

    def tag_labels(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            "key": batch["node"],
            "dst": pa.nulls(n, pa.int64()),
            "label": batch["label"],
        })

    def pjoin(df: pd.DataFrame) -> pd.DataFrame:
        lab = df[df["label"].notna()][["key", "label"]]
        ed = df[df["dst"].notna()][["key", "dst"]]
        sent = ed.merge(lab, on="key", how="inner")[["dst", "label"]]
        out = pd.concat(
            [lab.rename(columns={"key": "node"}), sent.rename(columns={"dst": "node"})]
        )
        return pd.DataFrame({
            "node": out["node"].astype("int64"),
            "label": out["label"].astype("int64"),
        })

    def as_arrow(batch: pa.Table) -> pa.Table:
        # normalize block type: pandas map_groups output must not mix with
        # arrow blocks in a downstream union/groupby (Ray's sort sampler
        # asserts homogeneous block types)
        return batch

    tagged_edges = edges.map_batches(tag_edges, batch_format="pyarrow").materialize()
    for _ in range(max_rounds):
        u = tagged_edges.union(labels.map_batches(tag_labels, batch_format="pyarrow"))
        labels = (
            with_hash_partition_int(u, "key", num_partitions)
            .groupby("_part")
            .map_groups(pjoin, batch_format="pandas")
            .map_batches(as_arrow, batch_format="pyarrow")
            .groupby("node")
            .aggregate(Min("label", alias_name="label"))
            .materialize()
        )
        cur_sum = labels.sum("label")
        if cur_sum == prev_sum:
            return labels
        prev_sum = cur_sum
    raise RuntimeError(
        f"min-label propagation did not converge in {max_rounds} rounds "
        "(pathologically deep component chain — raise max_rounds)"
    )


def _unionfind_label_map(tables) -> Dict[int, int]:
    """Union-find (min-root) over pair tables -> {node: component_min}.
    Runs inside a Ray task for the small-pair-list fast path — NOT on the
    driver."""
    parent: Dict[int, int] = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for t in tables:
        if t.num_rows == 0 or "id_a" not in t.schema.names:
            continue  # empty partitions can surface as schema-less blocks
        for a, b in zip(t["id_a"].to_pylist(), t["id_b"].to_pylist()):
            ra, rb = find(a), find(b)
            if ra != rb:
                if rb < ra:
                    ra, rb = rb, ra
                parent[rb] = ra
    return {n: find(n) for n in parent}


def minhash_near_dup_clusters_ds(
    ds,
    text_col: str,
    id_col: str,
    num_perm: int = 64,
    n_bands: int = 16,
    shingle_k: int = 3,
    threshold: float = 0.8,
    seed: int = 1234,
    num_partitions: int = 16,
    pairs_inline_max: int = 5_000_000,
):
    """Scale path of :func:`minhash_near_dup_clusters`: identical labels
    (cluster_id = min id of the signature-similarity component; singletons
    get their own id) with ZERO whole-corpus driver materialization.

    Labeling strategy by verified-pair count (the LSH survivor set, orders
    of magnitude smaller than the corpus):
    - ``<= pairs_inline_max``: union-find inside ONE Ray task (pair blocks
      pulled by the task, never the driver), label map broadcast via
      ``ray.put`` into a corpus ``map_batches`` — two distributed ops total;
    - above it: iterative min-label propagation (:func:`propagate_min_labels`)
      plus a corpus-wide union+groupby-min — all Datasets, no single-node
      memory bound.
    Both produce the component-minimum label; parity is pinned by
    tests/test_dedup.py::TestDistributedClusters.
    """
    import ray
    from ray.data.aggregate import Min

    pairs = minhash_candidate_pairs(
        ds, text_col, id_col, num_perm, n_bands, shingle_k, threshold, seed
    ).materialize()
    n_pairs = pairs.count()

    if n_pairs <= pairs_inline_max:
        if n_pairs == 0:
            label_ref = ray.put({})
        else:

            def _uf_task(refs):
                # nested ObjectRefs are not auto-resolved; pull here (in the
                # task), never on the driver
                return _unionfind_label_map(ray.get(refs))

            label_ref = ray.remote(num_cpus=1)(_uf_task).remote(
                list(pairs.to_arrow_refs())
            )

        def assign(batch: pa.Table) -> pa.Table:
            m = ray.get(label_ref)
            ids = batch[id_col].cast(pa.int64())
            cl = [m.get(i, i) for i in ids.to_pylist()]
            return pa.table({"id": ids, "cluster_id": pa.array(cl, pa.int64())})

        # id-only projection: the label-assign pass must not re-read/decode
        # the text column
        return ds.select_columns([id_col]).map_batches(assign, batch_format="pyarrow")

    labels = propagate_min_labels(pairs, num_partitions=num_partitions)

    def base_rows(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].cast(pa.int64())
        return pa.table({"node": ids, "label": ids})

    out = (
        ds.select_columns([id_col])  # id-only projection, as in the fast path
        .map_batches(base_rows, batch_format="pyarrow")
        .union(labels)
        .groupby("node")
        .aggregate(Min("label", alias_name="cluster_id"))
    )
    return out.map_batches(
        lambda t: pa.table({"id": t["node"], "cluster_id": t["cluster_id"]}),
        batch_format="pyarrow",
    )


def ngram_jaccard_verify(
    ds,
    pairs_ds,
    text_col: str,
    id_col: str,
    k: int = 3,
    threshold: float = 0.5,
    num_partitions: int = 16,
):
    """Exact word-k-gram Jaccard verify of candidate pairs — distributed.

    The corpus is semi-joined against the (tiny) candidate-id set with a
    broadcast ``pc.is_in`` mask, shingle hash-sets are computed inside the
    read tasks, and pair scoring happens after two small hash-partitioned
    exchanges (by endpoint id, then by pair) — the driver never sees a text
    column.  Hash-set Jaccard equals string-set Jaccard up to blake2b-64
    collisions (~2^-64 per shingle pair).
    Returns Dataset (id_a, id_b, jaccard) with jaccard >= threshold.
    """
    import ray
    import ray.data as rd

    from .partition import with_hash_partition_int

    empty = pa.table({
        "id_a": pa.array([], pa.int64()),
        "id_b": pa.array([], pa.int64()),
        "jaccard": pa.array([], pa.float64()),
    })
    pairs = pairs_ds.materialize()
    if pairs.count() == 0:
        return rd.from_arrow(empty)

    cand_ids: set = set()
    for b in pairs.iter_batches(batch_format="pyarrow"):  # survivor set: tiny
        cand_ids.update(b["id_a"].to_pylist())
        cand_ids.update(b["id_b"].to_pylist())
    ids_ref = ray.put(pa.array(sorted(cand_ids), pa.int64()))

    sh_type = pa.list_(pa.uint64())

    def shingles_batch(batch: pa.Table) -> pa.Table:
        keys = ray.get(ids_ref)
        t = batch.filter(pc.is_in(batch[id_col].cast(pa.int64()), value_set=keys))
        sh = [hx.shingle_hashes(x or "", k).tolist() for x in t[text_col].to_pylist()]
        n = len(sh)
        return pa.table({
            "key": t[id_col].cast(pa.int64()),
            "id_a": pa.nulls(n, pa.int64()),
            "id_b": pa.nulls(n, pa.int64()),
            "sh": pa.array(sh, sh_type),
        })

    def side_rows(batch: pa.Table) -> pa.Table:
        a = batch["id_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch["id_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = 2 * len(a)
        return pa.table({
            "key": pa.array(np.concatenate([a, b]), pa.int64()),
            "id_a": pa.array(np.concatenate([a, a]), pa.int64()),
            "id_b": pa.array(np.concatenate([b, b]), pa.int64()),
            "sh": pa.nulls(n, sh_type),
        })

    docs = ds.map_batches(shingles_batch, batch_format="pyarrow")
    sides = pairs.map_batches(side_rows, batch_format="pyarrow")

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        has_sh = df["sh"].notna()
        sh_of = dict(zip(df.loc[has_sh, "key"], df.loc[has_sh, "sh"]))
        side = df[~has_sh]
        mapped = side["key"].map(sh_of)
        # an endpoint id absent from the corpus maps to NaN — drop that side
        # row here so score_pairs sees a one-sided (skippable) pair instead
        # of crashing on uint64(NaN)
        present = mapped.notna()
        side = side[present]
        return pd.DataFrame({
            "id_a": side["id_a"].astype("int64"),
            "id_b": side["id_b"].astype("int64"),
            "is_a_side": (side["key"] == side["id_a"]).astype("bool"),
            "sh": mapped[present],
        })

    step1 = (
        with_hash_partition_int(docs.union(sides), "key", num_partitions)
        .groupby("_part")
        .map_groups(attach, batch_format="pandas")
    )

    def score_pairs(df: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b, out_j = [], [], []
        for (ia, ib), g in df.groupby(["id_a", "id_b"]):
            sh_a = sh_b = None
            has_a = has_b = False
            for is_a, sh in zip(g["is_a_side"], g["sh"]):
                if is_a:
                    sh_a, has_a = sh, True
                else:
                    sh_b, has_b = sh, True
            if not (has_a and has_b):
                continue  # an endpoint was absent from the corpus: drop pair
            sa = np.asarray(sh_a, dtype=np.uint64)
            sb = np.asarray(sh_b, dtype=np.uint64)
            if sa.size == 0 and sb.size == 0:
                j = 1.0
            elif sa.size == 0 or sb.size == 0:
                j = 0.0
            else:
                inter = np.intersect1d(sa, sb, assume_unique=True).size
                j = inter / (sa.size + sb.size - inter)
            if j >= threshold:
                out_a.append(int(ia)); out_b.append(int(ib)); out_j.append(float(j))
        return pd.DataFrame({
            "id_a": pd.Series(out_a, dtype="int64"),
            "id_b": pd.Series(out_b, dtype="int64"),
            "jaccard": pd.Series(out_j, dtype="float64"),
        })

    def pair_key(batch: pa.Table) -> pa.Table:
        a = batch["id_a"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = batch["id_b"].to_numpy(zero_copy_only=False).astype(np.uint64)
        mixed = (a * np.uint64(0x9E3779B97F4A7C15) + b) & np.uint64(0xFFFFFFFFFFFFFFFF)
        return batch.append_column(
            "pair_key", pa.array(mixed.astype(np.int64), pa.int64())
        )

    out = (
        step1.map_batches(pair_key, batch_format="pyarrow")
        .map_batches(
            lambda t: t.append_column(
                "_part",
                pa.array(
                    (t["pair_key"].to_numpy(zero_copy_only=False).astype(np.uint64)
                     % np.uint64(num_partitions)).astype(np.int32),
                    pa.int32(),
                ),
            ).drop_columns(["pair_key"]),
            batch_format="pyarrow",
        )
        .groupby("_part")
        .map_groups(score_pairs, batch_format="pandas")
    )
    return out


# --- SimHash --------------------------------------------------------------


def make_simhash_batch(text_col: str, id_col: str):
    def fn(batch: pa.Table) -> pa.Table:
        sigs = [hx.simhash64(t or "") for t in batch[text_col].to_pylist()]
        return pa.table(
            {
                "id": batch[id_col],
                "simhash": pa.array(sigs, pa.int64()),
            }
        )

    return fn


def simhash_signatures(ds, text_col: str, id_col: str):
    return ds.map_batches(make_simhash_batch(text_col, id_col), batch_format="pyarrow")


def simhash_near_dup_pairs(ds, text_col: str, id_col: str, max_hamming: int = 3) -> pd.DataFrame:
    """4-band 16-bit bucket LSH over 63-bit simhashes, Hamming-verified."""
    sig = simhash_signatures(ds, text_col, id_col)

    def explode_bands(batch: pa.Table) -> pa.Table:
        ids, bnos, keys, sigs = [], [], [], []
        for i, s in zip(batch["id"].to_pylist(), batch["simhash"].to_pylist()):
            u = s & 0xFFFFFFFFFFFFFFFF  # unsigned view of the int64 simhash
            for bn in range(4):
                ids.append(i)
                bnos.append(bn)
                keys.append((u >> (16 * bn)) & 0xFFFF)
                sigs.append(s)
        return pa.table({
            "id": pa.array(ids), "band_no": pa.array(bnos, pa.int32()),
            "band_key": pa.array(keys, pa.int64()), "sim": pa.array(sigs, pa.int64()),
        })

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        rows = sorted(set(zip(g["id"], g["sim"])))
        a_l, b_l, h_l = [], [], []
        if len(rows) <= 200:
            candidates = (
                (rows[x], rows[y])
                for x in range(len(rows))
                for y in range(x + 1, len(rows))
            )
        else:  # hot bucket: star against the min id keeps O(n) + connectivity
            candidates = ((rows[0], rows[y]) for y in range(1, len(rows)))
        for (ia, sa), (ib, sb) in candidates:
            h = hx.hamming64(sa, sb)
            if h <= max_hamming:
                a_l.append(ia); b_l.append(ib); h_l.append(h)
        return pd.DataFrame({"id_a": a_l, "id_b": b_l, "hamming": h_l})

    out = (
        sig.map_batches(explode_bands, batch_format="pyarrow")
        .groupby(["band_no", "band_key"])
        .map_groups(pairs_in_bucket, batch_format="pandas")
        .to_pandas()
    )
    if len(out) == 0 or "id_a" not in out.columns:
        return pd.DataFrame({"id_a": [], "id_b": [], "hamming": []})
    return out.drop_duplicates(["id_a", "id_b"]).sort_values(["id_a", "id_b"]).reset_index(drop=True)


# --- embedding near-dup ---------------------------------------------------


def embedding_near_dup_pairs(
    ds, vec_col: str, id_col: str, threshold: float = 0.95, n_planes: int = 12, seed: int = 99,
) -> pd.DataFrame:
    """Random-hyperplane LSH buckets -> exact cosine verify within bucket.

    Shuffles (bucket, id, vec) once; vectors stay columnar.  For recall,
    uses 2 independent plane sets (a pair is checked if it collides in
    either).
    """
    first = ds.take(1)
    if not first:  # empty corpus -> no pairs (siblings behave the same)
        return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
    dim = len(first[0][vec_col])
    rng = np.random.default_rng(seed)
    planes = [rng.standard_normal((dim, n_planes)) for _ in range(2)]
    import ray

    planes_ref = ray.put(planes)

    def bucketize(batch: pa.Table) -> pa.Table:
        pls = ray.get(planes_ref)
        from ..functions.vectors import to_matrix

        vecs = to_matrix(batch[vec_col], dim=pls[0].shape[0])
        ids = batch[id_col].to_pylist()
        norms = np.linalg.norm(vecs, axis=1)
        norms[norms == 0] = 1.0
        unit = vecs / norms[:, None]
        out_ids, out_set, out_key, out_vec = [], [], [], []
        for si, pl in enumerate(pls):
            bits = (unit @ pl) > 0
            keys = bits.dot(1 << np.arange(bits.shape[1]))
            for i, k, v in zip(ids, keys, unit):
                out_ids.append(i); out_set.append(si); out_key.append(int(k))
                out_vec.append(v.tolist())
        return pa.table({
            "id": pa.array(out_ids), "plane_set": pa.array(out_set, pa.int32()),
            "bucket": pa.array(out_key, pa.int64()),
            "unit_vec": pa.array(out_vec, pa.list_(pa.float64())),
        })

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        rows = {i: v for i, v in zip(g["id"], g["unit_vec"])}
        ids = sorted(rows)
        a_l, b_l, c_l = [], [], []
        if len(ids) >= 2:
            mat = np.asarray([rows[i] for i in ids])
            if len(ids) <= 300:
                sims = mat @ mat.T
                for x in range(len(ids)):
                    for y in range(x + 1, len(ids)):
                        if sims[x, y] >= threshold:
                            a_l.append(ids[x]); b_l.append(ids[y]); c_l.append(float(sims[x, y]))
            else:  # hot bucket: star against the min id (O(n), keeps dups linked)
                sims = mat[1:] @ mat[0]
                for y, s in enumerate(sims, start=1):
                    if s >= threshold:
                        a_l.append(ids[0]); b_l.append(ids[y]); c_l.append(float(s))
        return pd.DataFrame({"id_a": a_l, "id_b": b_l, "cosine": c_l})

    out = (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby(["plane_set", "bucket"])
        .map_groups(verify, batch_format="pandas")
        .to_pandas()
    )
    if len(out) == 0 or "id_a" not in out.columns:
        return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
    return out.drop_duplicates(["id_a", "id_b"]).sort_values(["id_a", "id_b"]).reset_index(drop=True)
