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


def exact_dedup(
    ds,
    text_col: str,
    id_col: str,
    strategy: str = "auto",
    broadcast_max_rows: int = 2_000_000,
    num_partitions: int = 64,
):
    """ONE public exact-dedup entry point: one row per distinct text,
    keeper = min(id).

    Strategy (mirrors ``cfg.winners_strategy`` for url dedup):
    - ``"broadcast"``: shuffle only (hash, id) pairs through a tiny
      groupby, then filter payload rows in place with a broadcast
      keeper-id set (``ray.put`` once, vectorized ``pc.is_in`` per batch).
      Fastest while the keeper-id set fits driver/worker heap.
    - ``"shuffle"``: hash-partition full rows by content sha so copies
      co-locate, partition-local drop-duplicates — no driver-side set,
      works at any corpus size (:func:`exact_dedup_shuffle`).
    - ``"auto"`` (default): pick by ``ds.count()`` vs
      ``broadcast_max_rows``.  For fresh parquet reads ``count()`` is a
      metadata-only read; for already-transformed inputs pass an explicit
      strategy to avoid executing the upstream twice.
    """
    if strategy == "auto":
        strategy = "broadcast" if ds.count() <= broadcast_max_rows else "shuffle"
    if strategy == "shuffle":
        return exact_dedup_shuffle(ds, text_col, id_col, num_partitions)
    if strategy != "broadcast":
        raise ValueError(f"unknown exact_dedup strategy: {strategy!r}")

    import ray
    from ray.data.aggregate import Min

    hashed = ds.map_batches(add_sha1(text_col), batch_format="pyarrow")
    keepers = (
        hashed.select_columns(["content_sha1", id_col])
        .groupby("content_sha1")
        .aggregate(Min(id_col, alias_name="keeper_id"))
    )
    ref = ray.put(pa.array(keepers.to_pandas()["keeper_id"]))

    def keep(batch: pa.Table) -> pa.Table:
        ids = ray.get(ref)
        mask = pc.is_in(batch[id_col], value_set=ids.cast(batch[id_col].type))
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
    from .partition import with_hash_partition

    hashed = ds.map_batches(add_sha1(text_col), batch_format="pyarrow")
    parted = with_hash_partition(hashed, "content_sha1", num_partitions)

    def drop_dups(batch: pa.Table) -> pa.Table:
        # pyarrow kernel: rows carry the full payload (text) — keep them in
        # Arrow buffers and move winners with one ``take`` (the pandas
        # version pivoted every payload into Python objects)
        batch = batch.drop_columns(["_part"])
        sha = batch["content_sha1"].to_numpy(zero_copy_only=False)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, sha))
        s_sorted = sha[order]
        first = np.empty(len(order), dtype=bool)
        if len(order):
            first[0] = True
            first[1:] = s_sorted[1:] != s_sorted[:-1]
        return batch.take(pa.array(np.sort(order[first]), pa.int64()))

    return parted.groupby("_part").map_groups(drop_dups, batch_format="pyarrow")


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


def _pairs_from_band_arrays(ids: np.ndarray, sigs: np.ndarray):
    """Candidate pairs within one (band_no, band_key) bucket; emits each pair
    once with a<b.  ``ids`` must be ascending (repeats allowed — a doc's
    signature is deterministic, so any occurrence's sig works); ``sigs`` is
    aligned.  Hot buckets (all-identical boilerplate) fall back to a STAR
    pairing against the bucket-minimum id — O(n) pairs instead of O(n^2),
    and every member stays connected to the cluster root (a truncating cap
    would silently report members beyond it as unique)."""
    first = np.empty(len(ids), dtype=bool)
    first[0] = True
    first[1:] = ids[1:] != ids[:-1]
    u_ids, u_sigs = ids[first], sigs[first]
    k = len(u_ids)
    if k < 2:
        return [], [], [], []
    cap = 200  # quadratic-blowup guard for degenerate buckets
    if k <= cap:
        xi, yi = np.triu_indices(k, k=1)
    else:
        xi = np.zeros(k - 1, dtype=np.int64)
        yi = np.arange(1, k, dtype=np.int64)
    return (u_ids[xi].tolist(), u_ids[yi].tolist(),
            u_sigs[xi].tolist(), u_sigs[yi].tolist())


def _pairs_from_band(group: pd.DataFrame) -> pd.DataFrame:
    """Pandas wrapper over :func:`_pairs_from_band_arrays` — the per-bucket
    entry point the serial reference (tests/local_reference.py) maps over
    its bucket groups."""
    ids = group["id"].to_numpy().astype(np.int64)
    sigs = np.asarray(group["sig"].tolist(), dtype=object)
    order = np.argsort(ids, kind="stable")
    a_l, b_l, sa, sb = _pairs_from_band_arrays(ids[order], sigs[order])
    if not a_l:
        return _empty_pairs_df()
    return pd.DataFrame({"id_a": a_l, "id_b": b_l, "sig_a": sa, "sig_b": sb})


# NOTE: the driver-side union-find cluster labeler (whole-corpus id
# materialization) was quarantined to tests/local_reference.py in round 3 —
# the only importable clustering API is the distributed
# :func:`minhash_near_dup_clusters_ds`.


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

    _PAIRS_SCHEMA = pa.schema([
        ("id_a", pa.int64()), ("id_b", pa.int64()),
        ("sig_a", pa.binary()), ("sig_b", pa.binary()),
    ])

    def pairs_from_partition(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return _PAIRS_SCHEMA.empty_table()
        bk = part["_bkey"].to_numpy(zero_copy_only=False)
        ids = part["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        sigs = np.asarray(part["sig"].to_pylist(), dtype=object)
        order = np.lexsort((ids, bk))
        bk_s, ids_s, sigs_s = bk[order], ids[order], sigs[order]
        new_b = np.empty(len(bk_s), dtype=bool)
        new_b[0] = True
        new_b[1:] = bk_s[1:] != bk_s[:-1]
        starts = np.flatnonzero(new_b)
        a_l, b_l, sa, sb = [], [], [], []
        for s, e in zip(starts, np.append(starts[1:], len(bk_s))):
            a, b, x, y = _pairs_from_band_arrays(ids_s[s:e], sigs_s[s:e])
            a_l += a; b_l += b; sa += x; sb += y
        return pa.table({
            "id_a": pa.array(a_l, pa.int64()),
            "id_b": pa.array(b_l, pa.int64()),
            "sig_a": pa.array(sa, pa.binary()),
            "sig_b": pa.array(sb, pa.binary()),
        })

    pairs = (
        with_hash_partition_int(
            sig_ds.map_batches(add_bucket_key, batch_format="pyarrow"),
            "_bkey",
            num_partitions,
        )
        .groupby("_part")
        .map_groups(pairs_from_partition, batch_format="pyarrow")
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
    sums <=> fixpoint.  Everything is a Dataset — the driver only sees
    per-round scalar sums.

    Each round ALSO feeds every label row back in as a shortcut edge
    ``label -> node``, so a node additionally learns ``label(label(node))``
    — pointer jumping.  Convergence is therefore O(log diameter) rounds,
    not O(diameter): a chain of 10^6 links resolves in ~20 rounds, and the
    default ``max_rounds=30`` covers any component a physical corpus can
    produce (2^30-link chains).  Callers can still raise ``max_rounds``
    (plumbed through :func:`minhash_near_dup_clusters_ds`).
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

    def pjoin(part: pa.Table) -> pa.Table:
        # inner join of edge rows with label rows on key, all-numpy: label
        # keys are unique within the exchange (one label row per node), so
        # a sorted searchsorted probe replaces the hash merge
        lab = part.filter(pc.is_valid(part["label"]))
        ed = part.filter(pc.is_valid(part["dst"]))
        lk = lab["key"].to_numpy(zero_copy_only=False)
        lv = lab["label"].to_numpy(zero_copy_only=False)
        node = lk
        label = lv
        if ed.num_rows and len(lk):
            order = np.argsort(lk)
            lk_s, lv_s = lk[order], lv[order]
            ek = ed["key"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(lk_s, ek)
            ok = pos < len(lk_s)
            ok[ok] = lk_s[pos[ok]] == ek[ok]
            node = np.concatenate(
                [lk, ed["dst"].to_numpy(zero_copy_only=False)[ok]]
            )
            label = np.concatenate([lv, lv_s[pos[ok]]])
        return pa.table({
            "node": pa.array(node.astype(np.int64), pa.int64()),
            "label": pa.array(label.astype(np.int64), pa.int64()),
        })

    def tag_shortcut(batch: pa.Table) -> pa.Table:
        # label row (node, l) re-enters as edge l -> node: node then
        # receives label(l) in the same exchange (pointer jumping).
        # Self-labeled rows are skipped — their shortcut is the identity.
        t = batch.filter(pc.not_equal(batch["node"], batch["label"]))
        n = t.num_rows
        return pa.table({
            "key": t["label"],
            "dst": t["node"],
            "label": pa.nulls(n, pa.int64()),
        })

    tagged_edges = edges.map_batches(tag_edges, batch_format="pyarrow").materialize()
    for _ in range(max_rounds):
        u = tagged_edges.union(
            labels.map_batches(tag_labels, batch_format="pyarrow")
        ).union(labels.map_batches(tag_shortcut, batch_format="pyarrow"))
        labels = (
            with_hash_partition_int(u, "key", num_partitions)
            .groupby("_part")
            .map_groups(pjoin, batch_format="pyarrow")
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
    max_rounds: int = 30,
):
    """MinHash-LSH near-dup clustering -> Dataset (id, cluster_id):
    cluster_id = min id of the signature-similarity component; singletons
    get their own id.  ZERO whole-corpus driver materialization.  (The
    driver-side union-find twin lives in tests/local_reference.py as the
    parity reference.)

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

    labels = propagate_min_labels(
        pairs, num_partitions=num_partitions, max_rounds=max_rounds
    )

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

    _ATTACH_SCHEMA = pa.schema([
        ("id_a", pa.int64()), ("id_b", pa.int64()),
        ("is_a_side", pa.bool_()), ("sh", sh_type),
    ])

    def attach(part: pa.Table) -> pa.Table:
        # join side rows to their endpoint's shingle set: doc keys are
        # unique (one corpus row per id), so a sorted searchsorted probe +
        # pc.take on the LIST column replaces the dict map — the ragged
        # shingle buffers are never converted to Python
        has_sh = pc.is_valid(part["sh"])
        docs_t = part.filter(has_sh)
        side_t = part.filter(pc.invert(has_sh))
        if side_t.num_rows == 0 or docs_t.num_rows == 0:
            return _ATTACH_SCHEMA.empty_table()
        dk = docs_t["key"].to_numpy(zero_copy_only=False)
        order = np.argsort(dk)
        dk_s = dk[order]
        sk = side_t["key"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(dk_s, sk)
        ok = pos < len(dk_s)
        # an endpoint id absent from the corpus has no match — drop that
        # side row here so score_pairs sees a one-sided (skippable) pair
        ok[ok] = dk_s[pos[ok]] == sk[ok]
        kept = side_t.filter(pa.array(ok))
        doc_ix = order[pos[ok]]
        return pa.table({
            "id_a": kept["id_a"],
            "id_b": kept["id_b"],
            "is_a_side": pc.equal(kept["key"], kept["id_a"]),
            "sh": pc.take(docs_t["sh"], pa.array(doc_ix, pa.int64())),
        })

    step1 = (
        with_hash_partition_int(docs.union(sides), "key", num_partitions)
        .groupby("_part")
        .map_groups(attach, batch_format="pyarrow")
    )

    _SCORE_SCHEMA = pa.schema([
        ("id_a", pa.int64()), ("id_b", pa.int64()), ("jaccard", pa.float64()),
    ])

    def score_pairs(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return _SCORE_SCHEMA.empty_table()
        a = part["id_a"].to_numpy(zero_copy_only=False)
        b = part["id_b"].to_numpy(zero_copy_only=False)
        is_a = part["is_a_side"].to_numpy(zero_copy_only=False)
        sh_col = part["sh"].combine_chunks()
        values = sh_col.values.to_numpy(zero_copy_only=False)
        offsets = sh_col.offsets.to_numpy(zero_copy_only=False)
        order = np.lexsort((is_a, b, a))
        a_s, b_s, is_a_s = a[order], b[order], is_a[order]
        new_p = np.empty(len(a_s), dtype=bool)
        new_p[0] = True
        new_p[1:] = (a_s[1:] != a_s[:-1]) | (b_s[1:] != b_s[:-1])
        starts = np.flatnonzero(new_p)
        out_a, out_b, out_j = [], [], []
        for s, e in zip(starts, np.append(starts[1:], len(a_s))):
            rows_a = [i for i in range(s, e) if is_a_s[i]]
            rows_b = [i for i in range(s, e) if not is_a_s[i]]
            if not rows_a or not rows_b:
                continue  # an endpoint was absent from the corpus: drop pair
            ra, rb = order[rows_a[-1]], order[rows_b[-1]]
            sa = values[offsets[ra]:offsets[ra + 1]].astype(np.uint64)
            sb = values[offsets[rb]:offsets[rb + 1]].astype(np.uint64)
            if sa.size == 0 and sb.size == 0:
                j = 1.0
            elif sa.size == 0 or sb.size == 0:
                j = 0.0
            else:
                inter = np.intersect1d(sa, sb, assume_unique=True).size
                j = inter / (sa.size + sb.size - inter)
            if j >= threshold:
                out_a.append(int(a_s[s])); out_b.append(int(b_s[s]))
                out_j.append(float(j))
        return pa.table({
            "id_a": pa.array(out_a, pa.int64()),
            "id_b": pa.array(out_b, pa.int64()),
            "jaccard": pa.array(out_j, pa.float64()),
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
        .map_groups(score_pairs, batch_format="pyarrow")
    )
    return out


# --- pair dedup (shared by simhash / embedding) ---------------------------


def _dedup_pairs_ds(pairs_ds, value_col: str, value_type, num_partitions: int = 32):
    """Distributed pair dedup: hash-partition (id_a, id_b) rows on a mixed
    pair key, per-partition groupby-min of ``value_col`` — one thin shuffle
    of id/value triples, Dataset in, Dataset out.  ``min`` (not "first")
    makes the surviving value deterministic when a pair is emitted by
    several buckets/plane sets with ulp-level float differences.

    The result is materialized (pair sets are LSH survivor sets, orders of
    magnitude smaller than the corpus) and a zero-pair outcome is replaced
    by a typed empty Dataset: Ray derives NO schema from all-empty blocks
    — even typed ones — which would break downstream
    ``to_pandas``/parquet writes."""
    schema = pa.schema([
        ("id_a", pa.int64()), ("id_b", pa.int64()), (value_col, value_type)
    ])

    def add_part(batch: pa.Table) -> pa.Table:
        a = batch["id_a"].to_numpy(zero_copy_only=False).astype(np.int64).astype(np.uint64)
        b = batch["id_b"].to_numpy(zero_copy_only=False).astype(np.int64).astype(np.uint64)
        mixed = (a * np.uint64(0x9E3779B97F4A7C15) + b) & np.uint64(0xFFFFFFFFFFFFFFFF)
        mixed ^= mixed >> np.uint64(33)
        return batch.append_column(
            "_part", pa.array((mixed % np.uint64(num_partitions)).astype(np.int32), pa.int32())
        )

    def drop(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return schema.empty_table()
        a = part["id_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = part["id_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = part[value_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((v, b, a))
        a_s, b_s, v_s = a[order], b[order], v[order]
        first = np.empty(len(a_s), dtype=bool)
        first[0] = True
        first[1:] = (a_s[1:] != a_s[:-1]) | (b_s[1:] != b_s[:-1])
        # v is the innermost sort key, so the first row of each (a, b)
        # group carries the group minimum
        return pa.table({
            "id_a": pa.array(a_s[first], pa.int64()),
            "id_b": pa.array(b_s[first], pa.int64()),
            value_col: pa.array(v_s[first]).cast(value_type),
        })

    deduped = (
        pairs_ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(drop, batch_format="pyarrow")
        .map_batches(
            lambda t: t.select(schema.names).cast(schema), batch_format="pyarrow"
        )
        .materialize()
    )
    if deduped.count() == 0:
        import ray.data as rd

        return rd.from_arrow(schema.empty_table())
    return deduped


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


def _simhash_pairs_in_bucket(rows, max_hamming: int):
    """Hamming-verified pairs within one bucket.  ``rows``: sorted list of
    unique (id, simhash).  Hot buckets (>200) fall back to a STAR pairing
    against the bucket-minimum id — O(n) pairs, connectivity preserved.
    Module-level so the serial reference in tests/local_reference.py uses
    the identical kernel."""
    a_l, b_l, h_l = [], [], []
    if len(rows) <= 200:
        candidates = (
            (rows[x], rows[y])
            for x in range(len(rows))
            for y in range(x + 1, len(rows))
        )
    else:
        candidates = ((rows[0], rows[y]) for y in range(1, len(rows)))
    for (ia, sa), (ib, sb) in candidates:
        h = hx.hamming64(sa, sb)
        if h <= max_hamming:
            a_l.append(ia); b_l.append(ib); h_l.append(h)
    return a_l, b_l, h_l


def simhash_near_dup_pairs(
    ds, text_col: str, id_col: str, max_hamming: int = 3, num_partitions: int = 32
):
    """4-band 16-bit bucket LSH over 63-bit simhashes, Hamming-verified —
    fully distributed, Dataset (id_a, id_b, hamming) out.

    Same shape as :func:`minhash_candidate_pairs`: band rows are exploded
    VECTORIZED (numpy shifts, no per-row Python), buckets co-locate by a
    hash of the combined (band_no, band_key) key, and one task per
    PARTITION enumerates its buckets with a pandas groupby (per-bucket
    ``map_groups`` measured ~10x slower at 80k buckets).  Cross-band
    duplicate pairs are removed by :func:`_dedup_pairs_ds` (a second thin
    shuffle of id/hamming triples).  Nothing reaches the driver.
    """
    sig = simhash_signatures(ds, text_col, id_col)

    def explode_bands(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        sim = batch["simhash"].to_numpy(zero_copy_only=False).astype(np.int64)
        u = sim.view(np.uint64)
        n = len(ids)
        shifts = np.uint64(16) * np.arange(4, dtype=np.uint64)
        keys = ((u[:, None] >> shifts) & np.uint64(0xFFFF)).astype(np.int64)  # n x 4
        band_no = np.tile(np.arange(4, dtype=np.int64), n)
        return pa.table({
            "id": pa.array(np.repeat(ids, 4), pa.int64()),
            "_bkey": pa.array((band_no << np.int64(16)) | keys.reshape(-1), pa.int64()),
            "sim": pa.array(np.repeat(sim, 4), pa.int64()),
        })

    _HAM_SCHEMA = pa.schema([
        ("id_a", pa.int64()), ("id_b", pa.int64()), ("hamming", pa.int64()),
    ])

    def pairs_from_partition(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return _HAM_SCHEMA.empty_table()
        bk = part["_bkey"].to_numpy(zero_copy_only=False)
        ids = part["id"].to_numpy(zero_copy_only=False)
        sim = part["sim"].to_numpy(zero_copy_only=False)
        order = np.lexsort((sim, ids, bk))
        bk_s, ids_s, sim_s = bk[order], ids[order], sim[order]
        n = len(bk_s)
        # unique (bucket, id, sim) rows — a doc's simhash is deterministic,
        # so this is the sorted(set(zip(id, sim))) of the per-bucket slice
        first = np.empty(n, dtype=bool)
        first[0] = True
        first[1:] = (
            (bk_s[1:] != bk_s[:-1]) | (ids_s[1:] != ids_s[:-1])
            | (sim_s[1:] != sim_s[:-1])
        )
        bk_u, ids_u, sim_u = bk_s[first], ids_s[first], sim_s[first]
        new_b = np.empty(len(bk_u), dtype=bool)
        new_b[0] = True
        new_b[1:] = bk_u[1:] != bk_u[:-1]
        starts = np.flatnonzero(new_b)
        a_l, b_l, h_l = [], [], []
        for s, e in zip(starts, np.append(starts[1:], len(bk_u))):
            if e - s < 2:
                continue
            rows = list(zip(ids_u[s:e].tolist(), sim_u[s:e].tolist()))
            a, b, h = _simhash_pairs_in_bucket(rows, max_hamming)
            a_l.extend(a); b_l.extend(b); h_l.extend(h)
        return pa.table({
            "id_a": pa.array(a_l, pa.int64()),
            "id_b": pa.array(b_l, pa.int64()),
            "hamming": pa.array(h_l, pa.int64()),
        })

    from .partition import with_hash_partition_int

    pairs = (
        with_hash_partition_int(
            sig.map_batches(explode_bands, batch_format="pyarrow"),
            "_bkey",
            num_partitions,
        )
        .groupby("_part")
        .map_groups(pairs_from_partition, batch_format="pyarrow")
    )
    return _dedup_pairs_ds(pairs, "hamming", pa.int64(), num_partitions)


# --- embedding near-dup ---------------------------------------------------


def _cosine_pairs_in_bucket(ids, mat, threshold: float):
    """Cosine-verified pairs within one bucket.  ``ids``: sorted unique id
    list; ``mat``: unit vectors in the same order.  <=300 members: full
    upper-triangle matmul; hot buckets: star against the min id (O(n),
    keeps dups linked).  Module-level so the serial reference in
    tests/local_reference.py uses the identical kernel."""
    a_l, b_l, c_l = [], [], []
    n = len(ids)
    if n < 2:
        return a_l, b_l, c_l
    ids = np.asarray(ids, dtype=np.int64)
    if n <= 300:
        sims = mat @ mat.T
        xi, yi = np.triu_indices(n, k=1)
        vals = sims[xi, yi]
        hit = vals >= threshold
        a_l = ids[xi[hit]].tolist()
        b_l = ids[yi[hit]].tolist()
        c_l = vals[hit].tolist()
    else:
        sims = mat[1:] @ mat[0]
        hit = sims >= threshold
        b_l = ids[1:][hit].tolist()
        a_l = [int(ids[0])] * len(b_l)
        c_l = sims[hit].tolist()
    return a_l, b_l, c_l


def embedding_near_dup_pairs(
    ds,
    vec_col: str,
    id_col: str,
    threshold: float = 0.95,
    n_planes: int = 12,
    seed: int = 99,
    num_partitions: int = 32,
):
    """Random-hyperplane LSH buckets -> exact cosine verify within bucket —
    fully distributed, Dataset (id_a, id_b, cosine) out.

    Recall comes from 2 independent plane sets (a pair is checked if it
    collides in either).  Each unit vector is computed ONCE and carried on
    a single row with BOTH bucket-key columns (b0, b1) — the round-2
    version exploded one row per plane set in a per-row Python loop (2x
    materialized volume).  The bucketized table is materialized once, then
    each plane set pays one thin hash-partition exchange keyed on its
    bucket column; per-PARTITION pandas groupbys enumerate the buckets
    (star-capped, as in minhash).  Duplicate pairs across the two sets are
    merged by :func:`_dedup_pairs_ds` with min(cosine) — deterministic even
    when the two buckets' matmuls differ at the ulp.  The driver never sees
    a pair or a vector.
    """
    import ray
    import ray.data as rd

    from .partition import with_hash_partition_int

    empty = pa.table({
        "id_a": pa.array([], pa.int64()),
        "id_b": pa.array([], pa.int64()),
        "cosine": pa.array([], pa.float64()),
    })
    first = ds.take(1)
    if not first:  # empty corpus -> no pairs
        return rd.from_arrow(empty)
    dim = len(first[0][vec_col])
    rng = np.random.default_rng(seed)
    planes = [rng.standard_normal((dim, n_planes)) for _ in range(2)]
    planes_ref = ray.put(planes)

    def bucketize(batch: pa.Table) -> pa.Table:
        pls = ray.get(planes_ref)
        from ..functions.vectors import to_matrix

        vecs = to_matrix(batch[vec_col], dim=dim)
        norms = np.linalg.norm(vecs, axis=1)
        norms[norms == 0] = 1.0
        unit = vecs / norms[:, None]
        weights = 1 << np.arange(n_planes)
        b0 = ((unit @ pls[0]) > 0).dot(weights).astype(np.int64)
        b1 = ((unit @ pls[1]) > 0).dot(weights).astype(np.int64)
        return pa.table({
            "id": batch[id_col].cast(pa.int64()),
            "b0": pa.array(b0, pa.int64()),
            "b1": pa.array(b1, pa.int64()),
            "unit_vec": pa.FixedSizeListArray.from_arrays(
                pa.array(unit.reshape(-1), pa.float64()), dim
            ),
        })

    bucketized = ds.map_batches(bucketize, batch_format="pyarrow").materialize()

    _COS_SCHEMA = pa.schema([
        ("id_a", pa.int64()), ("id_b", pa.int64()), ("cosine", pa.float64()),
    ])

    def pairs_from_partition(part: pa.Table, bucket_col: str) -> pa.Table:
        if part.num_rows == 0:
            return _COS_SCHEMA.empty_table()
        from ..functions.vectors import to_matrix

        bk = part[bucket_col].to_numpy(zero_copy_only=False)
        ids = part["id"].to_numpy(zero_copy_only=False)
        mat = to_matrix(part["unit_vec"])
        order = np.lexsort((ids, bk))
        bk_s, ids_s, mat_s = bk[order], ids[order], mat[order]
        new_b = np.empty(len(bk_s), dtype=bool)
        new_b[0] = True
        new_b[1:] = bk_s[1:] != bk_s[:-1]
        starts = np.flatnonzero(new_b)
        a_l, b_l, c_l = [], [], []
        for s, e in zip(starts, np.append(starts[1:], len(bk_s))):
            if e - s < 2:
                continue
            a, b, c = _cosine_pairs_in_bucket(
                ids_s[s:e].tolist(), mat_s[s:e], threshold)
            a_l.extend(a); b_l.extend(b); c_l.extend(c)
        return pa.table({
            "id_a": pa.array(a_l, pa.int64()),
            "id_b": pa.array(b_l, pa.int64()),
            "cosine": pa.array(c_l, pa.float64()),
        })

    import functools

    per_set = []
    for bucket_col in ("b0", "b1"):
        per_set.append(
            with_hash_partition_int(bucketized, bucket_col, num_partitions)
            .groupby("_part")
            .map_groups(
                functools.partial(pairs_from_partition, bucket_col=bucket_col),
                batch_format="pyarrow",
            )
        )
    return _dedup_pairs_ds(
        per_set[0].union(per_set[1]), "cosine", pa.float64(), num_partitions
    )


def fuzzy_dedup_keepers(
    ds,
    text_col: str,
    id_col: str,
    strategy: str = "broadcast",
    num_partitions: int = 16,
    **minhash_kw,
):
    """End-to-end near-dup dedup: the corpus minus MinHash-LSH losers.

    Composes :func:`minhash_near_dup_clusters_ds` (cluster label = min id
    of the similarity component) with winner selection — the cluster
    representative is the member whose id IS the label, every other member
    is a loser — and a corpus filter that keeps all original columns.
    This is the "give me the deduplicated corpus" operator (GPT-3 /
    Gopher-style fuzzy dedup); the clustering/query building blocks stay
    available separately.

    ``strategy``:

    * ``"broadcast"`` (default) — loser ids (a small fraction of the
      corpus at near-dup thresholds) are concatenated into ONE sorted
      int64 array inside a Ray task, ``ray.put`` once, and every filter
      task drops members via a zero-copy ``searchsorted`` probe.  Corpus
      payload bytes never enter an all-to-all.
    * ``"shuffle"`` — tagged-union anti-join co-partitioned on id, for
      corpora whose duplicate fraction is too large for a broadcast array
      (ships payload bytes through one exchange, but never concentrates
      loser ids on one node).
    """
    import ray

    from .partition import with_hash_partition_int

    clusters = minhash_near_dup_clusters_ds(
        ds, text_col, id_col, num_partitions=num_partitions, **minhash_kw
    )

    def loser_rows(batch: pa.Table) -> pa.Table:
        lose = pc.not_equal(batch["id"], batch["cluster_id"])
        return pa.table({"id": batch["id"].filter(lose)})

    losers = clusters.map_batches(loser_rows, batch_format="pyarrow")

    if strategy == "broadcast":
        def _gather(refs):
            tables = ray.get(refs)
            ids = np.concatenate(
                [t["id"].to_numpy(zero_copy_only=False) for t in tables]
                or [np.array([], dtype=np.int64)]
            )
            return np.sort(ids.astype(np.int64))

        loser_ref = ray.remote(num_cpus=1)(_gather).remote(
            list(losers.materialize().to_arrow_refs())
        )

        def keep(batch: pa.Table) -> pa.Table:
            loser_ids = ray.get(loser_ref)  # zero-copy plasma read
            ids = batch[id_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
            pos = np.searchsorted(loser_ids, ids)
            pos_c = np.minimum(pos, max(len(loser_ids) - 1, 0))
            member = (
                (pos < len(loser_ids)) & (loser_ids[pos_c] == ids)
                if len(loser_ids)
                else np.zeros(len(ids), dtype=bool)
            )
            return batch.filter(pa.array(~member))

        return ds.map_batches(keep, batch_format="pyarrow")

    if strategy != "shuffle":
        raise ValueError(f"unknown strategy {strategy!r}")

    # anti-join: corpus rows tagged _lose=0, loser ids tagged _lose=1,
    # co-partitioned on id; each partition drops ids with any loser row.
    # Schema captured EAGERLY as plain (name, type) pairs — referencing the
    # Dataset inside a closure would serialize the whole plan per task.
    sch = ds.schema()
    col_types = list(zip(sch.names, sch.types))
    cols = [n for n, _ in col_types]

    def tag_corpus(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_lose", pa.array(np.zeros(batch.num_rows, dtype=np.int8))
        )

    def tag_losers(batch: pa.Table) -> pa.Table:
        t = pa.table({id_col: batch["id"].cast(pa.int64())})
        for c, typ in col_types:
            if c != id_col:
                t = t.append_column(c, pa.nulls(batch.num_rows, typ))
        return t.select(cols).append_column(
            "_lose", pa.array(np.ones(batch.num_rows, dtype=np.int8))
        )

    tagged = ds.map_batches(tag_corpus, batch_format="pyarrow").union(
        losers.map_batches(tag_losers, batch_format="pyarrow")
    )
    parts = with_hash_partition_int(tagged, id_col, num_partitions)

    def anti(t: pa.Table) -> pa.Table:
        lose_mask = t["_lose"].to_numpy(zero_copy_only=False) == 1
        loser_ids = np.sort(
            t.filter(pa.array(lose_mask))[id_col].to_numpy(zero_copy_only=False)
        )
        body = t.filter(pa.array(~lose_mask))
        ids = body[id_col].to_numpy(zero_copy_only=False)
        if len(loser_ids):
            pos = np.searchsorted(loser_ids, ids)
            pos_c = np.minimum(pos, len(loser_ids) - 1)
            member = (pos < len(loser_ids)) & (loser_ids[pos_c] == ids)
        else:
            member = np.zeros(len(ids), dtype=bool)
        return body.filter(pa.array(~member)).drop_columns(["_lose", "_part"])

    return parts.groupby("_part").map_groups(anti, batch_format="pyarrow")


def _text_digests(texts) -> np.ndarray:
    """blake2b 8-byte digest per full text, as uint64 (hashlib rounds run
    in C; the loop is encode + slice, the same budget as the shingle /
    paragraph hash kernels)."""
    from hashlib import blake2b

    return np.array(
        [
            int.from_bytes(
                blake2b((t or "").encode("utf-8"), digest_size=8).digest(),
                "little",
            )
            for t in texts
        ],
        dtype=np.uint64,
    )


def build_text_digest_index(ds, text_col: str):
    """Sorted uint64 content-digest index of a corpus snapshot — the
    broadcast side of cross-snapshot incremental dedup (CCNet / FineWeb
    style: dedup each new crawl dump against the previous dumps).

    Digests are computed inside the read tasks (the text column never
    leaves them), concatenated and sorted in ONE Ray task, and the
    returned ``ObjectRef`` is read zero-copy from the local object store
    by every probe task — the driver never materializes the array.  8
    bytes/doc: a 10^9-doc prior snapshot is an 8 GB broadcast, the
    practical ceiling; beyond that, dedup the union of snapshots with
    :func:`exact_dedup_shuffle` (co-partition anti-join, no index).
    """
    def digest_batch(batch: pa.Table) -> pa.Table:
        h = _text_digests(batch[text_col].to_pylist())
        return pa.table({"h": pa.array(h.view(np.int64), pa.int64())})

    return _gather_sorted_u64(ds.map_batches(digest_batch, batch_format="pyarrow"))


def _gather_sorted_u64(h_ds):
    """Collect a Dataset with one int64 ``h`` column into a single sorted,
    deduplicated uint64 array inside a Ray task (8 B/value partials; the
    driver never sees the array).  Returns the ``ObjectRef``."""
    import ray

    refs = list(h_ds.materialize().to_arrow_refs())

    def _gather(rs):
        ts = [t for t in ray.get(rs) if t.num_rows and "h" in t.schema.names]
        if not ts:
            return np.array([], dtype=np.uint64)
        h = np.concatenate(
            [t["h"].to_numpy(zero_copy_only=False) for t in ts]
        ).astype(np.int64).view(np.uint64)
        return np.unique(h)  # sorted + deduplicated

    return ray.remote(num_cpus=1)(_gather).remote(refs)


def _sorted_member(idx: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """Vectorized membership of ``keys`` in the sorted array ``idx``."""
    if not len(idx):
        return np.zeros(len(keys), dtype=bool)
    pos = np.searchsorted(idx, keys)
    pos_c = np.minimum(pos, len(idx) - 1)
    return (pos < len(idx)) & (idx[pos_c] == keys)


def dedup_against_index(ds, text_col: str, index_ref):
    """Map-only filter: drop rows whose text digest is in the prior
    snapshot's index (:func:`build_text_digest_index`).  All input columns
    pass through; new-content rows are untouched.  Exact up to 64-bit
    digest collisions (~2^-25 per 10^9 distinct texts — the documented
    approximation shared by the sketch family)."""
    import ray

    def keep(batch: pa.Table) -> pa.Table:
        idx = ray.get(index_ref)  # zero-copy plasma read
        h = _text_digests(batch[text_col].to_pylist())
        member = _sorted_member(idx, h)
        return batch.filter(pa.array(~member))

    return ds.map_batches(keep, batch_format="pyarrow")


def _band_keys64(sig: np.ndarray, n_bands: int) -> np.ndarray:
    """Full 64-bit per-band bucket keys with the band number mixed in
    (blake2b over band-no + band bytes).  The clustering path's crc32
    ``hashing.band_keys`` is acceptable there because a bucket collision
    only gates a Jaccard VERIFY; an index probe has no verify step, so
    31-bit keys would false-drop at crawl scale (10^9 docs x 16 bands
    saturates 2^31 many times over)."""
    from hashlib import blake2b

    rows = len(sig) // n_bands
    return np.array(
        [
            int.from_bytes(
                blake2b(
                    bi.to_bytes(4, "little")
                    + np.ascontiguousarray(sig[bi * rows : (bi + 1) * rows]).tobytes(),
                    digest_size=8,
                ).digest(),
                "little",
            )
            for bi in range(n_bands)
        ],
        dtype=np.uint64,
    )


def build_minhash_band_index(
    ds,
    text_col: str,
    *,
    num_perm: int = 128,
    n_bands: int = 16,
    shingle_k: int = 3,
    seed: int = 1234,
):
    """LSH band-key index of a prior corpus snapshot — the broadcast side
    of cross-snapshot NEAR-dup dedup (the fuzzy sibling of
    :func:`build_text_digest_index`; FineWeb applies exactly this shape
    per crawl dump).  Band keys are computed inside the read tasks,
    gathered/sorted once, and broadcast as one sorted uint64 array.

    ``n_bands`` x 8 B/doc (128 B at the defaults): the practical broadcast
    ceiling is ~10^8 prior docs; beyond that, near-dedup the union of
    snapshots with :func:`fuzzy_dedup_keepers` (shuffle path, no index).
    Docs with no shingles (empty / whitespace-only) are never indexed —
    they carry no content to near-dup on."""
    a, b = hx.minhash_params(num_perm, seed)

    def keys_batch(batch: pa.Table) -> pa.Table:
        out = []
        for t in batch[text_col].to_pylist():
            sh = hx.shingle_hashes(t or "", shingle_k)
            if sh.size == 0:
                continue
            out.append(_band_keys64(hx.minhash_signature(sh, a, b), n_bands))
        h = np.concatenate(out) if out else np.array([], dtype=np.uint64)
        return pa.table({"h": pa.array(h.view(np.int64), pa.int64())})

    return _gather_sorted_u64(ds.map_batches(keys_batch, batch_format="pyarrow"))


def dedup_against_minhash_index(
    ds,
    text_col: str,
    index_ref,
    *,
    num_perm: int = 128,
    n_bands: int = 16,
    shingle_k: int = 3,
    seed: int = 1234,
    min_matching_bands: int = 1,
):
    """Map-only near-dup filter of a new crawl against a prior snapshot's
    band-key index (:func:`build_minhash_band_index` with the SAME
    num_perm / n_bands / shingle_k / seed).  A row drops when at least
    ``min_matching_bands`` of its band keys hit the index.

    Bucket-collision dedup with no pairwise verify (the FineWeb trade):
    P(one band hits) = s^(num_perm/n_bands) for true Jaccard s, so the
    defaults (128/16 -> 8 rows/band) give an S-curve centered near
    s ~ 0.77; raise ``min_matching_bands`` to trade recall for precision.
    Docs with no shingles never drop.  The new crawl never shuffles."""
    import ray

    a, b = hx.minhash_params(num_perm, seed)

    def keep(batch: pa.Table) -> pa.Table:
        idx = ray.get(index_ref)
        texts = batch[text_col].to_pylist()
        member = np.zeros(len(texts), dtype=bool)
        if len(idx):
            for i, t in enumerate(texts):
                sh = hx.shingle_hashes(t or "", shingle_k)
                if sh.size == 0:
                    continue
                keys = _band_keys64(hx.minhash_signature(sh, a, b), n_bands)
                member[i] = _sorted_member(idx, keys).sum() >= min_matching_bands
        return batch.filter(pa.array(~member))

    return ds.map_batches(keep, batch_format="pyarrow")


def build_text_bloom_index(ds, text_col: str, *, n_bits: int = 1 << 27, k: int = 5):
    """Memory-BOUNDED exact-dedup index: a Bloom filter over full-text
    digests — the swap for :func:`build_text_digest_index` when the prior
    snapshot exceeds the 8 B/doc broadcast budget.  Broadcast size is
    ``n_bits/8`` bytes REGARDLESS of corpus count (16 MB at 2^27).

    One-sided error: a true duplicate is NEVER kept (no false negatives);
    new content may be falsely dropped at the classic
    ``(1 - e^(-k*n/n_bits))^k`` rate — the CCNet trade (losing ~0.1% of
    genuinely-new pages is acceptable at crawl scale; re-emitting
    duplicates is not).  Size ``n_bits >= ~14x`` the prior doc count for
    ~0.1% FP at k=5.

    Digest partials (8 B/doc) stream one-at-a-time through a single build
    task that sets bits incrementally, so peak memory there is one partial
    + the bitset; only the bitset broadcasts."""
    import ray

    from ..functions.sketches import BloomFilter

    def digest_batch(batch: pa.Table) -> pa.Table:
        h = _text_digests(batch[text_col].to_pylist())
        return pa.table({"h": pa.array(h.view(np.int64), pa.int64())})

    refs = list(
        ds.map_batches(digest_batch, batch_format="pyarrow")
        .materialize()
        .to_arrow_refs()
    )

    def _build(rs):
        bf = BloomFilter(n_bits, k)
        for r in rs:
            t = ray.get(r)  # one partial resident at a time
            if t.num_rows and "h" in t.schema.names:
                h = t["h"].to_numpy(zero_copy_only=False).astype(np.int64)
                bf.add_hashes(h.view(np.uint64))
        return bf

    return ray.remote(num_cpus=1)(_build).remote(refs)


def dedup_against_bloom_index(ds, text_col: str, bloom_ref):
    """Map-only probe of :func:`build_text_bloom_index`: drop rows whose
    text digest tests positive (every true duplicate drops; new content
    survives except at the filter's documented false-positive rate)."""
    import ray

    def keep(batch: pa.Table) -> pa.Table:
        bf = ray.get(bloom_ref)
        h = _text_digests(batch[text_col].to_pylist())
        member = bf.contains_hashes(h)
        return batch.filter(pa.array(~member))

    return ds.map_batches(keep, batch_format="pyarrow")
