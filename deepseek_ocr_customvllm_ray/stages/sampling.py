"""Deterministic corpus sampling — the training-data operator that picks a
reproducible subset of a crawl without a shuffle or a global pass.

Selection is a pure per-row predicate on ``md5(f"{seed}:{id}")``: keep the
row iff the first 8 hex chars of the digest compare below a threshold
derived from the requested fraction.  Properties that matter at 100 TB:

- **map-only**: no shuffle, no global state, no coordination — each block
  filters independently, so the op composes with any pipeline position;
- **reproducible**: same (seed, fraction) -> same subset on any cluster
  shape, any block order, any retry;
- **consistent across runs**: growing the fraction strictly grows the
  subset (thresholds nest), so a 1% pilot sample is a subset of the 10%
  production sample;
- **oracle-friendly**: DuckDB's ``md5(CAST(id AS VARCHAR))`` produces the
  identical digest, making the operator independently SQL-checkable.

The effective rate quantizes to 1/2^32 granularity (8 hex chars).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

#: number of leading hex chars compared against the threshold
_PREFIX = 8


def _threshold_hex(fraction: float) -> str:
    """fraction in [0, 1] -> exclusive upper bound for the hex digest
    prefix.  fraction == 1.0 returns ``"g"``, which sorts after every hex
    string, so the comparison keeps ALL rows (a clamped ``"ffffffff"``
    would drop digests equal to it)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    bound = int(fraction * 16**_PREFIX)
    if bound >= 16**_PREFIX:
        return "g"
    return format(bound, f"0{_PREFIX}x")


def _digests(ids, seed: int) -> pa.Array:
    """8-hex-char md5 prefixes of ``f"{seed}:{id}"`` (hashlib runs the md5
    rounds in C; the per-row loop is only string formatting)."""
    pre = f"{seed}:".encode()
    return pa.array(
        [hashlib.md5(pre + str(i).encode()).hexdigest()[:_PREFIX] for i in ids],
        pa.string(),
    )


def make_hash_sample_batch(id_col: str, fraction: float, seed: int = 42):
    """``map_batches`` filter: keep rows whose id-digest falls below the
    fraction threshold.  All columns pass through."""
    thr = _threshold_hex(fraction)

    def fn(batch: pa.Table) -> pa.Table:
        digs = _digests(batch[id_col].to_pylist(), seed)
        return batch.filter(pc.less(digs, thr))

    return fn


def hash_sample(ds, id_col: str, fraction: float, seed: int = 42):
    """``Dataset -> Dataset`` deterministic uniform sample (map-only)."""
    return ds.map_batches(
        make_hash_sample_batch(id_col, fraction, seed), batch_format="pyarrow"
    )


def make_stratified_sample_batch(
    id_col: str, stratum_col: str, fractions: dict[str, float],
    default_fraction: float = 0.0, seed: int = 42,
):
    """Per-stratum sampling rates (e.g. keep 30% of ``en`` docs, 5% of the
    rest): the stratum column selects the threshold, the id digest decides.
    Thresholds are resolved vectorized (``index_in`` + ``take``); strata
    absent from ``fractions`` use ``default_fraction``."""
    strata = pa.array(list(fractions), pa.string())
    thresholds = pa.array(
        [_threshold_hex(f) for f in fractions.values()], pa.string()
    )
    default_thr = _threshold_hex(default_fraction)

    def fn(batch: pa.Table) -> pa.Table:
        idx = pc.index_in(batch[stratum_col], strata)
        thr = pc.fill_null(pc.take(thresholds, idx), default_thr)
        digs = _digests(batch[id_col].to_pylist(), seed)
        return batch.filter(pc.less(digs, thr))

    return fn


def stratified_sample(
    ds, id_col: str, stratum_col: str, fractions: dict[str, float],
    default_fraction: float = 0.0, seed: int = 42,
):
    """``Dataset -> Dataset`` deterministic stratified sample (map-only)."""
    return ds.map_batches(
        make_stratified_sample_batch(
            id_col, stratum_col, fractions, default_fraction, seed
        ),
        batch_format="pyarrow",
    )


def make_shuffle_key_batch(id_col: str, seed: int = 42, epoch: int = 0,
                           out_col: str = "shuffle_key"):
    """Append the 16-hex-char md5 sort key of ``f"{seed}:{epoch}:{id}"``."""
    pre = f"{seed}:{epoch}:".encode()

    def fn(batch: pa.Table) -> pa.Table:
        keys = pa.array(
            [
                hashlib.md5(pre + str(i).encode()).hexdigest()[:16]
                for i in batch[id_col].to_pylist()
            ],
            pa.string(),
        )
        return batch.append_column(out_col, keys)

    return fn


def epoch_shuffle(ds, id_col: str, seed: int = 42, epoch: int = 0,
                  keep_key: bool = False):
    """Deterministic global shuffle for training epochs.

    ``ds.random_shuffle`` is seeded but its output depends on block
    structure; training-data reproducibility wants a permutation that is a
    pure function of (seed, epoch, row).  A seeded md5 sort key gives
    exactly that, and Ray's distributed range sort performs the reorder —
    one all-to-all, the unavoidable cost of a true global shuffle.  Each
    epoch is an independent permutation (the key re-derives; nothing is
    cached or coordinated).

    The sort breaks 64-bit key collisions on ``id_col`` (at 10^10+ rows a
    shared 16-hex prefix is likely, and an untied sort would order those
    rows by block arrival — breaking the determinism contract).  The
    helper key column is dropped unless ``keep_key``."""
    out = ds.map_batches(
        make_shuffle_key_batch(id_col, seed, epoch), batch_format="pyarrow"
    ).sort(["shuffle_key", id_col])
    if not keep_key:
        out = out.drop_columns(["shuffle_key"])
    return out


def rebalance_groups(
    ds, group_col: str, id_col: str, weight_col: str, seed: int = 42,
):
    """Data-mixture rebalancing: downsample every group to the MASS of the
    smallest one (the "equal mixing weights" step of training-corpus
    assembly — e.g. cap every domain/source at the smallest source's token
    count).  Two map-only passes:

    1. a tiny per-batch partial aggregate (group, sum(weight)) folded on
       the driver — k rows for k groups, no shuffle;
    2. the existing stratified md5-threshold filter with
       ``rate_g = min_total / total_g`` — so expected kept mass is equal
       across groups, selection stays a pure function of (seed, row), and
       DuckDB re-derives the identical rates and thresholds end to end
       (``float``/``DOUBLE`` division and the ``floor(rate * 16^8)``
       threshold are the same IEEE-double ops on both engines).

    The smallest group gets rate exactly 1.0 (kept whole); weights must be
    non-negative.  Returns the filtered Dataset (all columns pass)."""

    def part(batch: pa.Table) -> pa.Table:
        df = batch.select([group_col, weight_col]).to_pandas()
        agg = df.groupby(group_col, sort=False)[weight_col].sum().reset_index()
        return pa.table({
            group_col: pa.array(agg[group_col].astype(str), pa.string()),
            "_w": pa.array(agg[weight_col].astype("int64"), pa.int64()),
        })

    totals = (
        ds.map_batches(part, batch_format="pyarrow")
        .to_pandas()
        .groupby(group_col)["_w"].sum()
    )
    if (totals < 0).any():
        raise ValueError("rebalance_groups requires non-negative weights")
    min_total = int(totals.min())
    rates = {g: float(min_total) / float(t) for g, t in totals.items()}
    return ds.map_batches(
        make_stratified_sample_batch(id_col, group_col, rates, seed=seed),
        batch_format="pyarrow",
    )


def group_hash_sample(
    ds, group_col: str, id_col: str, k: int, seed: int = 42,
    num_partitions: int = 32,
):
    """Deterministic k-per-group sample (a "hash reservoir": the fixed-k
    sibling of :func:`stratified_sample`'s fixed-RATE selection — balanced
    subsets for eval sets / per-domain probes).  Rows rank within their
    group by ``md5(f"{seed}:{id}")`` (id tie-break), keep the k smallest:
    a uniform-without-replacement draw per group that is a pure function
    of (seed, row) — any cluster shape, block order, or retry reproduces
    it, and DuckDB recomputes the identical digests
    (``QUALIFY row_number() OVER (PARTITION BY g ORDER BY md5, id) <= k``).

    One group-hash exchange; per-partition rank is the same vectorized
    lexsort + boundary arithmetic as ``urls.domain_quota`` (no per-group
    dispatch).  All input columns pass through."""
    import numpy as np
    import pandas as pd

    from .partition import with_hash_partition

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    def add_rank(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_rk", _digests(batch[id_col].to_pylist(), seed)
        )

    parts = with_hash_partition(
        ds.map_batches(add_rank, batch_format="pyarrow"), group_col, num_partitions
    )

    def cap(batch: pa.Table) -> pa.Table:
        # pyarrow kernel: all input columns pass through (payload-safe) —
        # winners move via one Arrow ``take``
        batch = batch.drop_columns(["_part"])
        if not batch.num_rows:
            return batch.drop_columns(["_rk"])
        grp = batch[group_col].to_numpy(zero_copy_only=False)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        rk = batch["_rk"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, rk, grp))
        g_s = grp[order]
        new_group = np.empty(len(g_s), dtype=bool)
        new_group[0] = True
        new_group[1:] = g_s[1:] != g_s[:-1]
        group_start = np.maximum.accumulate(
            np.where(new_group, np.arange(len(g_s)), 0)
        )
        rank = np.arange(len(g_s)) - group_start
        keep_sorted = order[rank < k]
        return batch.take(
            pa.array(np.sort(keep_sorted), pa.int64())
        ).drop_columns(["_rk"])

    return parts.groupby("_part").map_groups(cap, batch_format="pyarrow")


def make_split_assign_batch(id_col: str, splits: dict, seed: int = 42):
    """Deterministic named-split assignment (train/val/test):
    the id digest's position among cumulative weight boundaries picks the
    split — a pure function of (seed, id), so the assignment is stable
    across runs, cluster shapes, and later corpus additions (an id keeps
    its split forever; the standard training-data split contract).

    ``splits``: ordered {name: weight}, weights sum to 1.  All input
    columns pass through plus a ``split`` string column.  Map-only.
    """
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    if any(w < 0 for w in splits.values()):
        raise ValueError("split weights must be non-negative")
    names = list(splits)
    cum = 0.0
    bounds = []
    for name in names[:-1]:
        cum += splits[name]
        bounds.append(_threshold_hex(min(cum, 1.0)))
    bounds_np = np.array(bounds, dtype=object)
    names_np = np.array(names, dtype=object)

    def fn(batch: pa.Table) -> pa.Table:
        digs = np.asarray(
            _digests(batch[id_col].to_pylist(), seed).to_pylist(), dtype=object
        )
        idx = np.searchsorted(bounds_np, digs, side="right")
        return batch.append_column(
            "split", pa.array(names_np[idx], pa.string())
        )

    return fn


def split_assign(ds, id_col: str, splits: dict, seed: int = 42):
    """``Dataset -> Dataset`` with a deterministic ``split`` column."""
    return ds.map_batches(
        make_split_assign_batch(id_col, splits, seed), batch_format="pyarrow"
    )


def weighted_sample(ds, id_col: str, weight_col: str, k: int, seed: int = 42):
    """Deterministic weighted sample WITHOUT replacement (Efraimidis &
    Spirakis 2006): each row draws ``u = md5_uniform(seed, id)`` and ranks
    by the exponential key ``-ln(u) / w``; the k SMALLEST keys win, which
    selects rows with probability proportional to ``weight_col`` — the
    quality-weighted / length-weighted subset draw of corpus assembly.

    Properties at 100 TB (shared with the rest of the family):

    - **map-only + top-k**: each batch keeps its k best candidates (a
      ~k-row partial, so the final exchange sees k rows per block, not the
      corpus); the global resolve sorts the tiny survivor set;
    - **reproducible & nested**: keys are a pure function of (seed, row),
      so any cluster shape/retry reproduces the draw, and the size-k
      sample is a subset of the size-(k+1) sample (keys don't change);
    - **oracle-friendly**: ``u = CAST('0x' || substr(md5(seed:id), 1, 13)
      AS UBIGINT) / 2^52`` is exact in IEEE doubles, and DuckDB's
      ``-ln(u)/w`` evaluates the identical libm expression, so the SQL
      oracle re-derives the same ranking (ties broken on id).

    Rows with null or non-positive weight are excluded (an exponential
    with rate <= 0 is undefined).  ``u == 0`` (probability 2^-52) maps to
    ``+inf`` — never selected — identically in both engines.  Returns
    only ``(id_col, weight_col)`` for the winners, key dropped.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    pre = f"{seed}:".encode()

    def partial(batch: pa.Table) -> pa.Table:
        w_raw = batch[weight_col]
        ok = pc.fill_null(pc.greater(w_raw.cast(pa.float64()), 0.0), False)
        sub = batch.filter(ok)
        ids = sub[id_col].to_pylist()
        w = sub[weight_col].to_numpy(zero_copy_only=False).astype(np.float64)
        u = (
            np.array(
                [
                    int(hashlib.md5(pre + str(i).encode()).hexdigest()[:13], 16)
                    for i in ids
                ],
                dtype=np.float64,
            )
            / 4503599627370496.0  # 2^52: 13 hex chars, exact in a double
        )
        with np.errstate(divide="ignore"):
            key = -np.log(u) / w
        ids_np = np.asarray(ids, dtype=np.int64)
        order = np.lexsort((ids_np, key))[:k]
        return pa.table({
            id_col: pa.array(ids_np[order], pa.int64()),
            weight_col: sub[weight_col].take(pa.array(order)),
            "_es_key": pa.array(key[order], pa.float64()),
        })

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .sort(["_es_key", id_col])
        .limit(k)
        .drop_columns(["_es_key"])
    )
