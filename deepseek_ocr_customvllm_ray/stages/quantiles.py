"""Exact global quantiles WITHOUT a distributed sort — iterative
histogram-refinement selection (the textbook distributed k-selection):

1. one stats pass (count / min / max partials, one tiny row per batch),
2. histogram passes: every batch bins each target's surviving candidates
   into ``n_buckets`` (``np.bincount``, one sparse partial per target per
   batch); the driver folds the tiny partials, walks the cumulative
   histogram to the bucket containing the target rank, and narrows the
   candidate set to that bucket — candidates shrink ~n_buckets x / round,
3. a final collect pass ships ONLY the surviving candidates (<=
   ``max_candidates`` per target) to the driver for exact selection.

Candidate membership is an exact BIN-EQUALITY PREDICATE CHAIN, not a
range filter: each refinement level is recorded as (lo, w, bucket) and a
value is a candidate iff ``clip(floor((v - lo)/w), 0, nb-1) == bucket``
at EVERY level, evaluated with the identical float ops that binned it —
so a value counted into bucket b during the histogram round can never
drift into bucket b±1 when re-tested later (the classic float-boundary
bug in range-refinement selection).

Contrast with ``ds.sort(col)``: a sort is an all-to-all exchange of every
row; this is 2 + R map-only passes over ONE projected column (R = 1-2 for
typical integer ranges with 2048 buckets), and each pass's partial is a
few KB per batch.  At 10^12 rows the network moves kilobytes per batch
instead of the corpus.

Rank semantics match SQL ``percentile_disc`` / DuckDB ``quantile_disc``:
the value whose 1-indexed rank in the sorted column is ``ceil(p * n)``
(nulls and NaNs excluded from n).  ``+/-inf`` values count toward n and
resolve by position (they sort outside every finite value, so their
COUNTS suffice — they are never binned, which would stall refinement).

Dtype caveat: candidates ride float64, so integer columns are exact up
to 2^53; above that (e.g. snowflake-style ids) distinct ints can round
to the same double and the selected value may be off by the rounding —
use the value as a partition boundary, not an exact lookup, there.
"""

from __future__ import annotations

import math
from typing import List, Sequence, Tuple

import numpy as np
import pyarrow as pa


def _clean(batch: pa.Table, col: str) -> np.ndarray:
    arr = batch[col]
    arr = arr.filter(arr.is_valid())
    v = arr.to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
    if len(v):
        v = v[~np.isnan(v)]
    return v


def _finite_parts(v: np.ndarray):
    """(n_neg_inf, n_pos_inf, finite values).  Infinities sort before /
    after every finite value, so their COUNTS are all the refinement
    needs — binning them would make the bucket width inf/NaN and stall
    every round (then ship the whole column in the collect pass)."""
    if not len(v):
        return 0, 0, v
    n_neg = int(np.count_nonzero(v == -np.inf))
    n_pos = int(np.count_nonzero(v == np.inf))
    if n_neg or n_pos:
        v = v[np.isfinite(v)]
    return n_neg, n_pos, v


def _member(v: np.ndarray, levels, nb: int) -> np.ndarray:
    """Vectorized bin-equality chain: True where v survives every level."""
    mask = np.ones(len(v), dtype=bool)
    for lo, w, bi in levels:
        b = np.clip(((v - lo) / w).astype(np.int64), 0, nb - 1)
        mask &= b == bi
    return mask


def exact_quantiles(
    ds,
    col: str,
    ps: Sequence[float],
    n_buckets: int = 2048,
    max_candidates: int = 200_000,
    max_rounds: int = 16,
) -> pa.Table:
    """Exact ``percentile_disc`` values for each p in ``ps`` over a numeric
    column.  Returns a small driver-side ``pa.Table (p: double, value:
    <col type>)`` — |ps| rows, inherently driver-scale.

    Every distributed pass is ``map_batches`` over the single projected
    column with constant-size partials; only the final pass moves data
    values, and only the <= ``max_candidates`` survivors per target.
    """
    ps = list(ps)
    if not ps or any(not (0.0 < p <= 1.0) for p in ps):
        raise ValueError(f"percentiles must be in (0, 1], got {ps}")

    out_type = None
    sch = ds.schema()
    for name, typ in zip(sch.names, sch.types):
        if name == col:
            out_type = typ
    if out_type is None or not isinstance(out_type, pa.DataType):
        out_type = pa.float64()
    is_int = pa.types.is_integer(out_type)

    # ---- pass 0: count / min / max (one tiny row per batch) ----
    def stats_partial(batch: pa.Table) -> pa.Table:
        v = _clean(batch, col)
        if not len(v):
            return pa.table({
                "n": pa.array([], pa.int64()),
                "nneg": pa.array([], pa.int64()),
                "npos": pa.array([], pa.int64()),
                "lo": pa.array([], pa.float64()),
                "hi": pa.array([], pa.float64()),
            })
        nneg, npos, fin = _finite_parts(v)
        return pa.table({
            "n": pa.array([len(v)], pa.int64()),
            "nneg": pa.array([nneg], pa.int64()),
            "npos": pa.array([npos], pa.int64()),
            # NaN when the batch holds no finite value; the fold skips it
            "lo": pa.array(
                [float(fin.min()) if len(fin) else math.nan], pa.float64()
            ),
            "hi": pa.array(
                [float(fin.max()) if len(fin) else math.nan], pa.float64()
            ),
        })

    parts = ds.map_batches(stats_partial, batch_format="pyarrow").to_pandas()
    n_total = int(parts["n"].sum()) if len(parts) else 0
    if n_total == 0:
        return pa.table({
            "p": pa.array([], pa.float64()),
            "value": pa.array([], out_type),
        })
    n_neg = int(parts["nneg"].sum())
    n_pos = int(parts["npos"].sum())
    n_fin = n_total - n_neg - n_pos
    g_lo = float(parts["lo"].min())  # pandas min/max skip NaN
    g_hi = float(parts["hi"].max())

    nb = int(n_buckets)
    n_t = len(ps)
    rank = np.array(
        [max(1, math.ceil(p * n_total)) for p in ps], dtype=np.int64
    )  # 1-indexed rank within the current candidate set
    count = np.full(n_t, n_fin, dtype=np.int64)
    # per-target state: (cur_lo, cur_hi) conceptual interval for choosing
    # the next bucket width, plus the exact predicate chain
    cur_lo = np.full(n_t, g_lo)
    cur_hi = np.full(n_t, g_hi)
    levels: List[List[Tuple[float, float, int]]] = [[] for _ in range(n_t)]
    resolved = np.zeros(n_t, dtype=bool)
    values: List[float] = [math.nan] * n_t

    for ti in range(n_t):
        # infinity regions resolve by COUNT alone: -infs sort first,
        # +infs last, so a rank landing in either region needs no scan
        if rank[ti] <= n_neg:
            values[ti] = -math.inf
            resolved[ti] = True
        elif rank[ti] > n_neg + n_fin:
            values[ti] = math.inf
            resolved[ti] = True
        else:
            rank[ti] -= n_neg  # rank within the FINITE values
            if g_lo == g_hi:  # constant finite part: done
                values[ti] = g_lo
                resolved[ti] = True

    # ---- histogram refinement rounds ----
    for _ in range(max_rounds):
        active = [
            ti
            for ti in range(n_t)
            if not resolved[ti]
            and count[ti] > max_candidates
            and cur_hi[ti] > cur_lo[ti]
        ]
        if not active:
            break
        spec = [
            (levels[ti], float(cur_lo[ti]), (float(cur_hi[ti]) - float(cur_lo[ti])) / nb)
            for ti in active
        ]

        def hist_partial(batch: pa.Table, _spec=spec, _nb=nb) -> pa.Table:
            v = _finite_parts(_clean(batch, col))[2]
            rows_t, rows_b, rows_n = [], [], []
            for ai, (lvls, lo, w) in enumerate(_spec):
                sel = v[_member(v, lvls, _nb)] if lvls else v
                if not len(sel):
                    continue
                b = np.clip(((sel - lo) / w).astype(np.int64), 0, _nb - 1)
                cnts = np.bincount(b, minlength=_nb)
                nz = np.flatnonzero(cnts)
                rows_t.extend([ai] * len(nz))
                rows_b.extend(nz.tolist())
                rows_n.extend(cnts[nz].tolist())
            return pa.table({
                "t": pa.array(rows_t, pa.int32()),
                "b": pa.array(rows_b, pa.int32()),
                "n": pa.array(rows_n, pa.int64()),
            })

        hp = ds.map_batches(hist_partial, batch_format="pyarrow").to_pandas()
        grouped = hp.groupby(["t", "b"])["n"].sum() if len(hp) else None
        for ai, ti in enumerate(active):
            _, lo, w = spec[ai]
            dense = np.zeros(nb, dtype=np.int64)
            if grouped is not None and ai in grouped.index.get_level_values(0):
                sub = grouped.loc[ai]
                dense[sub.index.to_numpy()] = sub.to_numpy()
            cum = np.cumsum(dense)
            bi = int(np.searchsorted(cum, rank[ti], side="left"))
            below = int(cum[bi - 1]) if bi > 0 else 0
            rank[ti] -= below
            count[ti] = int(dense[bi])
            levels[ti] = levels[ti] + [(lo, w, bi)]
            cur_lo[ti] = lo + bi * w
            cur_hi[ti] = lo + (bi + 1) * w
            if is_int:
                # at most one integer can remain in a sub-1-width bucket
                # (epsilon relative to magnitude so large ids don't misround)
                eps = 1e-9 * max(1.0, abs(cur_lo[ti]), abs(cur_hi[ti]))
                lo_i = math.ceil(cur_lo[ti] - eps)
                hi_i = math.floor(cur_hi[ti] + eps)
                if lo_i >= hi_i:
                    values[ti] = float(lo_i)
                    resolved[ti] = True

    # ---- final collect: only surviving candidates cross the wire ----
    pending = [ti for ti in range(n_t) if not resolved[ti]]
    if pending:
        p_spec = [levels[ti] for ti in pending]

        def collect(batch: pa.Table, _spec=p_spec, _nb=nb) -> pa.Table:
            v = _finite_parts(_clean(batch, col))[2]
            rows_t, rows_v = [], []
            for ai, lvls in enumerate(_spec):
                sel = v[_member(v, lvls, _nb)] if lvls else v
                rows_t.extend([ai] * len(sel))
                rows_v.extend(sel.tolist())
            return pa.table({
                "t": pa.array(rows_t, pa.int32()),
                "v": pa.array(rows_v, pa.float64()),
            })

        cand = ds.map_batches(collect, batch_format="pyarrow").to_pandas()
        for ai, ti in enumerate(pending):
            sel = np.sort(cand.loc[cand["t"] == ai, "v"].to_numpy())
            if not (1 <= rank[ti] <= len(sel)):
                raise AssertionError(
                    f"quantile refinement lost rank {rank[ti]} vs "
                    f"{len(sel)} candidates for p={ps[ti]}"
                )
            values[ti] = float(sel[rank[ti] - 1])

    if is_int:
        out_vals = pa.array([int(round(v)) for v in values], out_type)
    else:
        out_vals = pa.array(values, out_type)
    return pa.table({"p": pa.array(ps, pa.float64()), "value": out_vals})


def _clean_grouped(batch: pa.Table, col: str, group_col: str):
    """(group_codes_as_strings, values) with nulls/NaNs dropped pairwise."""
    import pyarrow.compute as pc

    keep = pc.and_(batch[col].is_valid(), batch[group_col].is_valid())
    sub = batch.filter(keep)
    v = sub[col].to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
    g = sub[group_col].to_numpy(zero_copy_only=False)
    if len(v):
        ok = ~np.isnan(v)
        v, g = v[ok], g[ok]
    return g, v


def grouped_exact_quantiles(
    ds,
    col: str,
    group_col: str,
    ps: Sequence[float],
    n_buckets: int = 2048,
    max_candidates: int = 200_000,
    max_rounds: int = 16,
    ranks=None,
) -> pa.Table:
    """Per-group exact ``percentile_disc``: ``(group, p, value)`` — the
    grouped sibling of :func:`exact_quantiles`, same histogram-refinement
    selection with one (group, p) target per combination.

    ``ranks`` (optional, parallel to ``ps``) overrides the per-group rank:
    each entry is ``n_group -> 1-indexed rank`` (clamped to [1, n_group]).
    This expresses order statistics the ``ceil(p*n)`` rule can't — e.g.
    SQL ``median`` for even groups is the MEAN of ranks ``(n+1)//2`` and
    ``n//2 + 1``, two targets no single p yields across mixed group sizes.
    The ``ps`` values then serve only as output labels.

    Scale shape: identical map-only passes; the per-batch partial grows to
    one sparse histogram per ACTIVE target, so this is built for modest
    group cardinality (languages, sources, buckets — <= ~10^3 groups).
    Beyond that, switch to the log-histogram sketch per group (a single
    groupby of mergeable sketches) or hash-partition by group and sort
    within partitions; the driver state here is G x P floats — KB-scale.

    Null group keys are excluded (SQL ``GROUP BY`` would keep a NULL
    group; the oracle filters it symmetrically).  Rank semantics per group
    match DuckDB ``quantile_disc`` (1-indexed rank ``ceil(p * n_g)``).
    """
    ps = list(ps)
    if not ps or any(not (0.0 < p <= 1.0) for p in ps):
        raise ValueError(f"percentiles must be in (0, 1], got {ps}")
    if ranks is not None and len(ranks) != len(ps):
        raise ValueError(f"ranks must parallel ps: {len(ranks)} vs {len(ps)}")

    out_type = None
    sch = ds.schema()
    for name, typ in zip(sch.names, sch.types):
        if name == col:
            out_type = typ
    if out_type is None or not isinstance(out_type, pa.DataType):
        out_type = pa.float64()
    is_int = pa.types.is_integer(out_type)

    # ---- pass 0: per-group count / min / max ----
    def stats_partial(batch: pa.Table) -> pa.Table:
        g, v = _clean_grouped(batch, col, group_col)
        if not len(v):
            return pa.table({
                "g": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "lo": pa.array([], pa.float64()),
                "hi": pa.array([], pa.float64()),
            })
        uniq, inv = np.unique(g.astype(str), return_inverse=True)
        n = np.bincount(inv)
        nneg = np.bincount(inv, weights=(v == -np.inf)).astype(np.int64)
        npos = np.bincount(inv, weights=(v == np.inf)).astype(np.int64)
        fin = np.isfinite(v)
        lo = np.full(len(uniq), np.inf)
        hi = np.full(len(uniq), -np.inf)
        np.minimum.at(lo, inv[fin], v[fin])
        np.maximum.at(hi, inv[fin], v[fin])
        # groups with no finite value report NaN bounds; the fold skips
        lo[lo == np.inf] = np.nan
        hi[hi == -np.inf] = np.nan
        return pa.table({
            "g": pa.array(uniq, pa.string()),
            "n": pa.array(n, pa.int64()),
            "nneg": pa.array(nneg, pa.int64()),
            "npos": pa.array(npos, pa.int64()),
            "lo": pa.array(lo, pa.float64()),
            "hi": pa.array(hi, pa.float64()),
        })

    parts = ds.map_batches(stats_partial, batch_format="pyarrow").to_pandas()
    if not len(parts):
        return pa.table({
            group_col: pa.array([], pa.string()),
            "p": pa.array([], pa.float64()),
            "value": pa.array([], out_type),
        })
    folded = parts.groupby("g").agg(
        n=("n", "sum"), nneg=("nneg", "sum"), npos=("npos", "sum"),
        lo=("lo", "min"), hi=("hi", "max"),
    ).sort_index()
    groups = list(folded.index)

    # ---- per-(group, p) target state ----
    targets = [(gi, pi) for gi in range(len(groups)) for pi in range(len(ps))]
    n_t = len(targets)
    rank = np.empty(n_t, dtype=np.int64)
    count = np.empty(n_t, dtype=np.int64)
    cur_lo = np.empty(n_t)
    cur_hi = np.empty(n_t)
    levels: List[List[Tuple[float, float, int]]] = [[] for _ in range(n_t)]
    resolved = np.zeros(n_t, dtype=bool)
    values: List[float] = [math.nan] * n_t
    nb = int(n_buckets)
    for ti, (gi, pi) in enumerate(targets):
        n_g = int(folded["n"].iloc[gi])
        g_neg = int(folded["nneg"].iloc[gi])
        g_fin = n_g - g_neg - int(folded["npos"].iloc[gi])
        if ranks is not None:
            rank[ti] = max(1, min(n_g, int(ranks[pi](n_g))))
        else:
            rank[ti] = max(1, math.ceil(ps[pi] * n_g))
        count[ti] = g_fin
        cur_lo[ti] = float(folded["lo"].iloc[gi])
        cur_hi[ti] = float(folded["hi"].iloc[gi])
        # infinity regions resolve by count (see exact_quantiles)
        if rank[ti] <= g_neg:
            values[ti] = -math.inf
            resolved[ti] = True
        elif rank[ti] > g_neg + g_fin:
            values[ti] = math.inf
            resolved[ti] = True
        else:
            rank[ti] -= g_neg
            if cur_lo[ti] == cur_hi[ti]:
                values[ti] = cur_lo[ti]
                resolved[ti] = True

    # ---- histogram refinement rounds ----
    for _ in range(max_rounds):
        active = [
            ti
            for ti in range(n_t)
            if not resolved[ti]
            and count[ti] > max_candidates
            and cur_hi[ti] > cur_lo[ti]
        ]
        if not active:
            break
        spec = [
            (
                groups[targets[ti][0]],
                levels[ti],
                float(cur_lo[ti]),
                (float(cur_hi[ti]) - float(cur_lo[ti])) / nb,
            )
            for ti in active
        ]

        def hist_partial(batch: pa.Table, _spec=spec, _nb=nb) -> pa.Table:
            g, v = _clean_grouped(batch, col, group_col)
            fin = np.isfinite(v)
            if not fin.all():
                g, v = g[fin], v[fin]
            gs = g.astype(str)
            rows_t, rows_b, rows_n = [], [], []
            for ai, (gv, lvls, lo, w) in enumerate(_spec):
                sub = v[gs == gv]
                sel = sub[_member(sub, lvls, _nb)] if lvls else sub
                if not len(sel):
                    continue
                b = np.clip(((sel - lo) / w).astype(np.int64), 0, _nb - 1)
                cnts = np.bincount(b, minlength=_nb)
                nz = np.flatnonzero(cnts)
                rows_t.extend([ai] * len(nz))
                rows_b.extend(nz.tolist())
                rows_n.extend(cnts[nz].tolist())
            return pa.table({
                "t": pa.array(rows_t, pa.int32()),
                "b": pa.array(rows_b, pa.int32()),
                "n": pa.array(rows_n, pa.int64()),
            })

        hp = ds.map_batches(hist_partial, batch_format="pyarrow").to_pandas()
        grouped = hp.groupby(["t", "b"])["n"].sum() if len(hp) else None
        for ai, ti in enumerate(active):
            _, _, lo, w = spec[ai]
            dense = np.zeros(nb, dtype=np.int64)
            if grouped is not None and ai in grouped.index.get_level_values(0):
                sub = grouped.loc[ai]
                dense[sub.index.to_numpy()] = sub.to_numpy()
            cum = np.cumsum(dense)
            bi = int(np.searchsorted(cum, rank[ti], side="left"))
            below = int(cum[bi - 1]) if bi > 0 else 0
            rank[ti] -= below
            count[ti] = int(dense[bi])
            levels[ti] = levels[ti] + [(lo, w, bi)]
            cur_lo[ti] = lo + bi * w
            cur_hi[ti] = lo + (bi + 1) * w
            if is_int:
                eps = 1e-9 * max(1.0, abs(cur_lo[ti]), abs(cur_hi[ti]))
                lo_i = math.ceil(cur_lo[ti] - eps)
                hi_i = math.floor(cur_hi[ti] + eps)
                if lo_i >= hi_i:
                    values[ti] = float(lo_i)
                    resolved[ti] = True

    # ---- final collect ----
    pending = [ti for ti in range(n_t) if not resolved[ti]]
    if pending:
        p_spec = [
            (groups[targets[ti][0]], levels[ti]) for ti in pending
        ]

        def collect(batch: pa.Table, _spec=p_spec, _nb=nb) -> pa.Table:
            g, v = _clean_grouped(batch, col, group_col)
            fin = np.isfinite(v)
            if not fin.all():
                g, v = g[fin], v[fin]
            gs = g.astype(str)
            rows_t, rows_v = [], []
            for ai, (gv, lvls) in enumerate(_spec):
                sub = v[gs == gv]
                sel = sub[_member(sub, lvls, _nb)] if lvls else sub
                rows_t.extend([ai] * len(sel))
                rows_v.extend(sel.tolist())
            return pa.table({
                "t": pa.array(rows_t, pa.int32()),
                "v": pa.array(rows_v, pa.float64()),
            })

        cand = ds.map_batches(collect, batch_format="pyarrow").to_pandas()
        for ai, ti in enumerate(pending):
            sel = np.sort(cand.loc[cand["t"] == ai, "v"].to_numpy())
            if not (1 <= rank[ti] <= len(sel)):
                raise AssertionError(
                    f"grouped quantile refinement lost rank {rank[ti]} vs "
                    f"{len(sel)} candidates for target {targets[ti]}"
                )
            values[ti] = float(sel[rank[ti] - 1])

    out_g = [groups[gi] for gi, _pi in targets]
    out_p = [ps[pi] for _gi, pi in targets]
    if is_int:
        out_vals = pa.array([int(round(v)) for v in values], out_type)
    else:
        out_vals = pa.array(values, out_type)
    return pa.table({
        group_col: pa.array(out_g, pa.string()),
        "p": pa.array(out_p, pa.float64()),
        "value": out_vals,
    })
