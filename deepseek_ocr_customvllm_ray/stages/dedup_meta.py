"""Metadata-only URL dedup: resolve duplicate-url winners WITHOUT shuffling
payloads.

The exact-dedup guard (SURVEY §2.8) keyed on url needs one winner per url:
min (warc_ts, sha1(payload)).  Shuffling full rows to co-locate urls moves
every payload byte through the object store; but the winner is decidable
from (url, warc_ts) alone except for timestamp ties, so:

- pass A: read ONLY (url, warc_ts) (column pruning — payload bytes never
  leave storage), groupby(url) -> dup urls, their min_ts, and the
  multiplicity at min_ts;
- pass B (tie urls only, usually none): read payloads for those urls,
  sha1-hash, winner = min sha; exact-clone rows (same url+ts+sha) keep the
  single fetched canonical row;
- broadcast the winner map (``ray.put`` once) and filter rows in the main
  extraction pass with a vectorized predicate.

Scale note: the broadcast map holds only DUPLICATE urls.  At crawl scale
with a high dup fraction, swap the broadcast for a hash-partitioned
semi-join on url (the shuffle path in ``dedup_url.py``) — both implement
the same contract; pick by dup-set size.
"""

from __future__ import annotations

import hashlib
from typing import Dict, Optional, Tuple

import pyarrow as pa
import pyarrow.compute as pc


def _apply_meta_predicate(t: pa.Table, cap: int) -> pa.Table:
    """(url, warc_ts, blen) table -> validated (url, warc_ts) rows: the
    route-stage predicate (non-empty, under-cap payload, non-null keys)
    applied BEFORE winner selection.  THE single definition of the
    validity rule all winner-resolution paths share — dedup correctness
    depends on every path agreeing with the route stage."""
    ok = pc.and_(pc.greater(t["blen"], 0), pc.less_equal(t["blen"], cap))
    ok = pc.and_(ok, pc.is_valid(t["url"]))
    ok = pc.and_(ok, pc.is_valid(t["warc_ts"]))
    return t.filter(ok).select(["url", "warc_ts"])


def _validated_meta_batch(cap: int):
    """map_batches wrapper over :func:`_apply_meta_predicate` for batches
    that carry the raw ``html`` column."""

    def fn(batch: pa.Table) -> pa.Table:
        return _apply_meta_predicate(
            batch.select(["url", "warc_ts"]).append_column(
                "blen", pc.binary_length(batch["html"])
            ),
            cap,
        )

    return fn


def _scan_shard_meta(path, cap: int) -> pa.Table:
    """One-shard local scan: project ``binary_length(html)`` inside the
    reading process (payload bytes never serialized out) and apply the
    shared validity predicate."""
    import pyarrow.dataset as pads

    t = pads.dataset(path, format="parquet").to_table(
        columns={
            "url": pads.field("url"),
            "warc_ts": pads.field("warc_ts"),
            "blen": pc.binary_length(pads.field("html")),
        }
    )
    return _apply_meta_predicate(t, cap)


def _input_files(pages_path):
    """The EXACT file list the payload read will consume
    (``pyarrow.dataset`` discovery — recursive, same as ``read_parquet``).
    A hand-rolled top-level glob would silently miss nested shard files and
    leak their duplicate urls through dedup."""
    import pyarrow.dataset as pads

    return sorted(pads.dataset(pages_path, format="parquet").files)


def read_validated_meta_sharded(pages_path, max_payload_mb: int = 200):
    """Validated (url, warc_ts) meta view as a driver DataFrame, scanned in
    parallel with one Ray task PER PARQUET SHARD that projects
    ``binary_length(html)`` locally — payload bytes never enter the object
    store (a plain ``read_parquet`` meta pass ships the whole payload
    column through plasma first, measured slower than the serial scan).
    Falls back to the serial scan for single-file inputs.  Returns None if
    no Ray session is active."""
    import ray

    if not ray.is_initialized():
        return None
    files = _input_files(pages_path)
    if len(files) < 2:
        return None

    cap = max_payload_mb * 1024 * 1024
    scan = ray.remote(num_cpus=1)(_scan_shard_meta)
    tables = ray.get([scan.remote(f, cap) for f in files])
    return pa.concat_tables(tables).to_pandas()


def compute_dup_winners_local(
    pages_path, max_payload_mb: int = 200, columns=None, meta=None
) -> Tuple[dict, Optional[pa.Table]]:
    """Driver-side fast path: the meta columns (url, warc_ts, byte length)
    of the whole input are a few bytes per row — for inputs up to ~10^7 rows
    resolving winners with pandas on the driver is faster than any
    distributed groupby (no shuffle, no task overhead).  Above that, use
    :func:`compute_dup_winners` (same contract, distributed).

    ``meta``: optional pre-validated (url, warc_ts) DataFrame for callers
    that already hold the validated meta view.  When omitted (the default
    path), a serial pyarrow scan computes it — measured faster than a
    Ray-parallel scan when the input sits in page cache.

    Validation precedes dedup: rows the route stage would drop (empty or
    over the size cap) are excluded BEFORE winner selection, so an invalid
    earliest crawl cannot shadow a later valid one (matching the golden
    driver and the route-then-dedup pipelines).
    """
    import pyarrow.dataset as pads

    columns = columns or ["url", "warc_ts", "html", "lang"]
    cap = max_payload_mb * 1024 * 1024
    dataset = pads.dataset(pages_path, format="parquet")
    if meta is None:
        meta = dataset.to_table(
            columns={
                "url": pads.field("url"),
                "warc_ts": pads.field("warc_ts"),
                "blen": pc.binary_length(pads.field("html")),
            }
        ).to_pandas()
        meta = meta[(meta["blen"] > 0) & (meta["blen"] <= cap)]
        meta = meta.dropna(subset=["url", "warc_ts"])
    counts = meta["url"].value_counts()
    dup_urls = set(counts[counts > 1].index)
    if not dup_urls:
        return {}, None
    dmeta = meta[meta["url"].isin(dup_urls)]
    min_ts = dmeta.groupby("url")["warc_ts"].min()
    at_min = dmeta.merge(min_ts.rename("min_ts"), on="url")
    at_min = at_min[at_min["warc_ts"] == at_min["min_ts"]]
    k = at_min["url"].value_counts()
    tie_urls = set(k[k > 1].index)

    winners: Dict[str, Tuple] = {
        u: (ts.to_pydatetime() if hasattr(ts, "to_pydatetime") else ts, None)
        for u, ts in min_ts.items()
        if u not in tie_urls
    }
    clone_rows = None
    if tie_urls:
        tied = dataset.to_table(
            columns=columns,  # match the pipeline's pruned read schema
            filter=pads.field("url").isin(sorted(tie_urls)),
        )
        best_rows: Dict[str, Tuple] = {}
        mt = {u: min_ts[u] for u in tie_urls}
        for i in range(tied.num_rows):
            u = tied["url"][i].as_py()
            ts = tied["warc_ts"][i].as_py()
            if ts != (mt[u].to_pydatetime() if hasattr(mt[u], "to_pydatetime") else mt[u]):
                continue
            payload = tied["html"][i].as_py()
            if not payload or len(payload) > cap:
                continue
            sha = hashlib.sha1(payload).hexdigest()
            if u not in best_rows or sha < best_rows[u][0]:
                best_rows[u] = (sha, tied.slice(i, 1))
        if set(best_rows) != tie_urls:
            # a tie url with no resolvable row means the meta view and the
            # payload view disagree — refuse rather than leak duplicates
            missing = sorted(tie_urls - set(best_rows))[:3]
            raise ValueError(f"unresolvable timestamp ties for urls {missing}")
        clone_tables = []
        for u, (sha, row) in best_rows.items():
            winners[u] = ("__CLONE__", None)
            clone_tables.append(row)
        clone_rows = pa.concat_tables(clone_tables) if clone_tables else None
    return winners, clone_rows


def compute_dup_winners_distributed(
    pages_path, max_payload_mb: int = 200, columns=None
) -> Tuple[dict, Optional[pa.Table]]:
    """Distributed twin of :func:`compute_dup_winners_local` — same contract,
    same validation-precedes-dedup invariant, but the per-row meta view
    never reaches the driver: the (url, warc_ts) stream is validated inside
    the read tasks and reduced with Ray groupbys; the driver sees only the
    duplicate-url aggregate (tiny at any dup fraction worth broadcasting).
    Use above ~10^7 input rows (cfg.winners_local_max_rows).
    """
    import ray.data as rd

    cap = max_payload_mb * 1024 * 1024
    columns = columns or ["url", "warc_ts", "html", "lang"]

    shard_files = _input_files(pages_path)
    if len(shard_files) >= 2:
        # per-shard scan tasks project binary_length LOCALLY: only the thin
        # validated (url, warc_ts) rows enter the object store.  Routing the
        # payload column through plasma just to take its lengths measured
        # 3-4 s extra on the 2 GB bench corpus.
        def scan_files(batch: pa.Table) -> pa.Table:
            return pa.concat_tables(
                [_scan_shard_meta(path, cap) for path in batch["item"].to_pylist()]
            )

        meta_ds = rd.from_items(shard_files).map_batches(
            scan_files, batch_size=1, batch_format="pyarrow"
        )
    else:
        meta_ds = rd.read_parquet(
            pages_path, columns=["url", "warc_ts", "html"]
        ).map_batches(_validated_meta_batch(cap), batch_format="pyarrow")
    payload_ds = rd.read_parquet(pages_path, columns=columns)
    return compute_dup_winners(meta_ds, payload_ds, max_payload_mb=max_payload_mb)


def compute_dup_winners(meta_ds, payload_ds=None, max_payload_mb: int = 200):
    """meta_ds: Dataset[(url, warc_ts)] -> (winners, clone_rows).

    winners: {url: (min_ts, min_sha_or_None)} for DUPLICATED urls only.
    clone_rows: pa.Table of canonical full rows for urls whose winner is an
    exact clone set (same url, ts, sha appearing >1 time) — these are
    excluded from the map-only filter and unioned back by the caller.
    ``payload_ds`` (full-column Dataset) is required only when ties exist;
    tie candidates that fail the validation predicate (empty / over-cap
    payload) are skipped, mirroring the local path — meta_ds is expected to
    be pre-validated, so an invalid row with a winning (url, ts) must not
    resurrect through the payload fetch.
    """
    import pandas as pd

    from .partition import with_hash_partition

    # ONE thin shuffle: hash-partition (url, ts) rows so every url's crawls
    # co-locate, then a vectorized per-partition pandas aggregate computes
    # count, min_ts AND the multiplicity at min_ts together — partition-
    # local is globally correct, and it replaces two Ray string-key
    # groupbys (measured ~5 s each at 10^5 rows; per-partition pandas is
    # ~3x cheaper) plus the second meta pass entirely.  Only DUP urls are
    # emitted, so the driver pull is dup-sized, not input-sized.
    def agg_partition(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("url")["warc_ts"].agg(n="count", min_ts="min")
        g = g[g["n"] > 1]
        if len(g) == 0:
            # derive min_ts dtype from the INPUT ts column: a hard-coded
            # datetime64[us] would mix with ns-unit blocks from non-empty
            # partitions and leave concat-promotion behavior to chance
            return pd.DataFrame({
                "url": pd.Series([], dtype=object),
                "n": pd.Series([], dtype="int64"),
                "min_ts": pd.Series([], dtype=df["warc_ts"].dtype),
                "k": pd.Series([], dtype="int64"),
            })
        d = df.merge(g["min_ts"], left_on="url", right_index=True)
        k = d[d["warc_ts"] == d["min_ts"]].groupby("url").size().rename("k")
        out = g.join(k).reset_index()
        return pd.DataFrame({
            "url": out["url"],
            "n": out["n"].astype("int64"),
            "min_ts": out["min_ts"],
            "k": out["k"].astype("int64"),
        })

    dups = (
        with_hash_partition(meta_ds, "url", 64)
        .groupby("_part")
        .map_groups(agg_partition, batch_format="pandas")
        .to_pandas()
    )
    if len(dups) == 0:
        return {}, None
    min_ts_of = dict(zip(dups["url"], dups["min_ts"]))
    tie_urls = set(dups[dups["k"] > 1]["url"])

    import ray

    winners: Dict[str, Tuple] = {
        u: (ts, None) for u, ts in min_ts_of.items() if u not in tie_urls
    }
    clone_rows = None
    if tie_urls:
        if payload_ds is None:
            raise ValueError("timestamp ties present; payload_ds required")
        tie_ref = ray.put((tie_urls, min_ts_of))

        def tie_rows(batch: pa.Table) -> pa.Table:
            tset, m = ray.get(tie_ref)
            urls = batch["url"].to_pylist()
            tss = batch["warc_ts"].to_pylist()
            keep = [u in tset and ts == m[u] for u, ts in zip(urls, tss)]
            return batch.filter(pa.array(keep, pa.bool_()))

        cand = payload_ds.map_batches(tie_rows, batch_format="pyarrow").to_arrow_refs()
        import ray as _r

        tables = [t for r in cand if (t := _r.get(r)).num_rows]
        tied = pa.concat_tables(tables) if tables else None
        if tied is None:
            raise ValueError(
                "timestamp ties present in meta_ds but no matching rows in "
                "payload_ds — the two views disagree"
            )
        cap = max_payload_mb * 1024 * 1024
        best_rows: Dict[str, Tuple] = {}
        if tied is not None:
            for i in range(tied.num_rows):
                u = tied["url"][i].as_py()
                payload = tied["html"][i].as_py()
                if not payload or len(payload) > cap:
                    continue  # validation precedes dedup, tie path included
                sha = hashlib.sha1(payload).hexdigest()
                if u not in best_rows or sha < best_rows[u][0]:
                    best_rows[u] = (sha, tied.slice(i, 1))
        if set(best_rows) != tie_urls:
            missing = sorted(tie_urls - set(best_rows))[:3]
            raise ValueError(f"unresolvable timestamp ties for urls {missing}")
        clone_tables = []
        for u, (sha, row) in best_rows.items():
            winners[u] = ("__CLONE__", None)  # drop ALL rows in the map pass
            clone_tables.append(row)
        clone_rows = pa.concat_tables(clone_tables) if clone_tables else None
    return winners, clone_rows


def winners_to_arrays(winners: Dict[str, Tuple]):
    """{url: (min_ts | "__CLONE__", _)} -> three parallel broadcast arrays
    (urls, winning ts with null for clones, clone flags) for the vectorized
    winner filter."""
    urls, tss, clones = [], [], []
    for u, (ts, _sha) in winners.items():
        urls.append(u)
        if ts == "__CLONE__":
            tss.append(None)
            clones.append(True)
        else:
            tss.append(ts)
            clones.append(False)
    return (
        pa.array(urls, pa.string()),
        pa.array(tss, pa.timestamp("us")),
        pa.array(clones, pa.bool_()),
    )


def make_winner_filter(winners_ref):
    """Keep-predicate over broadcast winner arrays — FULLY vectorized.

    ``winners_ref``: ``ray.put`` of :func:`winners_to_arrays` output.  Per
    batch: ``index_in`` maps each url into the winner table (null = not a
    dup -> keep); dup rows keep iff their ts equals the winning ts and the
    url is not an exact-clone set (clone urls carry a null winning ts, so
    the Kleene ``ts == null AND false`` collapses to false and they never
    pass — their canonical row is unioned back separately).  The round-2
    version fell back to a per-row Python loop over the WHOLE batch
    whenever it contained a single dup url, which at a few-percent dup
    rate means every batch (measured ~4 s of the 26 s flagship wall)."""
    import ray

    def fn(batch: pa.Table) -> pa.Table:
        urls, tss, clones = ray.get(winners_ref)
        if len(urls) == 0:
            return batch
        idx = pc.index_in(batch["url"], value_set=urls)
        if not pc.any(pc.is_valid(idx)).as_py():
            return batch  # common case: nothing to filter, zero copies
        win_ts = pc.take(tss, idx).cast(batch["warc_ts"].type)
        is_clone = pc.take(clones, idx)
        verdict = pc.and_kleene(
            pc.equal(batch["warc_ts"], win_ts), pc.invert(is_clone)
        )
        keep = pc.fill_null(pc.or_kleene(pc.is_null(idx), verdict), False)
        return batch.filter(keep)

    return fn
