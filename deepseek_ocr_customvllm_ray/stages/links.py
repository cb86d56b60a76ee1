"""Link-graph extraction: per-page out-links and host-level edge rollups.

Web-pipeline operators over the raw ``html`` column (the same input the
main-content branch reads — reference contract keys every record by
``url``, `app/services/task_service.py`): collect every ``<a href>`` with
its anchor text, resolve relative hrefs against the page URL, and roll the
link list up into a host-level edge table / in-link summary.  Link graphs
are the standard web-corpus quality signal (in-degree weighting, spam-farm
detection) and the crawl-frontier input — the natural sibling of the
extraction pass, sharing its read.

Unlike main-content extraction, link collection must SEE nav/footer/aside
subtrees (``functions.html_extract.parse_dom`` kills them at parse time to
keep boilerplate out of the scoring), so this module uses its own
flat ``HTMLParser`` subclass that never builds a tree — one O(bytes) pass
per page, no DOM allocation.

Scale shape:
- :func:`page_out_links` is map-only (the per-row HTML walk is an
  inherent string kernel, same budget class as extraction itself); the
  payload column never shuffles.
- :func:`host_edges` pre-aggregates (src_host, dst_host) counts inside
  each batch (the lineage partial pattern) so the ONE groupby exchange
  moves a row per (edge, batch) — bounded by distinct hosts, not by link
  volume.
- :func:`host_in_links` is a second groupby over the (already tiny)
  host-edge table.
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import List, Optional
from urllib.parse import urljoin, urlsplit

import pyarrow as pa

__all__ = ["collect_links", "make_page_links_batch", "page_out_links",
           "host_edges", "host_in_links", "host_pagerank",
           "host_pagerank_sharded", "host_components"]


# Cap on accumulated anchor-text characters per link: bounds memory on
# hostile/truncated markup where an anchor never closes.  HTML5 allows
# flow content inside <a> (card markup `<a><div>Read more</div></a>` is
# valid, and browsers keep anchors open across block boundaries via the
# adoption agency), so a block-start tag must NOT implicitly close the
# anchor — the cap alone bounds the missing-</a> runaway, matching what
# a browser attributes to the link.
_MAX_ANCHOR_CHARS = 4096


class _LinkCollector(HTMLParser):
    """Flat one-pass ``<a href>`` collector: (href, anchor_text, nofollow)
    in document order.  Nested anchors (invalid but common in crawled
    HTML) are flattened into the innermost-open anchor's text; block
    content inside an anchor is anchor text (HTML5 card markup), and a
    missing ``</a>`` is bounded by the per-link char cap."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.links: List[list] = []  # [href, text_parts, nofollow, n_chars]
        self._open: List[list] = []  # stack of in-progress anchors

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag != "a":
            return
        href: Optional[str] = None
        nofollow = False
        for k, v in attrs:
            if k == "href" and href is None:
                href = v
            elif k == "rel" and v and "nofollow" in v.lower().split():
                # rel tokens are ASCII case-insensitive (rel="NoFollow")
                nofollow = True
        entry = [href, [], nofollow, 0]
        self._open.append(entry)
        if href:
            self.links.append(entry)

    def handle_endtag(self, tag: str) -> None:
        if tag == "a" and self._open:
            self._open.pop()

    def handle_data(self, data: str) -> None:
        if self._open:
            top = self._open[-1]
            if top[3] < _MAX_ANCHOR_CHARS:
                top[1].append(data[: _MAX_ANCHOR_CHARS - top[3]])
                top[3] += len(data)


def collect_links(html: str) -> List[tuple]:
    """HTML -> [(href, anchor_text, nofollow)] in document order.
    Anchor text is whitespace-normalized; hrefs are returned verbatim
    (resolution is the caller's job).  Deterministic: pure function of
    the HTML string."""
    p = _LinkCollector()
    try:
        p.feed(html)
        p.close()
    except Exception:
        pass  # truncated/hostile markup: keep whatever parsed cleanly
    return [
        (href, " ".join(" ".join(parts).split()), nofollow)
        for href, parts, nofollow, _n in p.links
    ]


def make_page_links_batch(url_col: str = "url", html_col: str = "html"):
    """``map_batches`` fn: page rows -> one row per out-link.

    Output ``(src_url, src_host, link_no, dst_url, dst_host, anchor,
    nofollow, is_internal)``: relative hrefs resolve against the page URL
    (stdlib ``urljoin`` — RFC 3986, deterministic), only http(s) targets
    survive (``mailto:``/``javascript:``/fragment-only links drop),
    ``link_no`` is the link's document-order position among SURVIVING
    links, and ``is_internal`` marks same-host targets.  Hosts are
    lowercased with any ``:port`` kept out (``urlsplit().hostname``)."""

    def fn(batch: pa.Table) -> pa.Table:
        src_urls: List[str] = []
        src_hosts: List[str] = []
        link_nos: List[int] = []
        dst_urls: List[str] = []
        dst_hosts: List[str] = []
        anchors: List[str] = []
        nofollows: List[bool] = []
        internals: List[bool] = []
        for src, payload in zip(
            batch[url_col].to_pylist(), batch[html_col].to_pylist()
        ):
            if payload is None:
                continue
            html = (
                payload.decode("utf-8", errors="replace")
                if isinstance(payload, (bytes, bytearray))
                else str(payload)
            )
            src_host = (urlsplit(src).hostname or "") if src else ""
            n = 0
            for href, anchor, nofollow in collect_links(html):
                if href.startswith("#"):
                    continue  # same-page fragment link, never an edge
                dst = urljoin(src or "", href)
                parts = urlsplit(dst)
                if parts.scheme not in ("http", "https") or not parts.hostname:
                    continue
                if parts.fragment and parts._replace(fragment="").geturl() == (
                    src or ""
                ):
                    continue  # resolves to this page plus a fragment: self-edge
                src_urls.append(src)
                src_hosts.append(src_host)
                link_nos.append(n)
                dst_urls.append(dst)
                dst_hosts.append(parts.hostname)
                anchors.append(anchor)
                nofollows.append(bool(nofollow))
                internals.append(parts.hostname == src_host)
                n += 1
        return pa.table({
            "src_url": pa.array(src_urls, pa.string()),
            "src_host": pa.array(src_hosts, pa.string()),
            "link_no": pa.array(link_nos, pa.int64()),
            "dst_url": pa.array(dst_urls, pa.string()),
            "dst_host": pa.array(dst_hosts, pa.string()),
            "anchor": pa.array(anchors, pa.string()),
            "nofollow": pa.array(nofollows, pa.bool_()),
            "is_internal": pa.array(internals, pa.bool_()),
        })

    return fn


def page_out_links(ds, url_col: str = "url", html_col: str = "html"):
    """Map-only out-link table of a pages Dataset (see
    :func:`make_page_links_batch` for the schema)."""
    return ds.map_batches(
        make_page_links_batch(url_col, html_col), batch_format="pyarrow"
    )


def host_edges(links_ds, agg_blocks: int = 1):
    """Out-link rows -> host-level edge table
    ``(src_host, dst_host, n_links)``.

    Counts are pre-aggregated per batch (one partial row per edge per
    batch — the lineage-partial pattern) so the single groupby exchange
    is bounded by the number of distinct host pairs, not by link volume.

    ``agg_blocks``: the partial table is coalesced to this many blocks
    before the groupby.  Ray's sort-based aggregate emits schema-less
    empty bundles for empty input blocks (a warning per occurrence, and
    downstream operators see a divergent schema); the partial table is
    distinct-pair-bounded, so one block is the right default — raise it
    for host universes above ~10^7 pairs, where a few non-empty blocks
    beat one big one.
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        out_schema = pa.schema([
            ("src_host", pa.string()),
            ("dst_host", pa.string()),
            ("n_p", pa.int64()),
        ])
        if not batch.num_rows:
            return out_schema.empty_table()
        return (
            batch.select(["src_host", "dst_host"])
            .group_by(["src_host", "dst_host"])
            .aggregate([([], "count_all")])
            .rename_columns(["src_host", "dst_host", "n_p"])
            .cast(out_schema)
        )

    out = (
        links_ds.map_batches(partial, batch_format="pyarrow")
        .repartition(agg_blocks)
        .groupby(["src_host", "dst_host"])
        .aggregate(Sum("n_p", alias_name="n_links"))
    )
    return out


def host_in_links(edges_ds, agg_blocks: int = 1):
    """Host-edge table -> per-destination-host in-link summary
    ``(dst_host, n_links, n_src_hosts)``.

    ``n_src_hosts`` is an exact distinct count: :func:`host_edges` rows
    are already unique per (src_host, dst_host), so it is a plain row
    count per dst_host — no second distinct pass.  ``agg_blocks``: see
    :func:`host_edges` (same empty-block rationale; the edge table is
    already tiny)."""
    from ray.data.aggregate import Count, Sum

    return (
        edges_ds.repartition(agg_blocks)
        .groupby("dst_host")
        .aggregate(
            Sum("n_links", alias_name="n_links"),
            Count(alias_name="n_src_hosts"),
        )
    )


def anchor_text_agg(links_ds, num_partitions: int = 32, sep: str = "|"):
    """Out-link rows -> per-TARGET-URL anchor-text aggregate
    ``(dst_url, n_links, n_src_hosts, anchors)`` — the web-graph feature
    behind anchor-text pretraining / target-page quality signals (what do
    OTHER pages call this one?).

    Scale shape (the inverted-index pattern): per-batch partials dedupe
    (dst_url, anchor, src_host) triples and pre-count links, so the ONE
    crc32(dst_url) exchange is bounded by distinct triples, not link
    volume; each partition then resolves all its targets in one
    lexsort + run-boundary sweep (anchors joined sorted-distinct, hosts
    counted distinct).  ``sep`` must not occur inside anchors (the synth
    corpus guarantees it; real deployments pick an unused control char).
    """
    import numpy as np

    from .partition import hash_mod

    def partial(batch: pa.Table) -> pa.Table:
        dst = np.asarray(batch["dst_url"].to_pylist(), dtype=object)
        anc = np.asarray(batch["anchor"].to_pylist(), dtype=object)
        src = np.asarray(batch["src_host"].to_pylist(), dtype=object)
        if not len(dst):
            return pa.table({
                "dst_url": pa.array([], pa.string()),
                "anchor": pa.array([], pa.string()),
                "src_host": pa.array([], pa.string()),
                "n_p": pa.array([], pa.int64()),
            })
        order = np.lexsort((src, anc, dst))
        d_s, a_s, s_s = dst[order], anc[order], src[order]
        new = np.empty(len(d_s), dtype=bool)
        new[0] = True
        new[1:] = (d_s[1:] != d_s[:-1]) | (a_s[1:] != a_s[:-1]) | (s_s[1:] != s_s[:-1])
        starts = np.flatnonzero(new)
        counts = np.diff(np.append(starts, len(d_s)))
        return pa.table({
            "dst_url": pa.array(d_s[starts], pa.string()),
            "anchor": pa.array(a_s[starts], pa.string()),
            "src_host": pa.array(s_s[starts], pa.string()),
            "n_p": pa.array(counts, pa.int64()),
        })

    def add_part(batch: pa.Table) -> pa.Table:
        # shared partitioning contract (stages/partition.hash_mod)
        part = hash_mod(batch["dst_url"].to_pylist(), num_partitions)
        return batch.append_column("_part", pa.array(part, pa.int32()))

    def resolve(batch: pa.Table) -> pa.Table:
        import numpy as np

        batch = batch.drop_columns(["_part"])
        n = batch.num_rows
        if not n:
            return pa.table({
                "dst_url": pa.array([], pa.string()),
                "n_links": pa.array([], pa.int64()),
                "n_src_hosts": pa.array([], pa.int64()),
                "anchors": pa.array([], pa.string()),
            })
        dst = np.asarray(batch["dst_url"].to_pylist(), dtype=object)
        anc = np.asarray(batch["anchor"].to_pylist(), dtype=object)
        src = np.asarray(batch["src_host"].to_pylist(), dtype=object)
        cnt = batch["n_p"].to_numpy(zero_copy_only=False)
        order = np.lexsort((src, anc, dst))
        d_s, a_s, s_s, c_s = dst[order], anc[order], src[order], cnt[order]
        new_dst = np.empty(n, dtype=bool)
        new_dst[0] = True
        new_dst[1:] = d_s[1:] != d_s[:-1]
        starts = np.flatnonzero(new_dst)
        ends = np.append(starts[1:], n)
        out_dst, out_n, out_h, out_a = [], [], [], []
        for s, e in zip(starts, ends):
            out_dst.append(d_s[s])
            out_n.append(int(c_s[s:e].sum()))
            out_h.append(len(set(s_s[s:e])))
            out_a.append(sep.join(sorted(set(a_s[s:e]))))
        return pa.table({
            "dst_url": pa.array(out_dst, pa.string()),
            "n_links": pa.array(out_n, pa.int64()),
            "n_src_hosts": pa.array(out_h, pa.int64()),
            "anchors": pa.array(out_a, pa.string()),
        })

    return (
        links_ds.map_batches(partial, batch_format="pyarrow")
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(resolve, batch_format="pyarrow")
    )


def host_pagerank(
    edges_ds, damping: float = 0.85, iters: int = 20
):
    """Host-graph PageRank over the :func:`host_edges` table — the
    classic in-degree-with-endorsement quality signal (spam farms get high
    raw in-degree but low rank because their endorsers have none).

    The HOST graph is distinct-host-pair-bounded (~10^7 hosts / ~10^9
    edges for the full web — hundreds of MB), so after the distributed
    edge rollup the power iteration runs as dense numpy on one node: the
    edge table is collected ONCE (documented ceiling; above it use
    :func:`host_pagerank_sharded`, the dst-hash matvec shard swap —
    bit-identical ranks), ranks iterate with link-weighted transition
    probabilities and uniform dangling-mass redistribution.  Returns a
    pandas DataFrame (host, rank) summing to 1; deterministic float64.
    """
    import numpy as np
    import pandas as pd

    edges = edges_ds.to_pandas()
    if not len(edges):
        return pd.DataFrame({"host": pd.array([], dtype=object),
                             "rank": pd.array([], dtype="float64")})
    hosts = np.unique(
        np.concatenate([edges["src_host"].to_numpy(), edges["dst_host"].to_numpy()])
    )
    ix = {h: i for i, h in enumerate(hosts)}
    n = len(hosts)
    src = edges["src_host"].map(ix).to_numpy()
    dst = edges["dst_host"].map(ix).to_numpy()
    w = edges["n_links"].to_numpy().astype(np.float64)

    out_w = np.zeros(n, dtype=np.float64)
    np.add.at(out_w, src, w)
    p = w / out_w[src]  # transition probability per edge

    r = np.full(n, 1.0 / n, dtype=np.float64)
    dangling = out_w == 0
    for _ in range(iters):
        contrib = np.zeros(n, dtype=np.float64)
        np.add.at(contrib, dst, r[src] * p)
        dangling_mass = r[dangling].sum()
        r = (1.0 - damping) / n + damping * (contrib + dangling_mass / n)
    return pd.DataFrame({"host": hosts, "rank": r})


class _PagerankShard:
    """Ray actor holding one dst-hash stripe of the host edge list.

    Stripe s owns every edge whose dst index satisfies
    ``dst % n_shards == s``; the local contrib slot for dst d is
    ``d // n_shards`` (a perfect stripe, so assembling the full contrib
    vector is an exact scatter — no cross-shard float addition).  Edges
    append in global stream order, so each dst's contributions accumulate
    in EXACTLY the order the dense kernel's ``np.add.at`` visits them —
    that ordering is what makes the sharded ranks bit-identical.
    """

    def __init__(self, n_hosts: int, n_shards: int, shard_id: int):
        self.n_shards = n_shards
        self.shard_id = shard_id
        self.stripe_len = (n_hosts - shard_id + n_shards - 1) // n_shards
        self._src, self._dst_local, self._w = [], [], []
        self.src = self.dst_local = self.p = None

    def add_edges(self, src_idx, dst_idx, w) -> int:
        import numpy as np

        self._src.append(np.asarray(src_idx, dtype=np.int64))
        self._dst_local.append(np.asarray(dst_idx, dtype=np.int64) // self.n_shards)
        self._w.append(np.asarray(w, dtype=np.float64))
        return len(src_idx)

    def finalize(self, out_w) -> int:
        """out_w = global out-weight vector (broadcast once); turns the
        buffered weights into per-edge transition probabilities."""
        import numpy as np

        self.src = (
            np.concatenate(self._src) if self._src else np.empty(0, np.int64)
        )
        self.dst_local = (
            np.concatenate(self._dst_local)
            if self._dst_local
            else np.empty(0, np.int64)
        )
        w = np.concatenate(self._w) if self._w else np.empty(0, np.float64)
        self._src = self._dst_local = self._w = None
        self.p = w / out_w[self.src] if len(w) else w
        return len(self.src)

    def matvec(self, r):
        """One power-iteration partial: dense contrib over this stripe."""
        import numpy as np

        local = np.zeros(self.stripe_len, dtype=np.float64)
        if len(self.src):
            np.add.at(local, self.dst_local, r[self.src] * self.p)
        return local


def _shard_cpus(total_cpus: float, n_shards: int) -> float:
    """Per-shard CPU request sized so the WHOLE pool always schedules:
    1 full core each when the cluster is large, else at most half the
    cluster spread over all shards — rounded DOWN (and floored at Ray's
    1e-4 resource granularity only when that keeps the sum under
    ``total_cpus``) so no rounding artifact can push
    ``n_shards * shard_cpus`` past the cluster and wedge the first
    ``ray.get`` forever.  A fixed 0.05 floor here once re-created the
    hang for ``n_shards > 20x`` cluster CPUs (tests pin the invariant)."""
    if total_cpus >= 2 * n_shards:
        return 1.0
    if n_shards * 0.0001 > total_cpus:
        # below Ray's 1e-4 resource granularity there is NO request that
        # schedules all shards — fail loudly instead of hanging
        raise ValueError(
            f"n_shards={n_shards} cannot all schedule on "
            f"{total_cpus} CPUs; reduce n_shards"
        )
    return max(int(total_cpus / (2 * n_shards) * 10_000) / 10_000, 0.0001)


def host_pagerank_sharded(
    edges_ds, damping: float = 0.85, iters: int = 20, n_shards: int = 4,
    stream_batch_rows: int = 65_536,
):
    """Dst-hash sharded matvec PageRank — :func:`host_pagerank`'s
    documented swap for edge tables past the one-node collect ceiling.
    Bit-identical ranks (``np.array_equal``) given the same edge-block
    order, verified in tests/test_links.py.

    Scale shape: the edge list lives on ``n_shards`` actors (1/n_shards
    each, striped by ``dst_idx % n_shards``); the driver holds only the
    O(n_hosts) rank / out-weight vectors (8 B/host — the same ~10^7-host
    ceiling the dense path's RESULT already implies) and broadcasts the
    rank vector once per iteration via ``ray.put``.  Loading streams the
    materialized edge table through the driver one batch at a time
    (vocabulary pass + index/ship pass); a production variant would write
    the rolled-up edges as dst-hash-partitioned parquet and let each shard
    read its stripe directly — the iteration loop is unchanged.

    Exactness: per-dst contributions accumulate in global edge order
    within each stripe (stable filter of the stream), out-weights are
    integer-valued float64 sums (order-free), and the rank update and
    dangling-mass reduction run on the driver with the dense kernel's own
    expressions — so every float op sequence matches the dense path.
    """
    import numpy as np
    import pandas as pd
    import ray

    # Deadlock guard: n_shards dedicated CPUs on a cluster with fewer
    # total CPUs can never all schedule, and the first ray.get would wait
    # forever.  Shards are memory-resident with bursty matvec compute, so
    # on small clusters request fractional CPUs (half the cluster spread
    # over all shards) instead of refusing; at scale (CPUs >> n_shards)
    # each shard still gets a dedicated core.
    total_cpus = ray.cluster_resources().get("CPU", float(n_shards))
    shard_cpus = _shard_cpus(total_cpus, n_shards)

    edges = edges_ds.materialize()
    # Pass 1 — host vocabulary: per-batch unique partials folded
    # INCREMENTALLY so driver memory is O(distinct hosts + fold buffer),
    # not O(edges) (hosts repeat across batches; buffering every batch's
    # partial until one final unique would re-create the one-node edge
    # collect this function exists to avoid).
    hosts = np.empty(0, dtype=object)
    buf, buf_rows = [], 0
    for b in edges.iter_batches(batch_format="pyarrow",
                                batch_size=stream_batch_rows):
        if not b.num_rows:
            continue
        buf.append(np.unique(np.concatenate([
            np.asarray(b["src_host"].to_pylist(), dtype=object),
            np.asarray(b["dst_host"].to_pylist(), dtype=object),
        ])))
        buf_rows += len(buf[-1])
        if buf_rows > max(1_000_000, 4 * len(hosts)):
            hosts = np.unique(np.concatenate([hosts] + buf))
            buf, buf_rows = [], 0
    if buf:
        hosts = np.unique(np.concatenate([hosts] + buf))
    if not len(hosts):
        return pd.DataFrame({"host": pd.array([], dtype=object),
                             "rank": pd.array([], dtype="float64")})
    n = len(hosts)

    ShardActor = ray.remote(num_cpus=shard_cpus)(_PagerankShard)
    shards = [ShardActor.remote(n, n_shards, s) for s in range(n_shards)]

    try:
        # Pass 2 — index + ship: stream batches in dataset order, split
        # each by dst stripe (stable masks preserve per-dst order),
        # accumulate the global out-weights on the driver
        # (integer-exact in float64).
        out_w = np.zeros(n, dtype=np.float64)
        pending = []
        for b in edges.iter_batches(batch_format="pyarrow",
                                    batch_size=stream_batch_rows):
            if not b.num_rows:
                continue
            src = np.searchsorted(
                hosts, np.asarray(b["src_host"].to_pylist(), dtype=object))
            dst = np.searchsorted(
                hosts, np.asarray(b["dst_host"].to_pylist(), dtype=object))
            w = b["n_links"].to_numpy(zero_copy_only=False).astype(np.float64)
            np.add.at(out_w, src, w)
            stripe = dst % n_shards
            for s in range(n_shards):
                m = stripe == s
                if m.any():
                    pending.append(
                        shards[s].add_edges.remote(src[m], dst[m], w[m]))
        ray.get(pending)
        out_w_ref = ray.put(out_w)
        ray.get([s.finalize.remote(out_w_ref) for s in shards])

        r = np.full(n, 1.0 / n, dtype=np.float64)
        dangling = out_w == 0
        for _ in range(iters):
            r_ref = ray.put(r)
            locals_ = ray.get([s.matvec.remote(r_ref) for s in shards])
            contrib = np.zeros(n, dtype=np.float64)
            for s in range(n_shards):
                contrib[s::n_shards] = locals_[s]
            dangling_mass = r[dangling].sum()
            r = (1.0 - damping) / n + damping * (contrib + dangling_mass / n)
    finally:
        # also on error: a raised load/iterate step must not leak
        # n_shards actors pinning the edge stripes for the process life
        for s in shards:
            ray.kill(s)
    return pd.DataFrame({"host": hosts, "rank": r})


def host_components(edges_ds, num_partitions: int = 16, max_rounds: int = 30):
    """Undirected connected components of the host graph — the
    domain-cluster signal (mirror farms, link rings, site families share a
    component).  Input is the :func:`host_edges` table; output is one row
    per edge-endpoint host: ``(host, component)`` with ``component`` the
    LEXICOGRAPHICALLY smallest host of the component — a deterministic,
    engine-independent canonical label.

    Shape: the host universe is distinct-host-bounded (same ~10^7 ceiling
    as :func:`host_pagerank`), so hosts factorize to dense int ids with
    ONE distinct pass and a sorted broadcast table (sorted order makes
    min-id == lexicographic-min); the component resolution itself is fully
    distributed — :func:`..dedup.propagate_min_labels` pointer-jumping
    min-label propagation, O(log diameter) exchanges of thin
    ``(node, label)`` int rows.  Above the host-universe ceiling, swap the
    broadcast factorization for a hash-partitioned string-min propagation
    (same kernel keyed on the strings directly).
    """
    import numpy as np
    import ray

    from .dedup import propagate_min_labels

    edges = edges_ds.materialize()

    def hosts_partial(batch: pa.Table) -> pa.Table:
        hs = np.unique(np.concatenate([
            batch["src_host"].to_numpy(zero_copy_only=False),
            batch["dst_host"].to_numpy(zero_copy_only=False),
        ])) if batch.num_rows else np.array([], dtype=object)
        return pa.table({"host": pa.array(hs.astype(object), pa.string())})

    host_list = sorted(
        edges.map_batches(hosts_partial, batch_format="pyarrow").unique("host")
    )
    id_of = {h: i for i, h in enumerate(host_list)}
    fwd_ref = ray.put(id_of)
    rev_ref = ray.put(np.asarray(host_list, dtype=object))

    def to_int(batch: pa.Table) -> pa.Table:
        m = ray.get(fwd_ref)
        return pa.table({
            "id_a": pa.array(
                [m[h] for h in batch["src_host"].to_pylist()], pa.int64()
            ),
            "id_b": pa.array(
                [m[h] for h in batch["dst_host"].to_pylist()], pa.int64()
            ),
        })

    labels = propagate_min_labels(
        edges.map_batches(to_int, batch_format="pyarrow"),
        num_partitions=num_partitions,
        max_rounds=max_rounds,
    )

    def back(batch: pa.Table) -> pa.Table:
        rev = ray.get(rev_ref)
        node = batch["node"].to_numpy(zero_copy_only=False)
        lab = batch["label"].to_numpy(zero_copy_only=False)
        return pa.table({
            "host": pa.array(rev[node].astype(object), pa.string()),
            "component": pa.array(rev[lab].astype(object), pa.string()),
        })

    return labels.map_batches(back, batch_format="pyarrow")
