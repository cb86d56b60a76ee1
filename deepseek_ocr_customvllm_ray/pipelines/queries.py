"""Driver-contract query implementations (SURVEY.md §2 coverage).

Each function takes ``sf_dir`` (a directory of the driver's parquet tables)
and returns a Dataset / DataFrame / Arrow table.  The matching DuckDB oracle
SQL lives in ``__ray_entry__.py``.  Column names are kept identical between
the Ray result and the SQL (the driver hash-compares values after sorting
columns by name).

The ``documents`` table (doc_id, text, lang, source, n_chars) stands in for
the pages table (doc_id -> url, text -> html payload) per FIXTURES.md §5;
the byte-identity fixtures for the full extraction contract live in the
pytest suite over the engine's own seeded corpus.
"""

from __future__ import annotations

import html as _html
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import ExtractConfig
from ..sources.pdfpayload import build_pdf_payload
from ..stages import analysis, dedup, similarity
from .extract import build_extract_pipeline


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(os.path.join(sf_dir, f"{table}.parquet"), columns=columns)


# --- documents-as-pages adapters -----------------------------------------

_DOC_HTML_TEMPLATE = (
    "<html><head><title>doc</title><script>x()</script></head><body>"
    '<nav><a href="/">Home</a> <a href="/a">Archive</a> <a href="/b">About</a></nav>'
    '<div class="sidebar"><a href="/1">one</a> <a href="/2">two</a> <a href="/3">three</a></div>'
    '<div id="main-content"><p>{body}</p></div>'
    "<footer>Copyright 2026. <a href=\"/tos\">Terms</a></footer>"
    "</body></html>"
)


def docs_as_html_pages(batch: pa.Table) -> pa.Table:
    """documents rows -> pages rows with the text wrapped in boilerplate
    HTML; extraction must recover ``text`` byte-identically."""
    urls = [str(d) for d in batch["doc_id"].to_pylist()]
    payloads = [
        _DOC_HTML_TEMPLATE.format(body=_html.escape(t or "")).encode("utf-8")
        for t in batch["text"].to_pylist()
    ]
    n = len(urls)
    import datetime as dt

    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array([dt.datetime(2026, 1, 1)] * n, pa.timestamp("us")),
            "html": pa.array(payloads, pa.binary()),
            "lang": batch["lang"],
        }
    )


def docs_as_pdf_pages(batch: pa.Table) -> pa.Table:
    """documents rows -> pages rows whose payload is a one-page synthetic
    PDF whose emission is the text; the mock OCR contract then makes
    markdown = trim(text) + the page marker + chunk newline."""
    urls = [str(d) for d in batch["doc_id"].to_pylist()]
    payloads = [
        build_pdf_payload([{"width": 1000, "height": 1400, "emission": t or ""}])
        for t in batch["text"].to_pylist()
    ]
    import datetime as dt

    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array([dt.datetime(2026, 1, 1)] * len(urls), pa.timestamp("us")),
            "html": pa.array(payloads, pa.binary()),
            "lang": batch["lang"],
        }
    )


# --- extraction queries ---------------------------------------------------


def q_extract_html(sf_dir: str):
    """HTML branch round-trip: boilerplate-wrapped text -> extracted_text."""
    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    pages = ds.map_batches(docs_as_html_pages, batch_format="pyarrow")
    # shuffle dedup: the upstream synthesizes payloads per row, so the
    # broadcast strategy's second upstream pass costs more than the small
    # payload exchange saves (see ExtractConfig.page_dedup_strategy).
    cfg = ExtractConfig(page_dedup_strategy="shuffle")  # pool max = default 8
    out = build_extract_pipeline(pages, cfg)
    return out.select_columns(["url", "extracted_text"])


def q_extract_pdf_markdown(sf_dir: str):
    """PDF branch contract on plain-text emissions (suppression off so the
    transform is SQL-expressible)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    pages = ds.map_batches(docs_as_pdf_pages, batch_format="pyarrow")
    # shuffle dedup: synthesized upstream, see q_extract_html
    cfg = ExtractConfig(
        ngram_suppress=False, page_dedup_strategy="shuffle"
    )
    out = build_extract_pipeline(pages, cfg)
    return out.select_columns(["url", "markdown"])


# --- dedup / analysis queries --------------------------------------------


def q_exact_dedup_keepers(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return dedup.exact_dedup_keepers(ds, "text", "doc_id")


def q_token_counts(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        analysis.make_token_count_batch("text", "doc_id"), batch_format="pyarrow"
    )


def q_length_buckets(sf_dir: str):
    """log2 byte-length histogram with per-batch partial aggregation before
    the (tiny) groupby — the pre-aggregate pattern."""
    ds = _read(sf_dir, "documents", ["n_chars"])

    def partial(batch: pa.Table) -> pa.Table:
        arr = batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.float64)
        arr = arr[arr > 0]  # guard log2(0) -> -inf (oracle filters alike)
        if arr.size == 0:
            return pa.table({
                "bucket": pa.array([], pa.int64()),
                "n_docs_p": pa.array([], pa.int64()),
                "total_chars_p": pa.array([], pa.int64()),
            })
        buckets = np.floor(np.log2(arr)).astype(np.int64)
        uniq, inv = np.unique(buckets, return_inverse=True)
        n = np.bincount(inv)
        chars = np.bincount(inv, weights=arr).astype(np.int64)
        return pa.table({
            "bucket": pa.array(uniq, pa.int64()),
            "n_docs_p": pa.array(n, pa.int64()),
            "total_chars_p": pa.array(chars, pa.int64()),
        })

    from ray.data.aggregate import Sum

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(
            Sum("n_docs_p", alias_name="n_docs"),
            Sum("total_chars_p", alias_name="total_chars"),
        )
    )


def q_source_lineage(sf_dir: str):
    """Per-source lineage counters (G2 analog: per-partition metrics)."""
    from ray.data.aggregate import Count, Max, Min, Sum

    ds = _read(sf_dir, "documents", ["doc_id", "source", "n_chars"])
    return ds.groupby("source").aggregate(
        Count(alias_name="n_docs"),
        Sum("n_chars", alias_name="total_chars"),
        Min("doc_id", alias_name="min_doc_id"),
        Max("doc_id", alias_name="max_doc_id"),
    )


def q_lang_distribution(sf_dir: str):
    from ray.data.aggregate import Count

    ds = _read(sf_dir, "documents", ["lang"])
    return ds.groupby("lang").aggregate(Count(alias_name="n_docs"))


def q_top_sources_by_chars(sf_dir: str):
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", ["source", "n_chars"])
    agg = ds.groupby("source").aggregate(Sum("n_chars", alias_name="total_chars"))
    return agg.sort("total_chars", descending=True).limit(5)


def q_quality_scores(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = ds.map_batches(
        analysis.make_quality_batch("text", "doc_id"), batch_format="pyarrow"
    )
    return out.select_columns(["doc_id", "n_chars", "n_tokens"])


def q_bpe_token_counts(sf_dir: str):
    """GPT-2-style pre-tokenizer token counts (the BPE-ish counting path of
    SURVEY's token-counting family; golden-snapshot oracle)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        analysis.make_bpe_token_count_batch("text", "doc_id"), batch_format="pyarrow"
    )


def q_langid_heuristic(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        analysis.make_langid_batch("text", "doc_id"), batch_format="pyarrow"
    )


def q_fingerprints(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        analysis.make_fingerprint_batch("text", "doc_id"), batch_format="pyarrow"
    )


def q_minhash_clusters(sf_dir: str):
    """Distributed MinHash-LSH near-dup clusters: labels computed by
    Dataset-native min-label propagation (no driver-side union-find, no
    whole-corpus id materialization)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return dedup.minhash_near_dup_clusters_ds(ds, "text", "doc_id", threshold=0.8)


def q_simhash_signatures(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return dedup.simhash_signatures(ds, "text", "doc_id")


def _point_vector(sf_dir: str, vec_id: int = 0) -> np.ndarray:
    """Fetch one query vector by key: a driver-side parquet point read with
    a pushed-down row filter — no row-lambda Dataset scan."""
    import pyarrow.dataset as pads

    t = pads.dataset(
        os.path.join(sf_dir, "embeddings.parquet"), format="parquet"
    ).to_table(columns=["embedding"], filter=pads.field("vec_id") == vec_id)
    return np.asarray(t["embedding"][0].as_py(), dtype=np.float64)


def q_embedding_knn(sf_dir: str):
    """Top-10 cosine neighbours of vec_id 0 (brute-force baseline)."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    q0 = _point_vector(sf_dir, 0)
    out = similarity.knn_brute(ds, np.asarray([q0]), "embedding", "vec_id", k=10)
    return out[["id"]].rename(columns={"id": "vec_id"})


def q_top2_docs_per_source(sf_dir: str):
    """Per-group top-k (window-function analog): 2 longest docs per source,
    deterministic tie-break on doc_id.  Per-batch local top-2 partials
    (vectorized lexsort + group-boundary rank) + a tiny driver resolve —
    the `q_top20_longest_docs` pattern; never funnels a low-cardinality
    key's whole group into one frame (a 20-value key would cap
    parallelism at 20 and hold ~1/20 of the corpus per group)."""

    ds = _read(sf_dir, "documents", ["doc_id", "source", "n_chars"])

    def local_top2(batch: pa.Table) -> pa.Table:
        if not batch.num_rows:
            return batch
        src = batch["source"].to_numpy(zero_copy_only=False)
        _, codes = np.unique(src.astype(str), return_inverse=True)
        nc = batch["n_chars"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        did = batch["doc_id"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        order = np.lexsort((did, -nc, codes))
        codes_s = codes[order]
        new = np.concatenate([[True], codes_s[1:] != codes_s[:-1]])
        pos = np.arange(len(codes_s))
        start = pos[new][np.cumsum(new) - 1]
        return batch.take(pa.array(order[(pos - start) < 2]))

    local = ds.map_batches(local_top2, batch_format="pyarrow").to_pandas()
    return (
        local.sort_values(
            ["source", "n_chars", "doc_id"], ascending=[True, False, True]
        )
        .groupby("source", sort=False)
        .head(2)
        .reset_index(drop=True)
    )


def q_customers_without_orders(sf_dir: str):
    """Broadcast ANTI-join: count customers with no orders (order custkey
    set via ray.put, vectorized isin filter — no shuffle).  Returns a
    1-row count so the result keeps a schema even when the anti-join is
    empty.

    NULL semantics match the SQL ``NOT IN`` oracle for null-free order
    keys: null o_custkey values are dropped from the broadcast set (they
    can never equal anything), and a null c_custkey row is EXCLUDED from
    the count (``NULL NOT IN (...)`` is unknown in SQL; Arrow's ``is_in``
    treats null as non-member, so the exclusion is an explicit
    ``is_valid`` conjunct)."""
    import pandas as pd
    import ray

    custkeys = _read(sf_dir, "orders", ["o_custkey"]).unique("o_custkey")
    ref = ray.put(pa.array(sorted(k for k in custkeys if k is not None), pa.int64()))

    cust = _read(sf_dir, "customer", ["c_custkey"])

    def anti(batch: pa.Table) -> pa.Table:
        keys = ray.get(ref)
        ck = batch["c_custkey"].cast(pa.int64())
        mask = pc.and_(pc.invert(pc.is_in(ck, value_set=keys)), pc.is_valid(ck))
        return batch.filter(mask)

    n = cust.map_batches(anti, batch_format="pyarrow").count()
    return pd.DataFrame({"n_customers": pd.array([n], dtype="int64")})


def q_source_median_chars(sf_dir: str):
    """Exact per-group median (DuckDB semantics: mean of the two middle
    values for even counts) via the histogram-refinement grouped-quantile
    kernel — map-only passes with KB partials, no per-group materialization
    (the previous map_groups(pandas) held ~1/20 of the corpus per group).
    The two middle order statistics are rank overrides ((n+1)//2 and
    n//2+1); their mean is the SQL median."""
    import pandas as pd

    from ..stages.quantiles import grouped_exact_quantiles

    ds = _read(sf_dir, "documents", ["source", "n_chars"])
    tbl = grouped_exact_quantiles(
        ds,
        "n_chars",
        "source",
        ps=[0.5, 1.0],  # labels only — ranks below select the middle pair
        ranks=[lambda n: (n + 1) // 2, lambda n: n // 2 + 1],
    )
    df = tbl.to_pandas()
    lo = df[df["p"] == 0.5].set_index("source")["value"].astype(float)
    hi = df[df["p"] == 1.0].set_index("source")["value"].astype(float)
    med = (lo + hi) / 2.0
    return pd.DataFrame({"source": med.index, "median_chars": med.to_numpy()})


def q_distinct_langs_per_source(sf_dir: str):
    """count(DISTINCT lang) per source via per-batch distinct-pair partials
    (np.unique pair factorization — no per-row Python) and a tiny driver
    resolve: the partial volume is bounded by |sources| x |langs| per
    batch, not by the corpus."""
    import pandas as pd

    ds = _read(sf_dir, "documents", ["source", "lang"])

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table({
            "source": pa.array([], pa.string()),
            "lang": pa.array([], pa.string()),
        })
        if not batch.num_rows:
            return empty
        # SQL GROUP BY semantics: a NULL source is a real group, and a
        # NULL lang must reach the resolve (count(DISTINCT lang) skips it
        # there, but the source row itself survives with n_langs=0) — so
        # nulls are kept as their own dictionary category (code -1), not
        # filtered
        se = pc.dictionary_encode(batch["source"].combine_chunks())
        le = pc.dictionary_encode(batch["lang"].combine_chunks())
        si = np.asarray(pc.fill_null(se.indices, -1), dtype=np.int64)
        li = np.asarray(pc.fill_null(le.indices, -1), dtype=np.int64)
        span = np.int64(len(le.dictionary) + 1)
        comb = np.unique((si + 1) * span + (li + 1))
        s_codes = comb // span - 1
        l_codes = comb % span - 1
        src_vals = se.dictionary.take(
            pa.array([c if c >= 0 else None for c in s_codes], pa.int64()))
        lang_vals = le.dictionary.take(
            pa.array([c if c >= 0 else None for c in l_codes], pa.int64()))
        return pa.table({"source": src_vals, "lang": lang_vals})

    pairs = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    n = (
        pairs.drop_duplicates()
        .groupby("source", sort=True, dropna=False)["lang"]
        .nunique()  # dropna=True default: NULL langs don't count
    )
    return pd.DataFrame({
        "source": n.index,
        "n_langs": n.to_numpy().astype("int64"),
    })


def q_events_last_order(sf_dir: str):
    """As-of join: for each event, the o_orderdate of the user's latest
    order at or before the event time (backward as-of; DuckDB ASOF JOIN
    oracle).  One co-partitioned shuffle keyed on the int user key."""
    from ..stages.joins import asof_join

    events = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])
    out = asof_join(
        events, orders,
        left_key="user_id", right_key="o_custkey",
        left_ts="ts", right_ts="o_orderdate",
        left_cols=["event_id"], right_cols=["o_orderdate"],
    )

    def rename(batch: pa.Table) -> pa.Table:
        # the union-tag pattern pads each side's columns with nulls, which
        # promotes int64 to float64 through pandas — cast back at the edge
        return pa.table({
            "event_id": batch["event_id"].cast(pa.int64()),
            "last_order_date": batch["o_orderdate"].cast(pa.timestamp("us")),
        })

    return out.map_batches(rename, batch_format="pyarrow")


def q_events_recent_orders(sf_dir: str):
    """Range join (windowed): per event, the count of the user's orders in
    the 90 days up to the event (one key-co-partitioned shuffle; counting
    resolved inside the partition — DuckDB LEFT JOIN + interval oracle)."""
    import pandas as pd

    from ..stages.joins import range_join_count

    events = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])
    out = range_join_count(
        events, orders,
        left_key="user_id", right_key="o_custkey",
        left_ts="ts", right_ts="o_orderdate",
        window=pd.Timedelta(days=90),
        left_cols=["event_id"],
        out_col="n_recent_orders",
    )
    return out.map_batches(
        lambda t: pa.table({
            "event_id": t["event_id"].cast(pa.int64()),
            "n_recent_orders": t["n_recent_orders"],
        }),
        batch_format="pyarrow",
    )


def q_approx_distinct_texts(sf_dir: str):
    """HyperLogLog approximate distinct (mergeable-sketch pattern): one
    constant-size sketch per batch, merged driver-side.  Rows-only (the
    estimate is approximate by design; accuracy asserted in
    tests/test_sketches.py)."""
    import pandas as pd

    from ..functions.sketches import HyperLogLog

    ds = _read(sf_dir, "documents", ["text"])

    def sketch(batch: pa.Table) -> pa.Table:
        h = HyperLogLog(p=12)
        h.add_many([t or "" for t in batch["text"].to_pylist()])
        return pa.table({"sketch": pa.array([h.to_bytes()], pa.binary())})

    merged = HyperLogLog(p=12)
    for b in ds.map_batches(sketch, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for s in b["sketch"].to_pylist():
            merged = merged.merge(HyperLogLog.from_bytes(s, 12))
    return pd.DataFrame({"approx_distinct": pd.array([int(round(merged.estimate()))], dtype="int64")})


def q_lineitem_open_orders(sf_dir: str):
    """Broadcast SEMI-join: lineitem rows whose order is 'O'-status, counted
    per returnflag.  The key set is broadcast exactly (the Bloom-filter
    variant trades memory for false positives and lives in
    functions/sketches.py with its own tests)."""
    import ray
    from ray.data.aggregate import Count

    open_keys = (
        _read(sf_dir, "orders", ["o_orderkey", "o_orderstatus"])
        .map_batches(
            lambda t: t.filter(pc.equal(t["o_orderstatus"], "O")).select(["o_orderkey"]),
            batch_format="pyarrow",
        )
        .to_pandas()["o_orderkey"]
    )
    ref = ray.put(pa.array(open_keys.unique(), pa.int64()))

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_returnflag"])

    def semi(batch: pa.Table) -> pa.Table:
        keys = ray.get(ref)
        mask = pc.is_in(batch["l_orderkey"].cast(pa.int64()), value_set=keys)
        return batch.filter(mask)

    return (
        li.map_batches(semi, batch_format="pyarrow")
        .groupby("l_returnflag")
        .aggregate(Count(alias_name="n_lineitems"))
    )


def q_top20_longest_docs(sf_dir: str):
    """Global top-k via local per-batch top-k + tiny driver merge (no full
    sort): deterministic with (n_chars desc, doc_id asc) tie-break."""
    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])

    def local_top(batch: pa.Table) -> pa.Table:
        import pandas as pd

        df = batch.to_pandas().sort_values(
            ["n_chars", "doc_id"], ascending=[False, True]
        ).head(20)
        return pa.Table.from_pandas(df, preserve_index=False)

    local = ds.map_batches(local_top, batch_format="pyarrow").to_pandas()
    return (
        local.sort_values(["n_chars", "doc_id"], ascending=[False, True])
        .head(20)
        .reset_index(drop=True)
    )


def q_union_distinct_keys(sf_dir: str):
    """union + distinct: |customer keys ∪ supplier keys|."""
    import pandas as pd

    cust = _read(sf_dir, "customer", ["c_custkey"]).map_batches(
        lambda t: pa.table({"k": t["c_custkey"].cast(pa.int64())}), batch_format="pyarrow"
    )
    supp = _read(sf_dir, "supplier", ["s_suppkey"]).map_batches(
        lambda t: pa.table({"k": t["s_suppkey"].cast(pa.int64())}), batch_format="pyarrow"
    )
    n = len(cust.union(supp).unique("k"))
    return pd.DataFrame({"n_keys": pd.array([n], dtype="int64")})


# --- relational coverage (engine primitives over TPC-H-ish tables) --------


def q_lineitem_pricing(sf_dir: str):
    """TPC-H Q1-shaped aggregate; money summed in integer cents
    (floor(x*100)) so the distributed sum is order-independent and matches
    DuckDB bit-for-bit."""
    from ray.data.aggregate import Count, Sum

    ds = _read(
        sf_dir, "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        cents = pc.cast(pc.floor(pc.multiply(batch["l_extendedprice"], 100.0)), pa.int64())
        qty = pc.cast(batch["l_quantity"], pa.int64())
        return pa.table({
            "l_returnflag": batch["l_returnflag"],
            "l_linestatus": batch["l_linestatus"],
            "qty": qty,
            "price_cents": cents,
        })

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("qty", alias_name="sum_qty"),
            Sum("price_cents", alias_name="sum_price_cents"),
            Count(alias_name="count_order"),
        )
    )


def q_top_customers(sf_dir: str):
    """Broadcast join: orders (fact) x customer (small side via ray.put),
    then top-10 by revenue cents."""
    import ray
    from ray.data.aggregate import Count, Sum

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).to_pandas()
    # broadcast two parallel Arrow arrays (key -> segment); the per-batch
    # join is index_in + take (fully vectorized, no per-row dict lookups)
    key_arr = pa.array(cust["c_custkey"].astype("int64"), pa.int64())
    seg_arr = pa.array(cust["c_mktsegment"], pa.string())
    ref = ray.put((key_arr, seg_arr))

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def join_batch(batch: pa.Table) -> pa.Table:
        keys, segs = ray.get(ref)
        idx = pc.index_in(batch["o_custkey"].cast(pa.int64()), value_set=keys)
        seg = pc.fill_null(pc.take(segs, idx), "UNKNOWN")  # null idx = no match
        cents = pc.cast(pc.floor(pc.multiply(batch["o_totalprice"], 100.0)), pa.int64())
        return pa.table({
            "c_mktsegment": seg,
            "price_cents": cents,
        })

    agg = (
        orders.map_batches(join_batch, batch_format="pyarrow")
        .groupby("c_mktsegment")
        .aggregate(
            Sum("price_cents", alias_name="revenue_cents"),
            Count(alias_name="n_orders"),
        )
    )
    return agg.sort("revenue_cents", descending=True).limit(10)


def q_orders_customer_join(sf_dir: str):
    """Distributed equi-join (shuffle hash join): the non-broadcast scale
    path of J1 — per-order row-level join to the customer dimension
    (broadcast joins like ``q_top_customers`` stop working when the
    dimension side outgrows worker heap; this path only ever co-locates
    one key's rows)."""
    from ..stages.joins import hash_join

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    out = hash_join(
        orders, cust, "o_custkey", "c_custkey",
        left_cols=["o_orderkey", "o_totalprice"],
        right_cols=["c_mktsegment"],
        how="inner",
    )

    def fin(batch: pa.Table) -> pa.Table:
        cents = pc.cast(pc.floor(pc.multiply(batch["o_totalprice"], 100.0)), pa.int64())
        return pa.table({
            "o_orderkey": batch["o_orderkey"].cast(pa.int64()),
            "c_mktsegment": batch["c_mktsegment"],
            "price_cents": cents,
        })

    return out.map_batches(fin, batch_format="pyarrow")


def q_events_lag(sf_dir: str):
    """Per-user LAG window function: previous event's ts + exact
    microsecond inter-arrival delta (one key exchange, vectorized
    lexsort+shift per partition — no per-key Python)."""
    from ..stages.windows import key_lag

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    return key_lag(ds, "user_id", "ts", "event_id", num_partitions=16)


def q_events_row_number(sf_dir: str):
    """Per-user ROW_NUMBER (event sequence index) — integer-exact window
    function, same single-exchange sweep as events_lag."""
    from ..stages.windows import key_row_number

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    return key_row_number(ds, "user_id", "ts", "event_id", num_partitions=16)


def q_events_cumsum(sf_dir: str):
    """Per-user cumulative spend (running total window function):
    SUM(cents) OVER (PARTITION BY user ORDER BY ts, id ROWS UNBOUNDED
    PRECEDING) — integer cents so prefix sums are exact; same
    single-exchange lexsort sweep as events_lag."""
    from ..stages.windows import key_cumsum

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        cents = pc.cast(pc.floor(pc.multiply(batch["value"], 100.0)), pa.int64())
        return pa.table({
            "event_id": batch["event_id"],
            "user_id": batch["user_id"],
            "ts": batch["ts"],
            "value_cents": cents,
        })

    prepped = ds.map_batches(prep, batch_format="pyarrow")
    return key_cumsum(
        prepped, "user_id", "ts", "event_id", value_cols=["value_cents"]
    )


def q_events_sessionize(sf_dir: str):
    """Session windows (30-min inactivity gap) per user — the stream-shaped
    operator (SURVEY §2.10 analog): one crc32(user) exchange, then every
    partition resolves ALL its users in a single lexsort + boundary-reduceat
    sweep (stages.windows.sessionize — the key_lag kernel; no per-user
    Python call or pandas frame)."""
    from ..stages.windows import sessionize

    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        cents = pc.cast(pc.floor(pc.multiply(batch["value"], 100.0)), pa.int64())
        return pa.table({
            "user_id": batch["user_id"],
            "ts": batch["ts"],
            "value_cents": cents,
        })

    prepped = ds.map_batches(prep, batch_format="pyarrow")
    return sessionize(
        prepped, "user_id", "ts", gap_minutes=30, value_cols=["value_cents"]
    )


def q_quality_filter(sf_dir: str):
    """Quality-threshold document filter (length + token-count bounds),
    vectorized Arrow predicate."""
    ds = _read(sf_dir, "documents", ["doc_id", "text", "n_chars"])

    def keep(batch: pa.Table) -> pa.Table:
        toks = analysis.whitespace_token_counts(batch["text"])
        ok = pc.and_(
            pc.and_(
                pc.greater_equal(batch["n_chars"], 100),
                pc.less_equal(batch["n_chars"], 400),
            ),
            pc.greater_equal(toks, 20),
        )
        return batch.filter(ok).select(["doc_id"])

    return ds.map_batches(keep, batch_format="pyarrow")


def q_batch_cli_clean(sf_dir: str):
    """Batch-CLI markdown cleaning contract (Scripts/run_batch.py:133-143);
    on tag-free plain text it is a no-op by contract (the per-match cleanup
    loop never runs), which the identity oracle pins."""
    from ..functions.mdtext import batch_cli_clean

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def clean(batch: pa.Table) -> pa.Table:
        out = [batch_cli_clean(t or "") for t in batch["text"].to_pylist()]
        return pa.table({
            "doc_id": batch["doc_id"],
            "cleaned": pa.array(out, pa.large_string()),
        })

    return ds.map_batches(clean, batch_format="pyarrow")


def q_ngram_jaccard_pairs(sf_dir: str):
    """Exact word-3-gram Jaccard near-dup pairs (verify-side measure) over
    MinHash-LSH candidates — distributed end to end: cluster membership via
    min-label propagation, Jaccard verify via shingle-set exchange keyed on
    (endpoint, pair); the driver never materializes a text column."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    clusters = dedup.minhash_near_dup_clusters_ds(ds, "text", "doc_id", threshold=0.5)

    def member_pairs(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.not_equal(batch["id"], batch["cluster_id"]))
        return pa.table({
            "id_a": t["cluster_id"].cast(pa.int64()),
            "id_b": t["id"].cast(pa.int64()),
        })

    pairs = clusters.map_batches(member_pairs, batch_format="pyarrow")
    return dedup.ngram_jaccard_verify(ds, pairs, "text", "doc_id", k=3, threshold=0.5)


def q_simhash_pairs(sf_dir: str):
    """Distributed SimHash near-dup pairs (partition-level bucket
    enumeration, Dataset end to end); deterministic and
    parallelism-invariant, so it pins to a golden-snapshot oracle."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return dedup.simhash_near_dup_pairs(ds, "text", "doc_id", max_hamming=3)


def q_embedding_near_dups(sf_dir: str):
    """Distributed hyperplane-LSH + exact-cosine near-dup pairs.  The
    cosine is pinned as the hex of its float64 buffer (like
    ``image_pipeline``): bucket membership is a pure function of the
    input, each bucket's matmul is deterministic, and cross-set duplicates
    reduce by min() — so the float is bit-stable and snapshot-safe, while
    a str()-rounded float would not round-trip through DuckDB.

    Parameters are corpus-matched: the synthetic embeddings are random
    unit-ish vectors whose max pairwise cosine is ~0.51, so the production
    default (threshold 0.95, 12 planes) returns zero rows — a VACUOUS
    oracle.  threshold=0.3 with 4 planes yields a few hundred
    deterministic pairs, which actually exercises bucketing, verify and
    the min-cosine dedup."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = dedup.embedding_near_dup_pairs(
        ds, "embedding", "vec_id", threshold=0.3, n_planes=4
    )

    def pin(batch: pa.Table) -> pa.Table:
        cos = batch["cosine"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({
            "id_a": batch["id_a"],
            "id_b": batch["id_b"],
            "cosine_hex": pa.array([c.tobytes().hex() for c in cos], pa.string()),
        })

    return out.map_batches(pin, batch_format="pyarrow")


def q_knn_ivf(sf_dir: str):
    """IVF approximate top-10 for vec_id 0 (scale path of embedding_knn).
    The k-means training sample is a deterministic head read of the parquet
    file (file order, not Ray block-arrival order) so the result is
    run-invariant and golden-snapshot-checkable."""
    import pyarrow.dataset as pads

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    q0 = _point_vector(sf_dir, 0)
    head = pads.dataset(
        os.path.join(sf_dir, "embeddings.parquet"), format="parquet"
    ).head(2000, columns=["embedding"])
    sample = np.asarray(head["embedding"].to_pylist(), dtype=np.float64)
    out = similarity.knn_ivf(
        ds, np.asarray([q0]), "embedding", "vec_id", k=10, n_clusters=8, n_probe=4,
        sample_vecs=sample,
    )
    return out[["id"]].rename(columns={"id": "vec_id"})


def q_image_pipeline(sf_dir: str):
    """Multimodal plumbing over documents-as-images (decode/resize/embed
    actor stages; pixel kernels are deterministic stubs)."""
    from ..stages.multimodal import apply_image_pipeline

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def as_images(batch: pa.Table) -> pa.Table:
        return pa.table({
            "id": batch["doc_id"],
            "media": pa.array(
                [(t or "").encode("utf-8") for t in batch["text"].to_pylist()],
                pa.binary(),
            ),
            "mime": pa.array(["image/jpeg"] * batch.num_rows, pa.string()),
        })

    out = apply_image_pipeline(ds.map_batches(as_images, batch_format="pyarrow"))

    def pin_embeddings(batch: pa.Table) -> pa.Table:
        # the driver's value compare str()s cells, and a float32 list column
        # round-trips differently through DuckDB (python list) and pandas
        # (numpy array) — pin the embedding CONTENT as the hex of its
        # float32 buffer instead (golden-snapshot-safe scalar)
        from ..functions.vectors import to_matrix

        mat = to_matrix(batch["embedding"], dtype=np.float32, dim=32)
        return pa.table({
            "id": batch["id"],
            "emb_hex": pa.array([row.tobytes().hex() for row in mat], pa.string()),
        })

    return out.map_batches(pin_embeddings, batch_format="pyarrow")


def q_audio_pipeline(sf_dir: str):
    """Multimodal audio plumbing over documents-as-audio: typed metadata
    derived deterministically per doc, actor-pool feature stage; output is
    scalar-only (duration, rms), so it pins to a golden-snapshot oracle."""
    from ..stages.multimodal import apply_audio_pipeline

    ds = _read(sf_dir, "documents", ["doc_id", "text", "n_chars"])

    def as_audio(batch: pa.Table) -> pa.Table:
        n_chars = batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "id": batch["doc_id"],
            "media": pa.array(
                [(t or "").encode("utf-8") for t in batch["text"].to_pylist()],
                pa.binary(),
            ),
            "mime": pa.array(["audio/wav"] * batch.num_rows, pa.string()),
            "sample_rate": pa.array([16000] * batch.num_rows, pa.int32()),
            # "duration" proportional to the doc: 100 samples per char
            "n_samples": pa.array(n_chars * 100, pa.int64()),
        })

    return apply_audio_pipeline(ds.map_batches(as_audio, batch_format="pyarrow"))


def q_video_pipeline(sf_dir: str):
    """Multimodal video plumbing over documents-as-videos: evenly-spaced
    deterministic frame sampling (one output row per sampled frame);
    deterministic fake frames pin to a golden-snapshot oracle."""
    from ..stages.multimodal import apply_video_pipeline

    ds = _read(sf_dir, "documents", ["doc_id", "text", "n_chars"])

    def as_video(batch: pa.Table) -> pa.Table:
        n_chars = batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "id": batch["doc_id"],
            "media": pa.array(
                [(t or "").encode("utf-8") for t in batch["text"].to_pylist()],
                pa.binary(),
            ),
            "mime": pa.array(["video/mp4"] * batch.num_rows, pa.string()),
            "fps": pa.array([24.0] * batch.num_rows, pa.float64()),
            # one "frame" per 10 chars, at least one
            "n_frames": pa.array(np.maximum(1, n_chars // 10), pa.int64()),
        })

    out = apply_video_pipeline(ds.map_batches(as_video, batch_format="pyarrow"))

    def hex_frames(batch: pa.Table) -> pa.Table:
        # hex instead of raw binary: the driver's value compare str()s each
        # cell and DuckDB surfaces BLOBs as bytearray while pandas gives
        # bytes — same bytes, different str() — so binary columns cannot be
        # golden-compared directly; the hex digest pins identical content
        return pa.table({
            "id": batch["id"],
            "frame_no": batch["frame_no"],
            "frame_hex": pa.array(
                [f.hex() for f in batch["frame"].to_pylist()], pa.string()
            ),
        })

    return out.map_batches(hex_frames, batch_format="pyarrow")


def q_events_hourly(sf_dir: str):
    """Tumbling-window aggregate: events per (event_type, hour)."""
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(batch["ts"], unit="hour")
        cents = pc.cast(pc.floor(pc.multiply(batch["value"], 100.0)), pa.int64())
        return pa.table({
            "event_type": batch["event_type"],
            "hour": hour,
            "value_cents": cents,
        })

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["event_type", "hour"])
        .aggregate(
            Count(alias_name="n_events"),
            Sum("value_cents", alias_name="sum_value_cents"),
        )
    )


# --- training-data ops: sampling / redaction / term stats / packing -------


def q_sample_documents(sf_dir: str):
    """Deterministic 10% uniform sample (md5 threshold; map-only, no
    shuffle; DuckDB recomputes the identical digests for the oracle)."""
    from ..stages.sampling import hash_sample

    ds = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])
    return hash_sample(ds, "doc_id", fraction=0.1, seed=42)


def q_stratified_sample(sf_dir: str):
    """Per-language sampling rates (30% en, 15% de, 5% everything else) —
    the rebalancing step of a multilingual training mix."""
    from ..stages.sampling import stratified_sample

    ds = _read(sf_dir, "documents", ["doc_id", "lang"])
    return stratified_sample(
        ds, "doc_id", "lang", {"en": 0.3, "de": 0.15},
        default_fraction=0.05, seed=42,
    )


def _pii_augmented(batch: pa.Table) -> pa.Table:
    """documents rows -> text with a synthetic, doc_id-derived PII tail.

    The corpus text is PII-free by construction, so the redaction query
    would be vacuous on the raw column; both this adapter and the oracle
    SQL append the same deterministic email/IP/phone so the kernels are
    exercised non-vacuously and still independently checkable."""
    ids = batch["doc_id"].cast(pa.int64())
    ids_np = ids.to_numpy(zero_copy_only=False)
    ids_s = ids.cast(pa.string())
    m200 = pa.array(ids_np % 200).cast(pa.string())
    m1000 = pc.utf8_lpad(pa.array(ids_np % 1000).cast(pa.string()), 3, "0")
    m10000 = pc.utf8_lpad(pa.array(ids_np % 10000).cast(pa.string()), 4, "0")
    txt = pc.binary_join_element_wise(
        batch["text"], " contact user", ids_s, "@mail.example.com from 10.",
        m200, ".7.1 call 555-", m1000, "-", m10000, " end",
        "",
    )
    return pa.table({"doc_id": ids, "text": txt})


def q_pii_redaction(sf_dir: str):
    """Scrub emails/IPs/phones and count removals (Arrow RE2 kernels;
    DuckDB runs the same RE2 patterns for the oracle)."""
    from ..stages.redact import redact_pii

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    aug = ds.map_batches(_pii_augmented, batch_format="pyarrow")
    return redact_pii(aug, "text", "doc_id")


def q_word_frequencies(sf_dir: str):
    """Corpus top-50 terms: per-batch partial counts, vocabulary-sized
    groupby, deterministic (n desc, token) ordering."""
    ds = _read(sf_dir, "documents", ["text"])
    return analysis.word_frequencies(ds, "text", top_k=50)


def q_bigram_lm_perplexity(sf_dir: str):
    """CCNet-style LM quality gate: train an add-0.5 word-bigram LM on
    the corpus (vocabulary-sized shuffles via the frequency kernels,
    model broadcast once), score every doc map-only in an actor pool.
    Emits exact ints (n_bigrams, lp_q20 = sum of 2^20-fixed-point bigram
    log-probs); ppl = exp(-(lp_q20/2^20)/n_bigrams) downstream — raw
    ints keep the contract engine-exact (numpy/DuckDB exp differ 1 ulp).
    """
    from ..stages.lm import bigram_lm_perplexity

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return bigram_lm_perplexity(ds, "text", "doc_id")


def q_ccnet_ppl_buckets(sf_dir: str):
    """CCNet head/middle/tail selection: per-language perplexity
    tertiles over the bigram-LM mean log-prob (monotone in ppl, so no
    engine-side exp), exact thresholds via grouped histogram-refinement,
    map-only bucket assignment with broadcast G x 2 scalars."""
    from ..stages.lm import ccnet_ppl_buckets

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    return ccnet_ppl_buckets(ds, "text", "doc_id", "lang")


def q_compression_ratio(sf_dir: str):
    """zlib compressibility quality signal (CCNet-style): map-only
    (doc_id, n_bytes, n_zlib) ints; golden snapshot oracle (no SQL
    zlib)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        analysis.make_compression_stats_batch("text", "doc_id"),
        batch_format="pyarrow",
    )


def q_bm25_topk(sf_dir: str):
    """BM25 top-20 for the query {hash, join, vector}: one tiny stats
    pass (per-batch int partials), map-only scoring with per-batch top-k,
    tiny global resolve.  Every float expression shares one fixed
    parenthesization with the DuckDB oracle, so even the score column
    hash-matches."""
    from ..stages.retrieval import bm25_topk

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return bm25_topk(ds, "text", "doc_id", ["hash", "join", "vector"], k=20)


def q_bigram_frequencies(sf_dir: str):
    """Corpus top-50 adjacent word pairs (BPE merge-pair count at word
    granularity): per-batch partials, pair-vocabulary groupby,
    deterministic (n desc, pair) ordering."""
    ds = _read(sf_dir, "documents", ["text"])
    return analysis.bigram_frequencies(ds, "text", top_k=50)


def q_weighted_sample(sf_dir: str):
    """Deterministic weighted sample without replacement (Efraimidis-
    Spirakis exponential keys, weight = n_chars): 50 winners, map-only
    partial top-k, id tie-break."""
    from ..stages.sampling import weighted_sample

    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])
    return weighted_sample(ds, "doc_id", "n_chars", k=50, seed=42)


def q_pack_sequences(sf_dir: str):
    """Training sequence packing: 256-token budget, id-range partitioning
    (parallelism-invariant; greedy fill is not SQL-expressible -> golden
    snapshot oracle + serial-reference parity in pytest)."""
    from ..stages.packing import pack_sequences

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return pack_sequences(
        ds, max_tokens=256, range_size=200, num_partitions=8
    )


#: stand-in benchmark phrases for the decontamination query (chosen to hit
#: a non-vacuous subset of the synthetic corpus)
_BENCHMARK_PHRASES = ["slow join", "spark spark", "customer window line"]


def q_benchmark_decontam(sf_dir: str):
    """Eval-set contamination flags: broadcast phrase semi-join, map-only
    (DuckDB checks the same substrings via contains())."""
    from ..stages.decontam import flag_contaminated

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return flag_contaminated(ds, "text", "doc_id", _BENCHMARK_PHRASES)


def q_epoch_shuffle(sf_dir: str):
    """First 20 rows of the seed/epoch-deterministic global training
    shuffle (md5 sort key + distributed range sort; DuckDB recomputes the
    identical keys and ordering)."""
    from ..stages.sampling import epoch_shuffle

    ds = _read(sf_dir, "documents", ["doc_id"])
    return epoch_shuffle(ds, "doc_id", seed=42, epoch=0, keep_key=True).limit(20)


def q_token_diversity(sf_dir: str):
    """Per-doc distinct/total token counts (repetition quality rule)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        analysis.make_token_diversity_batch("text", "doc_id"),
        batch_format="pyarrow",
    )


def q_shingle_decontam(sf_dir: str):
    """Index-based decontamination (the large-benchmark scale path): the
    'benchmark' is every doc with doc_id % 100 == 0; its 3-shingle hash
    index broadcasts once and the corpus streams past it.  The DuckDB
    oracle re-derives contamination by STRING 3-gram membership — an
    independent check of the hash-index semantics (blake2b collisions are
    the only theoretical divergence, ~0 at any feasible scale)."""
    from ..stages.decontam import build_shingle_index, flag_contaminated_by_index

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def every_100th(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        return b.filter(pa.array(ids % 100 == 0))

    bench = ds.map_batches(every_100th, batch_format="pyarrow")
    texts = [r["text"] for r in bench.take_all()]  # tiny side (n/100 rows)
    index = build_shingle_index(texts, k=3)
    return flag_contaminated_by_index(ds, "text", "doc_id", index, k=3)


def q_approx_heavy_hitters(sf_dir: str):
    """Count-Min heavy hitters (mergeable-sketch pattern): per batch one
    constant-size CM table + the batch's candidate token set; a tiny
    driver-side reduce sums tables, unions candidates, and estimates.
    At crawl scale the candidate union is bounded by per-batch top-k
    emission; here the vocabulary is small enough to carry whole."""
    import pandas as pd

    from ..functions.sketches import CountMinSketch
    from ..stages.analysis import make_word_count_partial

    WIDTH, DEPTH = 2048, 4
    ds = _read(sf_dir, "documents", ["text"])
    partial = make_word_count_partial("text")

    def sketch(batch: pa.Table) -> pa.Table:
        counts = partial(batch)
        toks = [t for t in counts["token"].to_pylist()]
        s = CountMinSketch(WIDTH, DEPTH)
        s.add_many(toks, counts["cnt_p"].to_pylist())
        return pa.table({
            "sketch": pa.array([s.to_bytes()], pa.binary()),
            "candidates": pa.array([toks], pa.list_(pa.string())),
        })

    merged = CountMinSketch(WIDTH, DEPTH)
    cand: set = set()
    for b in ds.map_batches(sketch, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for s, c in zip(b["sketch"].to_pylist(), b["candidates"].to_pylist()):
            merged = merged.merge(CountMinSketch.from_bytes(s, WIDTH, DEPTH))
            cand.update(c)
    toks = sorted(cand)
    est = merged.query_many(toks)
    df = pd.DataFrame({"token": toks, "est_n": est.astype("int64")})
    return (
        df.sort_values(["est_n", "token"], ascending=[False, True])
        .head(10)
        .reset_index(drop=True)
    )


def q_approx_char_quantiles(sf_dir: str):
    """p50/p90/p99 of n_chars via the mergeable log-histogram sketch (one
    constant-size count vector per batch, tiny driver reduce — quantiles
    at corpus scale without a distributed sort).  Deterministic pure
    function of the input -> golden-snapshot oracle; the error bound vs
    exact percentiles is asserted in tests/test_sketches.py."""
    import pandas as pd

    from ..functions.sketches import LogHistogram

    ds = _read(sf_dir, "documents", ["n_chars"])

    def sketch(batch: pa.Table) -> pa.Table:
        h = LogHistogram(sub=16)
        h.add_many(batch["n_chars"].to_numpy(zero_copy_only=False))
        return pa.table({"sketch": pa.array([h.to_bytes()], pa.binary())})

    merged = LogHistogram(sub=16)
    for b in ds.map_batches(sketch, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for s in b["sketch"].to_pylist():
            merged = merged.merge(LogHistogram.from_bytes(s, 16))
    return pd.DataFrame({
        "quantile": pd.array(["p50", "p90", "p99"], dtype="object"),
        # pin as float64-buffer hex (float repr would not round-trip
        # bit-identically through parquet + pandas)
        "est_hex": pd.array(
            [
                float(merged.quantile(q)).hex()
                for q in (0.50, 0.90, 0.99)
            ],
            dtype="object",
        ),
    })


# --- line / paragraph granularity ops (stages/lines.py) -------------------


def _lined_documents(sf_dir: str):
    """documents with deterministic synthetic line breaks.

    The corpus text is single-line word salad, so the line/paragraph
    operators would be vacuous on the raw column; both this adapter and
    the oracle SQL turn every ``" sort "`` token into a newline (the same
    left-to-right non-overlapping replace in Arrow and DuckDB), giving
    ~2.6 lines/doc with real cross-document duplicate paragraphs."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def to_lines(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch["doc_id"].cast(pa.int64()),
            "text": pc.replace_substring(batch["text"], " sort ", "\n"),
        })

    return ds.map_batches(to_lines, batch_format="pyarrow")


def q_line_filter(sf_dir: str):
    """C4-style line cleaning (Raffel et al. 2020 §2.2): drop lines with
    <5 words or a badword, re-join survivors, drop emptied docs.  Map-only;
    DuckDB recomputes it with string_split + regexp_extract_all."""
    from ..stages.lines import make_line_filter_batch

    return _lined_documents(sf_dir).map_batches(
        make_line_filter_batch("text", "doc_id", min_words=5, badwords=("slow",)),
        batch_format="pyarrow",
    )


def q_paragraph_dedup(sf_dir: str):
    """Corpus-wide paragraph exact dedup (Lee et al. 2022): first
    (doc_id, idx) occurrence of each paragraph survives, later occurrences
    are cut from their documents.  Thin-row hash shuffle; DuckDB recomputes
    it with row_number() OVER (PARTITION BY para)."""
    from ..stages.lines import paragraph_dedup

    return paragraph_dedup(
        _lined_documents(sf_dir), "text", "doc_id", num_partitions=16
    )


def q_dup_ngram_stats(sf_dir: str):
    """Per-document duplicated-5-gram counts (Lee et al. 2022 token-span
    granularity): a 5-token window is duplicated iff its exact string
    occurs in >= 2 distinct documents corpus-wide.  Thin-row hash
    exchange; DuckDB recomputes it with list slices of string_split."""
    from ..stages.dupspans import dup_ngram_stats

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return dup_ngram_stats(ds, "text", "doc_id", k=5, num_partitions=16)


def q_scrub_dup_ngrams(sf_dir: str):
    """Cut every token covered by a corpus-duplicated 5-gram occurrence
    (the C4/Lee removal form — ALL occurrences scrubbed); survivors
    re-joined with single spaces.  Broadcast dup-key probe."""
    from ..stages.dupspans import scrub_dup_ngrams

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return scrub_dup_ngrams(ds, "text", "doc_id", k=5, num_partitions=16)


def q_host_template_strip(sf_dir: str):
    """Host-consensus boilerplate removal (stages/templates.py): every
    source prepends a 'Site {source} navigation' banner to 3/4 of its
    docs; the modal-first-line consensus (share >= 1/2, exact integer
    test) strips it, leaving the other 1/4 byte-identical.  Thin
    (host, line, n) partials, one host exchange, broadcast winners,
    map-only strip."""
    from ..stages.templates import host_template_strip

    ds = _read(sf_dir, "documents", ["doc_id", "text", "source"])

    def synth(b: pa.Table) -> pa.Table:
        sub = b.filter(b["text"].is_valid())
        ids = sub["doc_id"].to_numpy(zero_copy_only=False)
        t = pc.replace_substring(sub["text"], " sort ", "\n")
        full = pc.binary_join_element_wise(
            "Site ", sub["source"], " navigation\n", t, ""
        )
        return pa.table({
            "doc_id": sub["doc_id"].cast(pa.int64()),
            "source": sub["source"],
            "text": pc.if_else(pa.array(ids % 4 != 0), full, t),
        })

    pages = ds.map_batches(synth, batch_format="pyarrow")
    return host_template_strip(
        pages, "text", "doc_id", "source", min_share=(1, 2), num_partitions=16
    )


# --- URL canonicalization / domain shaping (stages/urls.py) ---------------


def _synth_url_documents(sf_dir: str, path_mod: int | None = None):
    """documents with a deterministic synthetic ``url`` column.

    The documents table has no URLs, so the URL operators synthesize one
    per doc — mixed-case hosts, www. prefixes, two TLD families (one on
    the public-suffix sample), occasional ports and query strings — with
    the SAME expression in the oracle SQL, exercising every normalization
    branch non-vacuously and independently checkably.  With ``path_mod``
    the path repeats mod that value, so canonicalization produces real
    duplicate groups (the url-dedup corpus)."""
    ds = _read(sf_dir, "documents", ["doc_id", "source"])

    def synth(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].cast(pa.int64())
        ids_np = ids.to_numpy(zero_copy_only=False)
        ids_s = ids.cast(pa.string())
        src = batch["source"].cast(pa.string())
        www = pa.array(np.where(ids_np % 3 == 0, "www.", ""), pa.string())
        name = pc.if_else(pa.array(ids_np % 7 == 0), pc.utf8_upper(src), src)
        tld = pa.array(np.where(ids_np % 2 == 0, ".co.uk", ".com"), pa.string())
        port = pa.array(np.where(ids_np % 11 == 0, ":8080", ""), pa.string())
        query = pc.if_else(
            pa.array(ids_np % 5 == 0),
            pc.binary_join_element_wise("?utm_source=", ids_s, ""),
            pa.scalar("", pa.string()),
        )
        path_s = (
            ids_s
            if path_mod is None
            else pa.array(ids_np % path_mod).cast(pa.string())
        )
        url = pc.binary_join_element_wise(
            "https://", www, name, tld, port, "/p/", path_s, query, ""
        )
        return pa.table({"doc_id": ids, "url": url})

    return ds.map_batches(synth, batch_format="pyarrow")


def q_url_parse(sf_dir: str):
    """URL normalization: host casefold + port strip, public-suffix-aware
    registered domain, query/fragment-free canonical form — one Arrow RE2
    pass per component, map-only (DuckDB re-derives each with its own
    regexp functions)."""
    from ..stages.urls import make_url_parse_batch

    return _synth_url_documents(sf_dir).map_batches(
        make_url_parse_batch("url", "doc_id"), batch_format="pyarrow"
    )


def q_domain_quota(sf_dir: str):
    """Per-registered-domain quota (template-farm defense): keep the 3
    lowest-doc_id pages of each domain; one domain-hash exchange, ranks
    computed by per-partition lexsort (DuckDB: QUALIFY row_number())."""
    from ..stages.urls import domain_quota, make_url_parse_batch

    parsed = _synth_url_documents(sf_dir).map_batches(
        make_url_parse_batch("url", "doc_id"), batch_format="pyarrow"
    )
    return domain_quota(parsed, "registered_domain", "doc_id", k=3, num_partitions=16)


def q_fuzzy_dedup_keepers(sf_dir: str):
    """End-to-end fuzzy dedup: corpus minus MinHash-LSH cluster losers
    (winner = cluster-minimum id).  The oracle re-derives the winner /
    loser / filter composition in SQL from the pinned minhash_clusters
    snapshot, so this checks the composition independently given the
    clustering."""
    from ..stages.dedup import fuzzy_dedup_keepers

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    kept = fuzzy_dedup_keepers(ds, "text", "doc_id", threshold=0.8)
    return kept.select_columns(["doc_id"])


def q_repetition_stats(sf_dir: str):
    """Gopher-style repetition signals per doc: word/bigram/distinct-bigram
    counts and top-word dominance, one vectorized map pass (DuckDB
    re-derives them with window lead() + GROUP BY)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        analysis.make_repetition_stats_batch("text", "doc_id"),
        batch_format="pyarrow",
    )


def q_url_dedup(sf_dir: str):
    """URL-canonical dedup: normalize urls (case/port/www/query stripped),
    keep the min-doc_id page per canonical form.  The synthesized paths
    repeat mod 50 so canonicalization creates REAL duplicate groups that
    the raw urls don't have."""
    from ..stages.dedup import exact_dedup_shuffle
    from ..stages.urls import make_url_parse_batch

    parsed = _synth_url_documents(sf_dir, path_mod=50).map_batches(
        make_url_parse_batch("url", "doc_id"), batch_format="pyarrow"
    )
    kept = exact_dedup_shuffle(parsed, "canonical_url", "doc_id", num_partitions=16)
    return kept.select_columns(["doc_id", "canonical_url"])


def q_clean_corpus(sf_dir: str):
    """Flagship corpus-cleaning composition: C4 line filter -> Gopher
    repetition gate -> exact dedup, all streaming map/shuffle stages.

    The repetition gate uses integer cross-multiplication
    ((nb-nd)*10 <= nb, top*10 <= n_words*2) so the thresholds are exact
    in both engines; the dedup stage is made non-vacuous by unioning a
    deterministically re-labeled clone of every 7th doc (same trick on
    the SQL side), which dedup must then remove."""
    from ..stages.analysis import make_repetition_stats_batch
    from ..stages.dedup import exact_dedup_shuffle
    from ..stages.lines import make_line_filter_batch

    filtered = _lined_documents(sf_dir).map_batches(
        make_line_filter_batch("text", "doc_id", min_words=5, badwords=("slow",)),
        batch_format="pyarrow",
    )
    stats_fn = make_repetition_stats_batch("text", "doc_id")

    def rep_gate(batch: pa.Table) -> pa.Table:
        stats = stats_fn(batch)
        nb = stats["n_bigrams"].to_numpy(zero_copy_only=False)
        nd = stats["n_distinct_bigrams"].to_numpy(zero_copy_only=False)
        nw = stats["n_words"].to_numpy(zero_copy_only=False)
        top = stats["top_word_n"].to_numpy(zero_copy_only=False)
        ok = ((nb - nd) * 10 <= nb) & (top * 10 <= nw * 2)
        ok_ids = stats["doc_id"].filter(pa.array(ok))
        mask = pc.is_in(batch["doc_id"], value_set=ok_ids)
        out = batch.filter(mask)
        return pa.table({"doc_id": out["doc_id"], "text": out["text"]})

    gated = filtered.map_batches(rep_gate, batch_format="pyarrow")

    def clone(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        pick = ids % 7 == 0
        return pa.table({
            "doc_id": pa.array(ids[pick] + 10_000, pa.int64()),
            "text": batch["text"].filter(pa.array(pick)),
        })

    with_clones = gated.union(gated.map_batches(clone, batch_format="pyarrow"))
    kept = exact_dedup_shuffle(with_clones, "text", "doc_id", num_partitions=16)
    return kept.select_columns(["doc_id", "text"])


def q_snapshot_dedup(sf_dir: str):
    """Cross-snapshot incremental dedup (CCNet / FineWeb pattern): a new
    crawl dump is filtered against the PRIOR snapshot's sorted
    content-digest index — index broadcast once via the object store,
    probe is map-only (the new crawl never shuffles).  Prior snapshot =
    docs with doc_id % 3 == 0, so the new crawl "re-crawled" a third of
    its pages byte-identically; those must drop.  The DuckDB oracle
    anti-joins on the text itself — an independent check of the
    digest-membership semantics (64-bit blake2b collisions are the only
    theoretical divergence, ~0 at any feasible scale)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text", "n_chars"])

    def every_3rd(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        return b.filter(pa.array(ids % 3 == 0))

    prior = ds.map_batches(every_3rd, batch_format="pyarrow")
    index = dedup.build_text_digest_index(prior, "text")
    kept = dedup.dedup_against_index(ds, "text", index)
    return kept.select_columns(["doc_id", "n_chars"])


def q_crawl_delta(sf_dir: str):
    """Crawl-delta classification (new/changed/unchanged/gone per url)
    between a synthesized prior snapshot and the current one — the full
    outer join shape, resolved with thin digest rows and ONE id-hash
    exchange (stages/crawldiff.py).  Prior snapshot: every doc except
    doc_id % 3 == 2 (those are 'new'), even doc_ids carried a ' v1' text
    suffix (now 'changed'), and doc_id % 7 == 0 contributes a retired
    url doc_id + 10^7 (now 'gone').  The DuckDB oracle re-derives both
    sides and FULL OUTER JOINs on the text itself."""
    from ..stages.crawldiff import snapshot_delta

    new_ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def make_old(b: pa.Table) -> pa.Table:
        import numpy as np
        import pyarrow.compute as pc

        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        txt = pc.fill_null(b["text"], "")
        keep = ids % 3 != 2
        sub_ids = ids[keep]
        sub_txt = txt.filter(pa.array(keep))
        changed = sub_ids % 2 == 0
        old_txt = pc.if_else(
            pa.array(changed),
            pc.binary_join_element_wise(sub_txt, " v1", ""),
            sub_txt,
        )
        retired = ids % 7 == 0
        rid = ids[retired] + 10_000_000
        rtxt = pa.array([f"retired {i}" for i in ids[retired]], pa.string())
        return pa.table({
            "doc_id": pa.array(
                np.concatenate([sub_ids, rid]), pa.int64()
            ),
            "text": pa.concat_arrays([old_txt.combine_chunks(), rtxt])
            if isinstance(old_txt, pa.ChunkedArray)
            else pa.concat_arrays([old_txt, rtxt]),
        })

    old_ds = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        make_old, batch_format="pyarrow"
    )
    return snapshot_delta(new_ds, old_ds, "doc_id", "text", num_partitions=16)


def q_snapshot_near_dedup(sf_dir: str):
    """Cross-snapshot NEAR-dup dedup (fuzzy sibling of snapshot_dedup):
    the prior dump holds slightly-updated versions of every 3rd page (two
    trailing words differ — the page changed between crawls), so exact
    digests would miss them; the broadcast MinHash band-key index still
    drops the re-crawls.  Map-only probe; deterministic per row, so the
    golden snapshot is parallelism-invariant."""
    ds = _read(sf_dir, "documents", ["doc_id", "text", "n_chars"])

    def prior_versions(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        pick = ids % 3 == 0
        texts = [
            (t or "") + " prior version" for t in b["text"].filter(pa.array(pick)).to_pylist()
        ]
        return pa.table({"text": pa.array(texts, pa.string())})

    prior = ds.map_batches(prior_versions, batch_format="pyarrow")
    index = dedup.build_minhash_band_index(
        prior, "text", num_perm=128, n_bands=16, shingle_k=3
    )
    kept = dedup.dedup_against_minhash_index(
        ds, "text", index, num_perm=128, n_bands=16, shingle_k=3
    )
    return kept.select_columns(["doc_id", "n_chars"])


def q_snapshot_dedup_bloom(sf_dir: str):
    """snapshot_dedup through the memory-BOUNDED Bloom index (the
    >8 B/doc-broadcast-budget swap).  Same independent DuckDB text
    anti-join oracle as the exact path: at this corpus size the
    deterministic false-positive probability is ~(k*n/n_bits)^k ~ 1e-13
    per doc, so the Bloom result must equal the exact result; the
    one-sided-error BOUND on adversarial sizes is asserted in
    tests/test_sketches.py and tests/test_dedup.py."""
    ds = _read(sf_dir, "documents", ["doc_id", "text", "n_chars"])

    def every_3rd(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        return b.filter(pa.array(ids % 3 == 0))

    prior = ds.map_batches(every_3rd, batch_format="pyarrow")
    index = dedup.build_text_bloom_index(prior, "text", n_bits=1 << 20, k=5)
    kept = dedup.dedup_against_bloom_index(ds, "text", index)
    return kept.select_columns(["doc_id", "n_chars"])


def q_normalize_text(sf_dir: str):
    """Unicode normalization pass (NFC + control strip + whitespace
    collapse).  The corpus is pure ASCII — vacuous under normalization —
    so BOTH sides append the same messy suffix (decomposed accent, double
    space, BEL control char, trailing blanks) to every doc; the engine
    must then compose/strip/collapse it byte-identically to DuckDB's
    nfc_normalize + RE2 chain."""
    from ..stages.normalize import normalize_texts

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    suffix = " Cafe\u0301  B\x07 end  "  # decomposed e-acute on purpose

    def aug(b: pa.Table) -> pa.Table:
        t = pc.binary_join_element_wise(
            b["text"], pa.scalar(suffix, pa.string()), pa.scalar("", pa.string())
        )
        return pa.table({"doc_id": b["doc_id"], "norm_text": normalize_texts(t)})

    return ds.map_batches(aug, batch_format="pyarrow")


def q_chunk_documents(sf_dir: str):
    """Context-window chunking: 32-token windows, 8-token overlap, over
    the whitespace tokenizer shared with token_counts.  Map-only and
    parallelism-invariant; DuckDB re-derives every window by list
    slicing."""
    from ..stages.chunking import chunk_documents

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return chunk_documents(ds, "text", "doc_id", chunk_tokens=32, overlap=8)


def q_doc_top_terms(sf_dir: str):
    """Top-5 distinctive terms per doc by tf/df (rational-score tf-idf;
    see stages.analysis.doc_top_terms).  DuckDB independently re-derives
    tf, df, the double-division ordering and the row_number rank."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return analysis.doc_top_terms(ds, "text", "doc_id", k=5)


def q_events_rolling(sf_dir: str):
    """Sliding-window aggregate: 3-hour trailing sums per (event_type,
    hour) over the tumbling hourly aggregate (RANGE semantics — absent
    hours contribute nothing).  One crc32 key exchange; each partition
    resolves all its keys in a single lexsort + cumsum + searchsorted
    sweep (see stages.windows)."""
    from ray.data.aggregate import Count, Sum

    from ..stages.windows import rolling_time_agg

    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(batch["ts"], unit="hour")
        cents = pc.cast(pc.floor(pc.multiply(batch["value"], 100.0)), pa.int64())
        return pa.table({
            "event_type": batch["event_type"],
            "hour": hour,
            "value_cents": cents,
        })

    hourly = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["event_type", "hour"])
        .aggregate(
            Count(alias_name="n_events"),
            Sum("value_cents", alias_name="sum_value_cents"),
        )
    )
    return rolling_time_agg(
        hourly, "event_type", "hour", ["n_events", "sum_value_cents"], window=3
    )


def q_inverted_index(sf_dir: str):
    """Full-corpus inverted index (token -> df + sorted posting list as a
    comma string; see stages.invindex).  Thin distinct-pair partials, one
    token-hash exchange, vectorized per-partition list build."""
    from ..stages.invindex import inverted_index

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return inverted_index(ds, "text", "doc_id")


def q_group_sample(sf_dir: str):
    """Deterministic 5-per-source sample (hash reservoir; DuckDB
    recomputes the identical md5 ranks and row_number cutoff)."""
    from ..stages.sampling import group_hash_sample

    ds = _read(sf_dir, "documents", ["doc_id", "source", "n_chars"])
    return group_hash_sample(ds, "source", "doc_id", k=5, seed=42)


def q_quality_model_score(sf_dir: str):
    """Model-based quality scoring through the actor-pool inference
    pattern (weights load once per actor; see stages.scoring).  The toy
    model's integer logit keeps the contract exact; threshold 117 is the
    corpus median, so the accept decision genuinely splits the corpus."""
    from ..stages.scoring import score_quality

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return score_quality(ds, "text", "doc_id", threshold=117, concurrency=2)


def q_rebalance_sources(sf_dir: str):
    """Data-mixture rebalancing: every source downsampled to the smallest
    source's character mass (rates 0.73-1.0 on this corpus, so the filter
    genuinely differentiates).  DuckDB re-derives the totals, the IEEE
    rates and the floor(rate*16^8) thresholds end to end."""
    from ..stages.sampling import rebalance_groups

    ds = _read(sf_dir, "documents", ["doc_id", "source", "n_chars"])
    return rebalance_groups(ds, "source", "doc_id", "n_chars", seed=42)


def _fit_corpus_centroids(sf_dir: str, n_clusters: int = 8, iters: int = 4):
    from ..stages.clustering import kmeans_fit

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return ds, kmeans_fit(ds, "embedding", "vec_id", n_clusters, iters=iters, seed=7)


def q_kmeans_clusters(sf_dir: str):
    """Full-corpus distributed spherical k-means labels.  Fixed-point
    (int64) centroid accumulation makes every Lloyd step exactly
    associative, so the labels are parallelism-invariant and
    golden-snapshot-pinnable despite the iterative float algorithm."""
    from ..stages.clustering import kmeans_assign

    ds, cents = _fit_corpus_centroids(sf_dir)
    return kmeans_assign(ds, cents, "embedding", "vec_id")


def q_semantic_dedup(sf_dir: str):
    """SemDeDup over the k-means clusters: id-ordered greedy keep within
    each cluster at cosine > 0.3 (corpus max pairwise cosine ~0.51, so the
    production 0.95 default would be vacuous here — same corpus-matching
    as ``embedding_near_dups``)."""
    from ..stages.clustering import semantic_dedup

    ds, cents = _fit_corpus_centroids(sf_dir)
    return semantic_dedup(ds, "embedding", "vec_id", cents, threshold=0.3)


# --- link graph -------------------------------------------------------------


def _synth_linked_pages(sf_dir: str):
    """documents rows -> pages rows whose HTML carries a deterministic link
    structure (pure function of doc_id): three nav links, one absolute
    body link (nofollow on every third doc), one footer link, plus a
    ``mailto:`` link that must be dropped.  The SQL oracle re-derives the
    exact link list from doc_id — independent of the extractor."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def synth(batch: pa.Table) -> pa.Table:
        urls: list = []
        payloads: list = []
        for i, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            rel = ' rel="nofollow"' if i % 3 == 0 else ""
            html = (
                "<html><head><title>doc</title></head><body>"
                '<nav><a href="/">Home</a> <a href="/a">Archive</a> '
                '<a href="/b">About</a></nav>'
                f'<div id="main-content"><p>{_html.escape(t or "")}</p>'
                f'<p><a href="https://site{i % 7}.example/p/{i * 2}"{rel}>'
                f"read doc {i}</a></p></div>"
                '<footer>Copyright 2026. <a href="/tos">Terms</a> '
                '<a href="mailto:x@example.com">mail</a></footer>'
                "</body></html>"
            )
            urls.append(f"https://h{i % 5}.example/d/{i}")
            payloads.append(html.encode("utf-8"))
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "html": pa.array(payloads, pa.binary()),
        })

    return ds.map_batches(synth, batch_format="pyarrow")


def q_page_links(sf_dir: str):
    """Per-page out-link extraction: flat one-pass anchor collection (the
    DOM scorer kills nav/footer, so links get their own parser), stdlib
    RFC-3986 href resolution, non-http(s) targets dropped — map-only, the
    html column never shuffles."""
    from ..stages.links import page_out_links

    return page_out_links(_synth_linked_pages(sf_dir))


def q_host_link_summary(sf_dir: str):
    """Host-level in-link rollup: per-batch (src_host, dst_host) partials
    -> ONE groupby-sum edge exchange bounded by distinct host pairs ->
    per-dst-host summary (edge rows are unique per pair, so the distinct
    source-host count is a plain row count)."""
    from ..stages.links import host_edges, host_in_links, page_out_links

    return host_in_links(host_edges(page_out_links(_synth_linked_pages(sf_dir))))


def q_layout_pdf(sf_dir: str):
    """K6 layout-PDF composition: every doc becomes a one-page synthetic
    pdf whose emission carries one deterministic figure box, the extract
    pipeline crops the figure (K4 ``figures`` column), and the layout
    writer recomposes each doc's crops into a ``layout_pdf`` binary
    artifact (app/utils/utils.py:104-126 analog — artifact-as-data, no
    side files).  Returns per-url figure count + PDF sha/size; snapshot
    oracle (the PDF bytes are a pure function of the input)."""
    import hashlib

    from ..functions.layoutpdf import make_layout_pdf_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])

    def with_figure(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        tagged = []
        for d, t in zip(ids, texts):
            x1 = 50 + (int(d) * 37) % 400
            y1 = 80 + (int(d) * 59) % 300
            tag = (
                f"<|ref|>image<|/ref|><|det|>"
                f"[[{x1},{y1},{x1 + 300},{y1 + 200}]]<|/det|>"
            )
            tagged.append((t or "") + "\n" + tag)
        return batch.set_column(
            batch.schema.get_field_index("text"), "text",
            pa.array(tagged, pa.string()),
        )

    pages = ds.map_batches(with_figure, batch_format="pyarrow").map_batches(
        docs_as_pdf_pages, batch_format="pyarrow"
    )
    cfg = ExtractConfig(
        ngram_suppress=False, page_dedup_strategy="shuffle"
    )
    out = build_extract_pipeline(pages, cfg).map_batches(
        make_layout_pdf_batch(), batch_format="pyarrow"
    )

    def summarize(batch: pa.Table) -> pa.Table:
        pdfs = batch["layout_pdf"].to_pylist()
        return pa.table({
            "url": batch["url"],
            "n_figures": pc.list_value_length(batch["figures"]).cast(pa.int64()),
            "pdf_sha1": pa.array(
                [hashlib.sha1(p or b"").hexdigest() for p in pdfs], pa.string()
            ),
            "pdf_bytes": pa.array([len(p or b"") for p in pdfs], pa.int64()),
        })

    return out.map_batches(summarize, batch_format="pyarrow")


def q_augment_fingerprints(sf_dir: str):
    """M20 pixel-augmentation family over deterministic per-doc page
    arrays: every (family, severity) from the reference's eval corpus
    (skew +-2/-3.5 deg, perspective 0.05/0.08, blur k=13/21, shadow
    0.30/0.45) applied to a blake2b-seeded synthetic page, output pinned
    by sha1 — the robustness-corpus generator as a gate query (map-only,
    pure function of doc_id)."""
    import hashlib

    from ..functions.augment import AUGMENT_FAMILIES, augment_page_array

    ds = _read(sf_dir, "documents", ["doc_id"])

    def fn(batch: pa.Table) -> pa.Table:
        rows = {"doc_id": [], "family": [], "severity": [], "sha1": []}
        for d in batch["doc_id"].to_pylist():
            seed_bytes = hashlib.blake2b(
                str(d).encode("utf-8"), digest_size=16
            ).digest()
            rng = np.random.default_rng(int.from_bytes(seed_bytes[:8], "little"))
            arr = rng.integers(0, 256, size=(24, 32, 3)).astype(np.uint8)
            for fam in sorted(AUGMENT_FAMILIES):
                for sev in range(len(AUGMENT_FAMILIES[fam])):
                    out = augment_page_array(arr, fam, severity=sev, seed=int(d) % 1000)
                    rows["doc_id"].append(int(d))
                    rows["family"].append(fam)
                    rows["severity"].append(sev)
                    rows["sha1"].append(hashlib.sha1(out.tobytes()).hexdigest())
        return pa.table({
            "doc_id": pa.array(rows["doc_id"], pa.int64()),
            "family": pa.array(rows["family"], pa.string()),
            "severity": pa.array(rows["severity"], pa.int64()),
            "sha1": pa.array(rows["sha1"], pa.string()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def q_dsir_select(sf_dir: str):
    """DSIR importance resampling (Xie et al. 2023): select the 50 corpus
    docs whose hashed unigram+bigram distribution best matches the French
    subcorpus (target = lang='fr' rows), by weight + seeded Gumbel.
    Map-only feature passes, bucket-bounded distribution groupbys, one
    broadcast log-ratio vector, distributed top-k; pure function of
    (corpus, seed) — snapshot oracle."""
    from ..stages.dsir import dsir_select

    raw = _read(sf_dir, "documents", ["doc_id", "text"])

    def fr_only(batch: pa.Table) -> pa.Table:
        keep = pc.fill_null(pc.equal(batch["lang"], "fr"), False)
        return batch.filter(keep).select(["doc_id", "text"])

    target = _read(sf_dir, "documents", ["doc_id", "text", "lang"]).map_batches(
        fr_only, batch_format="pyarrow"
    )
    return dsir_select(raw, target, "text", "doc_id", k=50, seed=0)


def q_split_assign(sf_dir: str):
    """Deterministic train/val/test assignment (90/5/5): the id digest's
    position among cumulative weight boundaries — stable across runs,
    cluster shapes, and corpus growth (an id keeps its split forever).
    Map-only; DuckDB re-derives the identical md5 boundaries."""
    from ..stages import sampling

    ds = _read(sf_dir, "documents", ["doc_id", "lang"])
    return sampling.split_assign(
        ds, "doc_id", {"train": 0.9, "val": 0.05, "test": 0.05}
    )


def q_corpus_report(sf_dir: str):
    """One-row corpus summary (the dataset-card numbers): doc/char/token
    totals, max doc length, distinct sources/langs.  Per-batch partials
    (one row + two small distinct-value lists per batch) fold on the
    driver — nothing corpus-sized moves."""
    import pandas as pd

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang", "source", "n_chars"])

    def partial(batch: pa.Table) -> pa.Table:
        toks = analysis.whitespace_token_counts(batch["text"])
        return pa.table({
            "n_docs_p": pa.array([batch.num_rows], pa.int64()),
            "chars_p": pa.array([pc.sum(batch["n_chars"]).as_py() or 0], pa.int64()),
            "tokens_p": pa.array([pc.sum(toks).as_py() or 0], pa.int64()),
            "max_chars_p": pa.array([pc.max(batch["n_chars"]).as_py() or 0], pa.int64()),
            # drop nulls BEFORE sorting (None < str raises) — and SQL
            # COUNT(DISTINCT x) excludes NULLs, so the fold must too
            "sources_p": pa.array(
                [sorted({v for v in batch["source"].to_pylist() if v is not None})],
                pa.list_(pa.string()),
            ),
            "langs_p": pa.array(
                [sorted({v for v in batch["lang"].to_pylist() if v is not None})],
                pa.list_(pa.string()),
            ),
        })

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    sources: set = set()
    langs: set = set()
    for r in rows:
        sources.update(r["sources_p"])
        langs.update(r["langs_p"])
    return pd.DataFrame({
        "n_docs": pd.array([sum(r["n_docs_p"] for r in rows)], dtype="int64"),
        "total_chars": pd.array([sum(r["chars_p"] for r in rows)], dtype="int64"),
        "total_tokens": pd.array([sum(r["tokens_p"] for r in rows)], dtype="int64"),
        "max_chars": pd.array([max(r["max_chars_p"] for r in rows)], dtype="int64"),
        "n_sources": pd.array([len(sources)], dtype="int64"),
        "n_langs": pd.array([len(langs)], dtype="int64"),
    })


def q_embedding_decontam(sf_dir: str):
    """Semantic decontamination: corpus vectors flagged when cosine-close
    (>= 0.35) to any of the 32 lowest-id "benchmark" vectors — the
    paraphrase-robust sibling of phrase/shingle decontamination.  One
    broadcast benchmark matrix, one unit-vector matmul per batch,
    map-only."""
    import pyarrow.dataset as pads

    from ..stages.decontam import embedding_decontam

    bench = pads.dataset(
        os.path.join(sf_dir, "embeddings.parquet"), format="parquet"
    ).to_table(columns=["vec_id", "embedding"], filter=pads.field("vec_id") < 32)
    order = np.argsort(bench["vec_id"].to_numpy())
    bench_vecs = np.stack(
        [np.asarray(v, dtype=np.float64) for v in bench["embedding"].to_pylist()]
    )[order]

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return embedding_decontam(ds, bench_vecs, "embedding", "vec_id")


def q_anchor_texts(sf_dir: str):
    """Per-target-URL anchor-text aggregate (what other pages call this
    one — the anchor-text pretraining / target-quality signal): per-batch
    triple-dedup partials, one crc32(dst_url) exchange bounded by distinct
    (dst, anchor, src_host) triples, per-partition lexsort sweep."""
    from ..stages.links import anchor_text_agg, page_out_links

    return anchor_text_agg(page_out_links(_synth_linked_pages(sf_dir)))


def q_host_pagerank(sf_dir: str):
    """Host-graph PageRank over the synthesized link structure: the
    endorsement-weighted quality signal (distributed edge rollup, then
    dense power iteration on the host-bounded table)."""
    from ..stages.links import host_edges, host_pagerank, page_out_links

    return host_pagerank(
        host_edges(page_out_links(_synth_linked_pages(sf_dir)))
    )


def q_events_asof(sf_dir: str):
    """As-of (backward temporal) join: every ``click`` event stamped with
    the most recent prior-or-equal ``purchase`` by the same user — the
    last-state lookup (last purchase before an interaction, last deploy
    before an error) that neither Ray Data nor a plain equi-join
    expresses.  One crc32(user) exchange co-locates both sides; each
    partition resolves ALL its keys in a single composite-int64
    ``searchsorted`` sweep (stages/asof.py).  DuckDB independently
    re-derives it with ``ASOF LEFT JOIN`` (ties collapsed to max
    event_id on both sides so the match is deterministic)."""
    from ..stages.asof import asof_join

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type", "value"])

    def split(kind: str, rename: dict):
        def fn(batch: pa.Table) -> pa.Table:
            t = batch.filter(pc.equal(batch["event_type"], kind))
            t = t.select(list(rename))
            return t.rename_columns([rename[c] for c in rename])

        return fn

    left = ev.map_batches(
        split("click", {"event_id": "event_id", "user_id": "user_id", "ts": "ts"}),
        batch_format="pyarrow",
    )
    right = ev.map_batches(
        split(
            "purchase",
            {
                "event_id": "purchase_event_id",
                "value": "purchase_value",
                "user_id": "user_id",
                "ts": "ts",
            },
        ),
        batch_format="pyarrow",
    )
    return asof_join(left, right, on="ts", by="user_id", tiebreak="purchase_event_id")


def q_length_quantiles(sf_dir: str):
    """Exact global quantiles of document length WITHOUT a distributed
    sort: iterative histogram-refinement selection (stages/quantiles.py)
    — 2+R map-only passes over the single projected column with KB-scale
    partials, vs a full all-to-all for ``ds.sort``.  percentile_disc
    (ceil-rank) semantics; DuckDB re-derives with quantile_disc."""
    from ..stages.quantiles import exact_quantiles

    ds = _read(sf_dir, "documents", ["n_chars"])
    return exact_quantiles(ds, "n_chars", [0.25, 0.5, 0.75, 0.9, 0.99])


def q_winsorize_lengths(sf_dir: str):
    """Composition: exact p01/p99 via histogram refinement, then a
    map-only clip — outlier winsorization without a sort.  The quantile
    values are driver-side scalars (2 rows), so the clip broadcasts them
    in the task closure."""
    from ..stages.quantiles import exact_quantiles

    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])
    q_t = exact_quantiles(ds, "n_chars", [0.01, 0.99])
    lo, hi = (int(v) for v in q_t["value"].to_pylist())

    def clip(b: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        clipped = _pc.min_element_wise(
            _pc.max_element_wise(b["n_chars"], lo), hi
        )
        return pa.table({
            "doc_id": b["doc_id"].cast(pa.int64()),
            "n_chars_winsorized": clipped.cast(pa.int64()),
        })

    return ds.map_batches(clip, batch_format="pyarrow")


def q_lang_length_quartiles(sf_dir: str):
    """Per-language exact length quartiles (grouped histogram-refinement
    k-selection — no sort, no per-group shuffle; one (group, p) target
    per combination, KB-scale partials)."""
    from ..stages.quantiles import grouped_exact_quantiles

    ds = _read(sf_dir, "documents", ["lang", "n_chars"])
    return grouped_exact_quantiles(ds, "n_chars", "lang", [0.25, 0.5, 0.75])


def q_events_value_ranks(sf_dir: str):
    """Per-user RANK / DENSE_RANK over spend (desc) + NTILE(4) spend
    quartile — the three remaining SQL ranking window functions in one
    single-exchange lexsort sweep (stages.windows.key_rank).  Rank ties
    share a rank (value-only ordering, engine-independent); NTILE orders
    by (value desc, event_id) so bucket assignment is deterministic."""
    from ..stages.windows import key_rank

    ds = _read(sf_dir, "events", ["event_id", "user_id", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        cents = pc.cast(pc.floor(pc.multiply(batch["value"], 100.0)), pa.int64())
        return pa.table({
            "event_id": batch["event_id"],
            "user_id": batch["user_id"],
            "value_cents": cents,
        })

    prepped = ds.map_batches(prep, batch_format="pyarrow")
    return key_rank(
        prepped, "user_id", "value_cents", "event_id", ntile=4,
        num_partitions=16,
    )


def q_top_event_type_per_user(sf_dir: str):
    """Per-user modal event type (the "dominant language per host"
    pattern): two-level count aggregation so only the thin (user, type)
    support crosses the exchange, then a per-partition lexsort argmax —
    ties to the lexicographically smallest type."""
    from ..stages.windows import key_mode

    ds = _read(sf_dir, "events", ["user_id", "event_type"])
    return key_mode(ds, "user_id", "event_type", num_partitions=16)


def q_lang_source_rollup(sf_dir: str):
    """OLAP ROLLUP(lang, source): leaf aggregate + lang subtotals + grand
    total.  One per-batch partial-count pass (Arrow ``group_by`` — a NULL
    lang/source is a real SQL group and survives as its own key) shrinks
    the corpus to <= |langs| x |sources| rows per batch; the fold and
    both upper rollup levels resolve driver-side on that KB-scale partial
    table (``dropna=False`` — Ray's sort-based groupby cannot exchange
    null string keys, and SQL keeps them), never re-reading the corpus."""
    ds = _read(sf_dir, "documents", ["lang", "source", "n_chars"])

    def partial(batch: pa.Table) -> pa.Table:
        out_schema = pa.schema([
            ("lang", pa.string()),
            ("source", pa.string()),
            ("n_docs_p", pa.int64()),
            ("total_chars_p", pa.int64()),
        ])
        if not batch.num_rows:
            return out_schema.empty_table()
        return (
            batch.group_by(["lang", "source"])
            .aggregate([([], "count_all"), ("n_chars", "sum")])
            .rename_columns(["lang", "source", "n_docs_p", "total_chars_p"])
            .cast(out_schema)
        )

    import pandas as pd

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()

    def _none_keys(df, cols):
        # object-dtype None (not float NaN): the hash contract stringifies
        # cells, and DuckDB NULL surfaces as None
        for c in cols:
            df[c] = df[c].astype(object).where(pd.notna(df[c]), None)
        return df

    leaf = _none_keys(
        parts.groupby(["lang", "source"], dropna=False, as_index=False)[
            ["n_docs_p", "total_chars_p"]
        ].sum(),
        ["lang", "source"],
    ).rename(columns={"n_docs_p": "n_docs", "total_chars_p": "total_chars"})
    by_lang = _none_keys(
        leaf.groupby("lang", dropna=False, as_index=False)[
            ["n_docs", "total_chars"]
        ].sum(),
        ["lang"],
    ).assign(source=None)
    grand = pd.DataFrame({
        "lang": [None],
        "source": [None],
        "n_docs": [leaf["n_docs"].sum()],
        "total_chars": [leaf["total_chars"].sum()],
    })
    out = pd.concat([leaf, by_lang, grand], ignore_index=True)
    return out[["lang", "source", "n_docs", "total_chars"]].astype(
        {"n_docs": "int64", "total_chars": "int64"}
    )


def q_source_lang_pivot(sf_dir: str):
    """Pivot: one row per source with per-language doc counts as columns
    (the corpus-composition dashboard shape).  The lang domain is the
    corpus's fixed 5-language set; counts are one-hot int columns summed
    by a per-batch Arrow group_by partial (NULL source stays a real group,
    NULL lang counts toward n_docs only — count(*) FILTER semantics), then
    a driver-side fold of the <= |sources| x batches partial rows
    (``dropna=False``; Ray's sort-based groupby cannot exchange null
    string keys, and SQL keeps them)."""
    langs = ["de", "en", "es", "fr", "zh"]
    ds = _read(sf_dir, "documents", ["lang", "source"])

    def partial(batch: pa.Table) -> pa.Table:
        cols = {"source": batch["source"]}
        lang = batch["lang"]
        for lg in langs:
            # fill_null: a NULL lang is FILTER-false, not sum-poisoning
            cols["n_" + lg] = pc.fill_null(
                pc.cast(pc.equal(lang, pa.scalar(lg)), pa.int64()), 0
            )
        cols["n_docs"] = pa.array(
            np.ones(batch.num_rows, dtype=np.int64), pa.int64()
        )
        t = pa.table(cols)
        return (
            t.group_by(["source"])
            .aggregate([("n_" + lg, "sum") for lg in langs] + [("n_docs", "sum")])
            .rename_columns(
                ["source"] + ["n_" + lg for lg in langs] + ["n_docs"]
            )
        )

    import pandas as pd

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = parts.groupby("source", dropna=False, as_index=False)[
        ["n_" + lg for lg in langs] + ["n_docs"]
    ].sum()
    out["source"] = out["source"].astype(object).where(
        pd.notna(out["source"]), None
    )
    return out.astype({c: "int64" for c in out.columns if c != "source"})


def q_length_mad_outliers(sf_dir: str):
    """Robust per-language outlier flag: is the doc's length more than 2x
    the median absolute deviation (MAD) from the language median?  Both
    statistics come from the exact grouped-quantile kernel (map-only, KB
    partials): pass 1 = per-lang median, pass 2 = per-lang median of
    |2*x - 2*med| (doubled to stay integer-exact; SQL medians of int64
    interpolate in halves, exact in float64).  The tiny (lang -> med, mad)
    table then broadcasts into one vectorized flag pass — the corpus is
    read twice and never shuffled.  Every row carries the flag (not a
    filter) so the cross-engine float contract is exercised corpus-wide."""
    from ..stages.quantiles import grouped_exact_quantiles

    ds = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])

    def _sql_median(tbl_ds, col, group):
        t = grouped_exact_quantiles(
            tbl_ds, col, group,
            ps=[0.5, 1.0],
            ranks=[lambda n: (n + 1) // 2, lambda n: n // 2 + 1],
        ).to_pandas()
        lo = t[t["p"] == 0.5].set_index(group)["value"].astype(float)
        hi = t[t["p"] == 1.0].set_index(group)["value"].astype(float)
        return ((lo + hi) / 2.0).to_dict()

    med = _sql_median(ds, "n_chars", "lang")

    def _lookup(table: dict, lang_arr: np.ndarray) -> np.ndarray:
        # dict probes once per DISTINCT lang, then a vectorized gather —
        # no per-row Python; a lang with no finite values maps to NaN
        # (SQL: its median is NULL, so every comparison is NULL)
        uniq, inv = np.unique(lang_arr, return_inverse=True)
        vals = np.array(
            [table.get(u, np.nan) for u in uniq], dtype=np.float64
        )
        return vals[inv]

    def dev_batch(batch: pa.Table) -> pa.Table:
        # SQL shape: JOIN m USING (lang) drops NULL-lang rows, and a NULL
        # dev (NULL n_chars) is skipped by median() — filter both here
        keep = pc.and_(
            pc.is_valid(batch["lang"]), pc.is_valid(batch["n_chars"])
        )
        batch = batch.filter(keep)
        if not batch.num_rows:
            return pa.table({
                "lang": pa.array([], pa.string()),
                "dev2": pa.array([], pa.int64()),
            })
        lang = batch["lang"].to_numpy(zero_copy_only=False)
        x = batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = _lookup(med, lang)
        # |2x - 2m| is integer-valued (2m = sum of the two middle ints)
        dev2 = np.abs(2 * x - (2.0 * m)).astype(np.int64)
        return pa.table({"lang": batch["lang"], "dev2": pa.array(dev2)})

    devs = ds.map_batches(dev_batch, batch_format="pyarrow")
    mad2 = _sql_median(devs, "dev2", "lang")  # = 2 * MAD, exact

    def flag(batch: pa.Table) -> pa.Table:
        # NULL-lang rows drop (JOIN USING); NULL n_chars rows stay with a
        # NULL flag (their dev is NULL in SQL)
        batch = batch.filter(pc.is_valid(batch["lang"]))
        if not batch.num_rows:
            return batch.append_column(
                "is_outlier", pa.array([], pa.bool_())
            )
        lang = batch["lang"].to_numpy(zero_copy_only=False)
        x = pc.cast(batch["n_chars"], pa.float64()).to_numpy(
            zero_copy_only=False
        )
        m = _lookup(med, lang)
        md = _lookup(mad2, lang)
        # |x - med| > 2*MAD  <=>  |2x - 2med| > 2 * (2*MAD); all terms are
        # exactly representable doubles, so the comparison is bit-portable
        out = np.abs(2 * x - 2.0 * m) > 2.0 * md
        null = np.isnan(x) | np.isnan(m) | np.isnan(md)
        return batch.append_column("is_outlier", pa.array(out, mask=null))

    return ds.map_batches(flag, batch_format="pyarrow")


def _synth_component_pages(sf_dir: str):
    """documents rows -> pages rows whose host link graph has a KNOWN
    multi-component structure (pure function of doc_id): 24 hosts
    ``c<k>.example`` (k = doc_id % 24) in 6 groups of 4, each page linking
    to the next host of its group's ring (``base + (k % 4 + 1) % 4`` with
    ``base = k - k % 4``) — 6 components whose canonical label is the
    lexicographically smallest member.  Relative nav links only add
    self-edges.  The SQL oracle re-derives the same ring from doc_id."""
    ds = _read(sf_dir, "documents", ["doc_id"])

    def synth(batch: pa.Table) -> pa.Table:
        urls: list = []
        payloads: list = []
        for i in batch["doc_id"].to_pylist():
            k = i % 24
            dst = (k - k % 4) + (k % 4 + 1) % 4
            html = (
                "<html><head><title>d</title></head><body>"
                '<nav><a href="/">Home</a> <a href="/a">Archive</a></nav>'
                f'<p><a href="https://c{dst}.example/in">ring</a></p>'
                "</body></html>"
            )
            urls.append(f"https://c{k}.example/d/{i}")
            payloads.append(html.encode("utf-8"))
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "html": pa.array(payloads, pa.binary()),
        })

    return ds.map_batches(synth, batch_format="pyarrow")


def q_host_components(sf_dir: str):
    """Connected components of the host link graph (domain clustering —
    mirror farms / site families): page links -> host edge rollup ->
    pointer-jumping min-label propagation over thin int rows, component
    label = lexicographically smallest member host."""
    from ..stages.links import host_components, host_edges, page_out_links

    edges = host_edges(page_out_links(_synth_component_pages(sf_dir)))
    return host_components(edges, num_partitions=8)


def q_events_lead_bounds(sf_dir: str):
    """Per-user LEAD(ts) + FIRST_VALUE / LAST_VALUE over the whole user
    partition (time-to-next-event and opening/closing spend) — completes
    the SQL window family on the same single-exchange lexsort sweep."""
    from ..stages.windows import key_lead_bounds

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        cents = pc.cast(pc.floor(pc.multiply(batch["value"], 100.0)), pa.int64())
        return pa.table({
            "event_id": batch["event_id"],
            "user_id": batch["user_id"],
            "ts": batch["ts"],
            "value_cents": cents,
        })

    prepped = ds.map_batches(prep, batch_format="pyarrow")
    return key_lead_bounds(
        prepped, "user_id", "ts", "event_id", "value_cents",
        num_partitions=16,
    )


def q_lineitem_revenue_pruned(sf_dir: str):
    """TPC-H Q6 shape with the predicate pushed INTO the parquet read:
    ``read_parquet(columns=[price, discount], filter=shipdate-year &
    discount-band & quantity)`` prunes row groups and columns at the scan
    (the "prune at the read" rule — filter columns never enter the
    pipeline).  Revenue is integer-exact (cents x basis points, floored
    per row before the sum) so the global total is order-independent."""
    import datetime as dt

    import pyarrow.dataset as pads
    import ray.data as rd
    from ray.data.aggregate import Sum

    f = (
        (pads.field("l_shipdate") >= dt.datetime(1997, 1, 1))
        & (pads.field("l_shipdate") < dt.datetime(1998, 1, 1))
        & (pads.field("l_discount") >= 0.05)
        & (pads.field("l_discount") <= 0.07)
        & (pads.field("l_quantity") < 24.0)
    )
    ds = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_extendedprice", "l_discount"],
        filter=f,
    )

    def partial(batch: pa.Table) -> pa.Table:
        cents = np.floor(
            batch["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        bp = np.floor(
            batch["l_discount"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        return pa.table({
            "rev_p": pa.array([int((cents * bp).sum())], pa.int64()),
            "n_p": pa.array([batch.num_rows], pa.int64()),
        })

    agg = ds.map_batches(partial, batch_format="pyarrow").aggregate(
        Sum("rev_p", alias_name="revenue_u"), Sum("n_p", alias_name="n_rows")
    )
    import pandas as pd

    return pd.DataFrame({
        "revenue_u": [int(agg["revenue_u"] or 0)],
        "n_rows": [int(agg["n_rows"] or 0)],
    })


def q_token_entropy(sf_dir: str):
    """Per-doc Shannon entropy of the token distribution (information-
    density quality signal) — fixed-point-exact c*ln(c) fold, one map
    pass (stages.analysis.make_token_entropy_batch)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        analysis.make_token_entropy_batch("text", "doc_id"),
        batch_format="pyarrow",
    )


def q_events_funnel(sf_dir: str):
    """Per-user ordered conversion funnel view -> click -> purchase (each
    step's completion = min event time strictly after the previous step):
    one key exchange, three vectorized masked segmented-min passes — the
    product-analytics pattern over the events stream."""
    from ..stages.windows import key_funnel

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_type"])
    return key_funnel(
        ds, "user_id", "ts", "event_type",
        steps=["view", "click", "purchase"], num_partitions=16,
    )


def q_sentence_stats(sf_dir: str):
    """Per-doc sentence segmentation stats (count + total chars of
    non-empty sentence segments) — integer-exact structure signal, one
    map pass (stages.analysis.make_sentence_stats_batch)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        analysis.make_sentence_stats_batch("text", "doc_id"),
        batch_format="pyarrow",
    )


def q_hourly_active_users(sf_dir: str):
    """Exact distinct-users-per-hour + event counts (the DAU/MAU shape):
    per-batch (hour, user, n) partials shrink to the (hour x user)
    support, ONE crc32(hour)-keyed exchange co-locates each hour, and a
    per-partition lexsort sweep folds counts and resolves the distinct
    count — count(DISTINCT) without a corpus-wide pair groupby round."""
    from ..stages.partition import with_hash_partition

    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def partial(batch: pa.Table) -> pa.Table:
        out_schema = pa.schema([
            ("hour", pa.timestamp("us")),
            ("user_id", pa.int64()),
            ("n_p", pa.int64()),
        ])
        if not batch.num_rows:
            return out_schema.empty_table()
        hour = pc.floor_temporal(batch["ts"], unit="hour")
        t = pa.table({"hour": hour, "user_id": batch["user_id"]})
        return (
            t.group_by(["hour", "user_id"])
            .aggregate([([], "count_all")])
            .rename_columns(["hour", "user_id", "n_p"])
            .cast(out_schema)
        )

    parts = with_hash_partition(
        _as_int_keyed(ds.map_batches(partial, batch_format="pyarrow")),
        "_hour_us", 16,
    )

    def sweep(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["_part"])
        out_schema = pa.schema([
            ("hour", pa.timestamp("us")),
            ("n_users", pa.int64()),
            ("n_events", pa.int64()),
        ])
        if not t.num_rows:
            return out_schema.empty_table()
        h = t["_hour_us"].to_numpy(zero_copy_only=False)
        u = t["user_id"].to_numpy(zero_copy_only=False)
        n = t["n_p"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        order = np.lexsort((u, h))
        h_s, u_s, n_s = h[order], u[order], n[order]
        new_pair = np.concatenate(
            [[True], (h_s[1:] != h_s[:-1]) | (u_s[1:] != u_s[:-1])]
        )
        starts = np.flatnonzero(new_pair)
        ph = h_s[starts]
        pn = np.add.reduceat(n_s, starts)
        new_hour = np.concatenate([[True], ph[1:] != ph[:-1]])
        hstarts = np.flatnonzero(new_hour)
        counts_pairs = np.diff(np.append(hstarts, len(ph)))
        return pa.table({
            "hour": pa.array(ph[hstarts], pa.int64()).cast(
                pa.timestamp("us")
            ),
            "n_users": pa.array(counts_pairs, pa.int64()),
            "n_events": pa.array(np.add.reduceat(pn, hstarts), pa.int64()),
        }, schema=out_schema)

    return parts.groupby("_part").map_groups(sweep, batch_format="pyarrow")


def _as_int_keyed(pairs_ds):
    """Add an int64 ``_hour_us`` view of the ``hour`` timestamp column so
    the partition hash and the sweep compare plain ints."""

    def add(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_hour_us", pc.cast(batch["hour"], pa.int64())
        )

    return pairs_ds.map_batches(add, batch_format="pyarrow")


def q_events_retention(sf_dir: str):
    """Weekly retention cohorts: users grouped by the week of their FIRST
    event, counted in every week they were active — the retention-matrix
    shape.  ONE crc32(user) exchange of thin distinct (user, week)
    partials; each partition resolves its users' cohort (min week) and
    emits (cohort, week) pair counts; the final (weeks x weeks) fold is
    KB-scale."""
    from ray.data.aggregate import Sum

    from ..stages.partition import with_hash_partition

    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def partial(batch: pa.Table) -> pa.Table:
        out_schema = pa.schema([
            ("user_id", pa.int64()),
            ("wk_us", pa.int64()),
        ])
        if not batch.num_rows:
            return out_schema.empty_table()
        wk = pc.cast(
            pc.floor_temporal(batch["ts"], unit="week"), pa.int64()
        )
        t = pa.table({"user_id": batch["user_id"], "wk_us": wk})
        return (
            t.group_by(["user_id", "wk_us"])
            .aggregate([])
            .cast(out_schema)
        )

    parts = with_hash_partition(
        ds.map_batches(partial, batch_format="pyarrow"), "user_id", 16
    )

    def cohort_pairs(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["_part"])
        out_schema = pa.schema([
            ("cohort_us", pa.int64()),
            ("wk_us", pa.int64()),
            ("n_p", pa.int64()),
        ])
        if not t.num_rows:
            return out_schema.empty_table()
        u = t["user_id"].to_numpy(zero_copy_only=False)
        w = t["wk_us"].to_numpy(zero_copy_only=False)
        order = np.lexsort((w, u))
        u_s, w_s = u[order], w[order]
        new_pair = np.concatenate(
            [[True], (u_s[1:] != u_s[:-1]) | (w_s[1:] != w_s[:-1])]
        )
        u_d, w_d = u_s[new_pair], w_s[new_pair]
        new_user = np.concatenate([[True], u_d[1:] != u_d[:-1]])
        ustarts = np.flatnonzero(new_user)
        reps = np.diff(np.append(ustarts, len(u_d)))
        cohort = np.repeat(w_d[ustarts], reps)  # min week = first in order
        pair, n = np.unique(
            np.stack([cohort, w_d], axis=1), axis=0, return_counts=True
        )
        return pa.table({
            "cohort_us": pa.array(pair[:, 0], pa.int64()),
            "wk_us": pa.array(pair[:, 1], pa.int64()),
            "n_p": pa.array(n, pa.int64()),
        }, schema=out_schema)

    folded = (
        parts.groupby("_part")
        .map_groups(cohort_pairs, batch_format="pyarrow")
        .groupby(["cohort_us", "wk_us"])
        .aggregate(Sum("n_p", alias_name="n_users"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "cohort": pc.cast(
                batch["cohort_us"], pa.timestamp("us")
            ),
            "wk": pc.cast(batch["wk_us"], pa.timestamp("us")),
            "n_users": batch["n_users"].cast(pa.int64()),
        })

    return folded.map_batches(finish, batch_format="pyarrow")


def q_user_gap_median(sf_dir: str):
    """Per-user median inter-arrival time (crawl-politeness / engagement
    statistic): key_lag's exact microsecond deltas composed with the
    high-cardinality per-key median kernel (stages.windows.key_median —
    one row per user, state inside the partitions, unlike the
    grouped-quantile kernel whose driver state caps at ~10^3 groups)."""
    from ..stages.windows import key_lag, key_median

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    lagged = key_lag(ds, "user_id", "ts", "event_id", num_partitions=16)
    return key_median(lagged, "user_id", "delta_us", num_partitions=16)


def q_source_length_stats(sf_dir: str):
    """Per-source length moments: n / sum / sample variance / stddev from
    per-batch (n, sum, sum-of-squares) integer partials — the classic
    mergeable moment sketch.  The variance is ONE fixed double expression
    of exact ints ((sumsq - sum*sum/n) / (n-1), mirrored op-for-op in the
    SQL), so the floats are bit-reproducible: IEEE ops on identical exact
    inputs — only summation ORDER or transcendentals can diverge, and
    there are neither (sqrt is correctly rounded)."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", ["source", "n_chars"])

    def partial(batch: pa.Table) -> pa.Table:
        out_schema = pa.schema([
            ("source", pa.string()),
            ("n_p", pa.int64()),
            ("sum_p", pa.int64()),
            ("sumsq_p", pa.int64()),
        ])
        if not batch.num_rows:
            return out_schema.empty_table()
        x = batch["n_chars"]
        t = pa.table({
            "source": batch["source"],
            "one": pa.array(np.ones(batch.num_rows, np.int64), pa.int64()),
            "x": x.cast(pa.int64()),
            "xx": pc.multiply(x.cast(pa.int64()), x.cast(pa.int64())),
        })
        return (
            t.group_by(["source"])
            .aggregate([("one", "sum"), ("x", "sum"), ("xx", "sum")])
            .rename_columns(["source", "n_p", "sum_p", "sumsq_p"])
            .cast(out_schema)
        )

    folded = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            Sum("n_p", alias_name="n_docs"),
            Sum("sum_p", alias_name="sum_chars"),
            Sum("sumsq_p", alias_name="sumsq"),
        )
    )

    def finish(batch: pa.Table) -> pa.Table:
        n = batch["n_docs"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        s = batch["sum_chars"].cast(pa.int64()).to_numpy(
            zero_copy_only=False
        ).astype(np.float64)
        ss = batch["sumsq"].cast(pa.int64()).to_numpy(
            zero_copy_only=False
        ).astype(np.float64)
        # op-for-op the SQL expression: sum*sum, then /n, then -, then /
        var = (ss - s * s / n) / (n - 1)
        return pa.table({
            "source": batch["source"],
            "n_docs": batch["n_docs"].cast(pa.int64()),
            "sum_chars": batch["sum_chars"].cast(pa.int64()),
            "var_chars": pa.array(var, pa.float64()),
            "std_chars": pa.array(np.sqrt(var), pa.float64()),
        })

    return folded.map_batches(finish, batch_format="pyarrow")


def q_events_percentiles(sf_dir: str):
    """Per-user PERCENT_RANK / CUME_DIST over spend — relative-standing
    window pair, one double division of exact ints each (bit-reproducible
    floats), same single-exchange sweep as the rank family."""
    from ..stages.windows import key_percentiles

    ds = _read(sf_dir, "events", ["event_id", "user_id", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        cents = pc.cast(pc.floor(pc.multiply(batch["value"], 100.0)), pa.int64())
        return pa.table({
            "event_id": batch["event_id"],
            "user_id": batch["user_id"],
            "value_cents": cents,
        })

    prepped = ds.map_batches(prep, batch_format="pyarrow")
    return key_percentiles(
        prepped, "user_id", "value_cents", "event_id", num_partitions=16
    )
