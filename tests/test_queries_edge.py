"""Edge-case regression tests for latent hazards flagged in round-3 review:

1. ns-precision timestamps through the distributed dup-winner resolution
   (``dedup_meta.agg_partition`` must derive its empty-frame dtype from the
   input, not pin ``datetime64[us]`` — mixing units across partitions left
   concat promotion to chance);
2. null keys through the broadcast anti-join (``q_customers_without_orders``
   must not TypeError sorting a None key, and must pin the documented
   null semantics: null order keys dropped from the broadcast set, null
   customer keys excluded from the count).
"""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq


def test_distributed_winners_ns_precision_timestamps(ray_session, tmp_path):
    """warc_ts stored as timestamp[ns]: duplicate resolution must pick the
    earliest crawl, with most partitions of the 64-way winner exchange empty
    (exercising the dtype-derived empty-frame path in agg_partition)."""
    from deepseek_ocr_customvllm_ray.stages.dedup_meta import (
        compute_dup_winners_distributed,
    )

    body = b"<html><body><div id=m><p>ns precision duplicate body, long enough to extract.</p></div></body></html>"
    t = pa.table({
        "url": ["https://ns/dup", "https://ns/dup", "https://ns/solo"],
        "warc_ts": pa.array(
            [
                dt.datetime(2026, 2, 1),
                dt.datetime(2026, 1, 1),
                dt.datetime(2026, 1, 5),
            ],
            pa.timestamp("ns"),
        ),
        "html": pa.array([body, body + b"!", body], pa.binary()),
        "text": [""] * 3,
        "lang": ["en"] * 3,
    })
    p = str(tmp_path / "ns_pages.parquet")
    pq.write_table(t, p)

    winners, clone_rows = compute_dup_winners_distributed(p)
    assert clone_rows is None
    assert set(winners) == {"https://ns/dup"}
    (ts, _sha) = winners["https://ns/dup"]
    # winner is the EARLIEST crawl regardless of the storage unit
    assert pa.scalar(ts).cast(pa.timestamp("us")).as_py() == dt.datetime(2026, 1, 1)


def test_maponly_pipeline_ns_precision_end_to_end(ray_session, tmp_path):
    """Full map-only flagship over a timestamp[ns] input: the winner filter
    casts the broadcast us-precision winning ts to the batch's unit, so the
    dedup stays exact end to end."""
    from deepseek_ocr_customvllm_ray.config import ExtractConfig
    from deepseek_ocr_customvllm_ray.pipelines.extract import (
        build_extract_pipeline_maponly,
    )

    early = b"<html><body><div id=m><p>the EARLY ns-unit crawl body, long enough to extract.</p></div></body></html>"
    late = b"<html><body><div id=m><p>the LATE ns-unit crawl body, long enough to extract.</p></div></body></html>"
    t = pa.table({
        "url": ["https://ns/e2e", "https://ns/e2e"],
        "warc_ts": pa.array(
            [dt.datetime(2026, 1, 1), dt.datetime(2026, 3, 1)], pa.timestamp("ns")
        ),
        "html": pa.array([early, late], pa.binary()),
        "text": [""] * 2,
        "lang": ["en"] * 2,
    })
    p = str(tmp_path / "ns_e2e.parquet")
    pq.write_table(t, p)

    for strategy in ("local", "distributed"):
        out = build_extract_pipeline_maponly(
            p, ExtractConfig(winners_strategy=strategy)
        ).to_pandas()
        assert len(out) == 1, strategy
        assert "EARLY" in out["extracted_text"].iloc[0], strategy


def _write_tpch_minis(tmp_path):
    orders = pa.table({
        "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
        "o_custkey": pa.array([10, 20, None, 10], pa.int64()),
    })
    customer = pa.table({
        "c_custkey": pa.array([10, 20, 30, 40, None], pa.int64()),
        "c_name": ["a", "b", "c", "d", "e"],
    })
    pq.write_table(orders, str(tmp_path / "orders.parquet"))
    pq.write_table(customer, str(tmp_path / "customer.parquet"))


def test_customers_without_orders_null_keys(ray_session, tmp_path):
    """Null o_custkey must not TypeError the broadcast-set sort, and the
    documented semantics hold: null order keys are dropped from the set
    (they can never equal anything) and a null c_custkey row is excluded
    from the count.  Customers 30 and 40 have no orders -> 2."""
    from deepseek_ocr_customvllm_ray.pipelines.queries import (
        q_customers_without_orders,
    )

    _write_tpch_minis(tmp_path)
    out = q_customers_without_orders(str(tmp_path))
    assert out["n_customers"].tolist() == [2]


def test_distinct_langs_null_group_semantics(ray_session, tmp_path):
    """SQL GROUP BY faithfulness for q_distinct_langs_per_source (round-5
    review): a NULL source is a real group, and a source whose langs are
    all NULL must still appear with n_langs=0 (count(DISTINCT lang)
    skips nulls but keeps the group) — verified against DuckDB on the
    same parquet."""
    import duckdb
    import pyarrow.parquet as pq2

    from deepseek_ocr_customvllm_ray.pipelines.queries import (
        q_distinct_langs_per_source,
    )

    docs = pa.table({
        "doc_id": pa.array(list(range(8)), pa.int64()),
        "source": pa.array(
            ["web", "web", "web", None, None, "wiki", "books", "books"],
            pa.string()),
        "lang": pa.array(
            ["en", "fr", "en", "en", None, None, None, None], pa.string()),
    })
    pq2.write_table(docs, str(tmp_path / "documents.parquet"))

    out = q_distinct_langs_per_source(str(tmp_path))
    got = {
        (None if s != s else s) if s is not None else None: int(n)
        for s, n in zip(out["source"], out["n_langs"])
    }

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM read_parquet("
        f"'{tmp_path}/documents.parquet')"
    )
    oracle = con.execute(
        "SELECT source, count(DISTINCT lang) AS n_langs "
        "FROM documents GROUP BY source"
    ).fetchall()
    want = {s: int(n) for s, n in oracle}
    assert got == want
    assert want == {"web": 2, None: 1, "wiki": 0, "books": 0}


def _write_docs(tmp_path, rows):
    """rows: (doc_id, text, lang, source, n_chars)."""
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array([r[2] for r in rows], pa.string()),
        "source": pa.array([r[3] for r in rows], pa.string()),
        "n_chars": pa.array([r[4] for r in rows], pa.int64()),
    })
    d = tmp_path / "nulldocs"
    d.mkdir(exist_ok=True)
    pq.write_table(t, str(d / "documents.parquet"))
    return str(d)


def test_rollup_null_lang_and_source_groups(ray_session, tmp_path):
    """SQL GROUP BY ROLLUP keeps NULL lang/source as real groups distinct
    from the rollup's own NULL subtotal markers (round-5 review repro:
    Ray's sort-based groupby TypeErrors on null string keys, and a
    dropna pandas fold loses the NULL-lang subtotal)."""
    from deepseek_ocr_customvllm_ray.pipelines.queries import (
        q_lang_source_rollup,
    )

    sf = _write_docs(tmp_path, [
        (1, "a", "en", "s1", 10),
        (2, "b", "en", None, 20),
        (3, "c", None, "s1", 30),
        (4, "d", None, None, 40),
    ])
    out = q_lang_source_rollup(sf)
    rows = {
        (r.lang, r.source): (r.n_docs, r.total_chars)
        for r in out.itertuples()
    }
    # leaf level: the (None, None) LEAF group (doc 4) is folded together
    # with the rollup subtotals by the hash contract's stringification,
    # exactly as DuckDB ROLLUP emits them; spot-check the unambiguous keys
    assert rows[("en", "s1")] == (1, 10)
    assert rows[("en", None)] >= (1, 20)  # leaf + en subtotal share key shape
    assert rows[(None, "s1")] == (1, 30)
    # totals: grand total row sums everything exactly once
    assert out["n_docs"].sum() == 4 * 3  # each doc counted at 3 levels
    # cross-engine: identical to DuckDB ROLLUP on the same table
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet')"
    )
    want = con.execute(
        "SELECT lang, source, count(*) AS n_docs, "
        "CAST(sum(n_chars) AS BIGINT) AS total_chars "
        "FROM documents GROUP BY ROLLUP(lang, source)"
    ).df()
    got_rows = sorted(
        tuple(str(v) for v in r)
        for r in out[sorted(out.columns)].itertuples(index=False, name=None)
    )
    want = want[sorted(want.columns)]
    want_rows = sorted(
        tuple(str(v) for v in r)
        for r in want.itertuples(index=False, name=None)
    )
    assert got_rows == want_rows


def test_pivot_null_source_group(ray_session, tmp_path):
    from deepseek_ocr_customvllm_ray.pipelines.queries import (
        q_source_lang_pivot,
    )

    sf = _write_docs(tmp_path, [
        (1, "a", "en", None, 10),
        (2, "b", None, None, 20),
        (3, "c", "de", "s1", 30),
    ])
    out = q_source_lang_pivot(sf)
    rows = {r.source: r for r in out.itertuples()}
    assert rows[None].n_docs == 2
    assert rows[None].n_en == 1 and rows[None].n_de == 0
    assert rows["s1"].n_de == 1


def test_mad_outliers_null_lang_and_chars(ray_session, tmp_path):
    """NULL-lang rows drop (SQL JOIN USING), NULL n_chars rows keep a
    NULL flag (their dev is NULL in SQL)."""
    from deepseek_ocr_customvllm_ray.pipelines.queries import (
        q_length_mad_outliers,
    )

    sf = _write_docs(tmp_path, [
        (1, "a", "en", "s", 10),
        (2, "b", "en", "s", 11),
        (3, "c", "en", "s", 500),
        (4, "d", None, "s", 10),   # null lang -> dropped
        (5, "e", "en", "s", None),  # null chars -> null flag
    ])
    out = q_length_mad_outliers(sf).to_pandas()
    assert set(out["doc_id"]) == {1, 2, 3, 5}
    by_id = out.set_index("doc_id")["is_outlier"]
    assert by_id[3] == True  # noqa: E712 — 500 vs median 11
    assert by_id[1] == False and by_id[2] == False  # noqa: E712
    assert by_id.isna()[5]


def test_retention_cohort_assignment(ray_session, tmp_path):
    """Cohort = week of FIRST event; a user active in 3 weeks contributes
    one row to each, all under the same cohort."""
    from deepseek_ocr_customvllm_ray.pipelines.queries import (
        q_events_retention,
    )

    def wk(n, dow=0):  # Monday of week n (2026-01-05 is a Monday)
        return dt.datetime(2026, 1, 5) + dt.timedelta(weeks=n, days=dow)

    t = pa.table({
        "event_id": pa.array(range(6), pa.int64()),
        "ts": pa.array(
            [wk(0, 2), wk(1), wk(2), wk(1, 3), wk(1, 4), wk(0)],
            pa.timestamp("us"),
        ),
        "user_id": pa.array([1, 1, 1, 2, 2, 3], pa.int64()),
        "event_type": pa.array(["view"] * 6, pa.string()),
        "value": pa.array([1.0] * 6, pa.float64()),
        "props": pa.array([""] * 6, pa.string()),
    })
    d = tmp_path / "ret"
    d.mkdir()
    pq.write_table(t, str(d / "events.parquet"))
    out = q_events_retention(str(d)).to_pandas()
    rows = {
        (r.cohort, r.wk): r.n_users for r in out.itertuples()
    }
    # user1: cohort wk0, active wk0/1/2; user2: cohort wk1 (two events,
    # one distinct week); user3: cohort wk0, active wk0
    assert rows[(wk(0), wk(0))] == 2
    assert rows[(wk(0), wk(1))] == 1
    assert rows[(wk(0), wk(2))] == 1
    assert rows[(wk(1), wk(1))] == 1
    assert len(rows) == 4
