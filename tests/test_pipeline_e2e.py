"""End-to-end: Ray pipeline output byte-identical per url to the sequential
golden driver on the seeded synthetic corpus (FIXTURES.md §1-§4)."""

import pyarrow as pa
import pytest

from deepseek_ocr_customvllm_ray.config import ExtractConfig
from deepseek_ocr_customvllm_ray.pipelines.extract import build_extract_pipeline
from deepseek_ocr_customvllm_ray.sources.corpus import generate_pages
from deepseek_ocr_customvllm_ray.sources.golden import run_golden


@pytest.fixture(scope="module")
def corpus():
    return generate_pages(n_docs=40, seed=7)


@pytest.fixture(scope="module")
def golden(corpus):
    return run_golden(corpus)


@pytest.fixture(scope="module")
def engine_result(ray_session, corpus):
    import ray.data as rd

    ds = rd.from_arrow(corpus)
    out = build_extract_pipeline(ds, ExtractConfig(ocr_concurrency=2))
    return out.to_pandas().sort_values("url").reset_index(drop=True)


def test_corpus_has_families(corpus):
    # sanity: both branches + dups present
    payloads = corpus["html"].to_pylist()
    kinds = {p[:4] == b"%PDF" for p in payloads}
    assert kinds == {True, False}
    urls = corpus["url"].to_pylist()
    assert len(urls) > len(set(urls))  # duplicate urls present


def test_same_urls(golden, engine_result):
    g = sorted(golden["url"].to_pylist())
    e = sorted(engine_result["url"].tolist())
    assert g == e


def test_byte_identical_core_columns(golden, engine_result):
    gdf = golden.to_pandas().sort_values("url").reset_index(drop=True)
    for col in ["markdown", "extracted_text", "raw_md", "doc_json", "doc_kind", "n_pages"]:
        mismatches = [
            (u, a, b)
            for u, a, b in zip(gdf["url"], gdf[col], engine_result[col])
            if a != b
        ]
        assert not mismatches, f"{col}: first mismatch {mismatches[0][:2]}"


def test_blocks_and_figures_match(golden, engine_result):
    gdf = golden.to_pandas().sort_values("url").reset_index(drop=True)

    def norm_blocks(v):
        return [
            {k: (list(map(list, val)) if k == "rows" and val is not None else val)
             for k, val in b.items()}
            for b in (list(v) if v is not None else [])
        ]

    def norm_figs(v):
        return [(f["name"], bytes(f["jpeg"])) for f in (list(v) if v is not None else [])]

    for u, gb, eb in zip(gdf["url"], gdf["blocks"], engine_result["blocks"]):
        assert norm_blocks(gb) == norm_blocks(eb), f"blocks mismatch for {u}"
    for u, gf, ef in zip(gdf["url"], gdf["figures"], engine_result["figures"]):
        assert norm_figs(gf) == norm_figs(ef), f"figures mismatch for {u}"


def test_dedup_first_wins(golden, corpus):
    # duplicated urls appear once, and the winner is the earliest warc_ts
    urls = corpus["url"].to_pylist()
    dup_url = next(u for u in urls if urls.count(u) > 1)
    gdf = golden.to_pandas()
    assert (gdf["url"] == dup_url).sum() == 1


def test_multichunk_doc_present(golden):
    # >40-page docs exercise chunk-boundary invariance
    gdf = golden.to_pandas()
    assert (gdf["n_pages"] > 40).any()


def test_maponly_and_fused_paths_byte_identical(ray_session, corpus, golden, tmp_path):
    """All three pipeline topologies (page-exploded, partition-fused,
    map-only) produce byte-identical documents."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from deepseek_ocr_customvllm_ray.pipelines.extract import (
        build_extract_pipeline_fused,
        build_extract_pipeline_maponly,
    )

    p = str(tmp_path / "pages.parquet")
    pq.write_table(corpus, p)
    gdf = golden.to_pandas().sort_values("url").reset_index(drop=True)

    mo = (
        build_extract_pipeline_maponly(p, ExtractConfig())
        .to_pandas().sort_values("url").reset_index(drop=True)
    )
    fu = (
        build_extract_pipeline_fused(rd.from_arrow(corpus), ExtractConfig())
        .to_pandas().sort_values("url").reset_index(drop=True)
    )
    for name, df in (("maponly", mo), ("fused", fu)):
        assert gdf["url"].tolist() == df["url"].tolist(), name
        for col in ["markdown", "extracted_text", "raw_md", "doc_json", "n_pages"]:
            assert gdf[col].tolist() == df[col].tolist(), f"{name}:{col}"


def test_maponly_distributed_winners_byte_identical(ray_session, corpus, golden, tmp_path):
    """The Ray-groupby winner path (cfg.winners_strategy='distributed')
    matches the driver-side local path byte-for-byte, clone and shadow
    cases included."""
    import datetime as dt

    import pyarrow.parquet as pq

    from deepseek_ocr_customvllm_ray.pipelines.extract import (
        build_extract_pipeline_maponly,
    )

    cfg = ExtractConfig(winners_strategy="distributed")

    p = str(tmp_path / "pages.parquet")
    pq.write_table(corpus, p)
    gdf = golden.to_pandas().sort_values("url").reset_index(drop=True)
    mo = (
        build_extract_pipeline_maponly(p, cfg)
        .to_pandas().sort_values("url").reset_index(drop=True)
    )
    assert gdf["url"].tolist() == mo["url"].tolist()
    for col in ["markdown", "extracted_text", "raw_md", "doc_json", "n_pages"]:
        assert gdf[col].tolist() == mo[col].tolist(), col

    # exact-clone rows keep exactly one (tie path, distributed)
    payload = b"<html><body><div id=m><p>clone body text long enough to extract, yes indeed.</p></div></body></html>"
    t = pa.table({
        "url": ["https://a/x"] * 3 + ["https://a/y"],
        "warc_ts": pa.array(
            [dt.datetime(2026, 1, 1)] * 3 + [dt.datetime(2026, 1, 2)], pa.timestamp("us")
        ),
        "html": pa.array([payload] * 4, pa.binary()),
        "text": [""] * 4,
        "lang": ["en"] * 4,
    })
    pc_path = str(tmp_path / "clones_dist.parquet")
    pq.write_table(t, pc_path)
    out = build_extract_pipeline_maponly(pc_path, cfg).to_pandas()
    assert sorted(out["url"]) == ["https://a/x", "https://a/y"]

    # invalid earliest dup must not shadow the later valid crawl
    valid = b"<html><body><div id=m><p>the real body text of this page, long enough to extract.</p></div></body></html>"
    t2 = pa.table({
        "url": ["https://a/s", "https://a/s", "https://a/t"],
        "warc_ts": pa.array(
            [dt.datetime(2026, 1, 1), dt.datetime(2026, 2, 1), dt.datetime(2026, 1, 5)],
            pa.timestamp("us"),
        ),
        "html": pa.array([b"", valid, valid], pa.binary()),
        "text": [""] * 3,
        "lang": ["en"] * 3,
    })
    ps = str(tmp_path / "shadow_dist.parquet")
    pq.write_table(t2, ps)
    out2 = build_extract_pipeline_maponly(ps, cfg).to_pandas()
    assert sorted(out2["url"]) == ["https://a/s", "https://a/t"]
    assert "real body text" in out2.set_index("url").loc["https://a/s", "extracted_text"]


def test_maponly_clone_rows(ray_session, tmp_path):
    """Exact-clone duplicate rows (same url, ts, payload) keep exactly one."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from deepseek_ocr_customvllm_ray.pipelines.extract import (
        build_extract_pipeline_maponly,
    )

    payload = b"<html><body><div id=m><p>clone body text long enough to extract, yes indeed.</p></div></body></html>"
    t = pa.table({
        "url": ["https://a/x"] * 3 + ["https://a/y"],
        "warc_ts": pa.array([dt.datetime(2026, 1, 1)] * 3 + [dt.datetime(2026, 1, 2)], pa.timestamp("us")),
        "html": pa.array([payload, payload, payload, payload], pa.binary()),
        "text": [""] * 4,
        "lang": ["en"] * 4,
    })
    p = str(tmp_path / "clones.parquet")
    pq.write_table(t, p)
    out = build_extract_pipeline_maponly(p, ExtractConfig()).to_pandas()
    assert sorted(out["url"]) == ["https://a/x", "https://a/y"]


def test_page_dedup_strategies_byte_identical(ray_session, corpus, golden):
    """The exploded pipeline's two dedup strategies (broadcast meta-winner
    filter vs url-keyed payload shuffle) produce byte-identical documents.
    The module fixtures already run the default (broadcast); this pins the
    shuffle path against the same golden."""
    import ray.data as rd

    gdf = golden.to_pandas().sort_values("url").reset_index(drop=True)
    sh = (
        build_extract_pipeline(
            rd.from_arrow(corpus),
            ExtractConfig(ocr_concurrency=2, page_dedup_strategy="shuffle"),
        )
        .to_pandas().sort_values("url").reset_index(drop=True)
    )
    assert gdf["url"].tolist() == sh["url"].tolist()
    for col in ["markdown", "extracted_text", "raw_md", "doc_json", "n_pages"]:
        assert gdf[col].tolist() == sh[col].tolist(), col


def test_broadcast_page_dedup_ties_clones_shadow(ray_session):
    """Edge families through the exploded pipeline's BROADCAST dedup:
    sha tie-break at equal earliest ts, exact-clone collapse, and an
    invalid earliest crawl that must not shadow the later valid one —
    each matching the golden driver."""
    import datetime as dt

    import ray.data as rd

    def body(tag):
        return (
            f"<html><body><div id=m><p>broadcast dedup body {tag}, long enough "
            f"to extract properly indeed.</p></div></body></html>"
        ).encode()

    T0 = dt.datetime(2026, 1, 1)
    rows = [
        # sha tie-break: two payloads at the same earliest ts + a later loser
        ("https://b/tie", T0, body("tie-a")),
        ("https://b/tie", T0, body("tie-b")),
        ("https://b/tie", dt.datetime(2026, 2, 1), body("tie-late")),
        # exact clones: identical (url, ts, payload) x3
        ("https://b/clone", T0, body("clone")),
        ("https://b/clone", T0, body("clone")),
        ("https://b/clone", T0, body("clone")),
        # shadow: earliest crawl is EMPTY (invalid), later crawl valid
        ("https://b/shadow", T0, b""),
        ("https://b/shadow", dt.datetime(2026, 3, 1), body("shadow-valid")),
        # a singleton for good measure
        ("https://b/solo", T0, body("solo")),
    ]
    t = pa.table({
        "url": [r[0] for r in rows],
        "warc_ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "html": pa.array([r[2] for r in rows], pa.binary()),
        "text": [""] * len(rows),
        "lang": ["en"] * len(rows),
    })
    gdf = run_golden(t).to_pandas().sort_values("url").reset_index(drop=True)
    out = (
        build_extract_pipeline(
            rd.from_arrow(t),
            ExtractConfig(ocr_concurrency=2, page_dedup_strategy="broadcast"),
        )
        .to_pandas().sort_values("url").reset_index(drop=True)
    )
    assert out["url"].tolist() == gdf["url"].tolist()
    assert out["extracted_text"].tolist() == gdf["extracted_text"].tolist()
    assert out["markdown"].tolist() == gdf["markdown"].tolist()


def test_determinism_rerun(ray_session, corpus):
    """Same input, fresh pipeline -> byte-identical output (retry safety)."""
    import ray.data as rd

    a = (
        build_extract_pipeline(rd.from_arrow(corpus), ExtractConfig(ocr_concurrency=2))
        .to_pandas().sort_values("url").reset_index(drop=True)
    )
    b = (
        build_extract_pipeline(rd.from_arrow(corpus), ExtractConfig(ocr_concurrency=3))
        .to_pandas().sort_values("url").reset_index(drop=True)
    )
    assert a["markdown"].tolist() == b["markdown"].tolist()
    assert a["doc_json"].tolist() == b["doc_json"].tolist()


def test_fallback_engine_strips_tags(ray_session):
    """A7 analog: engine swap to the plain-text fallback removes grounding
    tags from raw output (no figures, no image links)."""
    import ray.data as rd

    from deepseek_ocr_customvllm_ray.stages.ocr_stage import (
        FallbackOcrEngine,
        explode_documents,
        make_postprocess_page_batch,
        merge_partition,
    )
    from deepseek_ocr_customvllm_ray.stages.partition import with_hash_partition
    from deepseek_ocr_customvllm_ray.stages.validate import make_route_batch

    corpus = generate_pages(n_docs=20, seed=3, pdf_fraction=1.0)
    cfg = ExtractConfig()
    ds = rd.from_arrow(corpus).map_batches(make_route_batch(200), batch_format="pyarrow")
    pages = ds.map_batches(explode_documents, batch_format="pyarrow")
    pages = pages.map_batches(
        FallbackOcrEngine, fn_constructor_kwargs={"cfg": cfg},
        batch_format="pyarrow", concurrency=1,
    )
    pages = pages.map_batches(make_postprocess_page_batch(cfg), batch_format="pyarrow")
    docs = with_hash_partition(pages, "url", 4).groupby("_part").map_groups(
        merge_partition, batch_format="pyarrow"
    ).to_pandas()
    # no dedup stage in this hand-built pipeline: every CRAWL (url, ts) is
    # its own document, including the generator's duplicate-url row
    n_crawls = len(set(zip(corpus["url"].to_pylist(), corpus["warc_ts"].to_pylist())))
    assert len(docs) == n_crawls
    assert not docs["markdown"].str.contains(r"<\|ref\|>", regex=True).any()
    assert all(len(f) == 0 for f in docs["figures"])


def test_renderer_seam_injects_alternate_renderer(ray_session):
    """The pdf page renderer is a constructor swap: an injected fake
    renderer drives the whole pipeline end-to-end (explode -> OCR actor ->
    postprocess -> merge) and its pages appear in the output."""
    import ray.data as rd

    class _FixedPageRenderer:
        # local class: cloudpickle ships it by VALUE (a module-level class
        # in the tests package would pickle by reference, which Ray workers
        # cannot import — that deadlocks the actor pool)
        def render(self, payload):
            return [
                (800, 1000, "alpha page one"),
                (800, 1000, "beta page two"),
            ]

    corpus = generate_pages(n_docs=10, seed=11, pdf_fraction=1.0)
    out = (
        build_extract_pipeline(
            rd.from_arrow(corpus), ExtractConfig(ocr_concurrency=2),
            renderer=_FixedPageRenderer(),
        )
        .to_pandas()
    )
    assert len(out) > 0
    assert (out["n_pages"] == 2).all()
    assert out["markdown"].str.contains("alpha page one").all()
    assert out["markdown"].str.contains("beta page two").all()


def test_n_image_tokens_accounted(golden):
    gdf = golden.to_pandas()
    pdfs = gdf[gdf["doc_kind"] == "pdf"]
    # every page contributes at least the global view (16*17+1 = 273)
    assert (pdfs["n_image_tokens"] >= 273 * 1).all()
    assert (gdf[gdf["doc_kind"] == "html"]["n_image_tokens"] == 0).all()


def test_invalid_earliest_dup_does_not_shadow(ray_session, tmp_path):
    """Validation precedes dedup: a duplicate url whose EARLIEST crawl is
    invalid (empty / oversize) must not shadow the later valid crawl
    (regression for the map-only winner-resolution bug)."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from deepseek_ocr_customvllm_ray.pipelines.extract import (
        build_extract_pipeline_maponly,
    )

    valid = b"<html><body><div id=m><p>the real body text of this page, long enough to extract.</p></div></body></html>"
    t = pa.table({
        "url": ["https://a/s", "https://a/s", "https://a/t"],
        "warc_ts": pa.array(
            [dt.datetime(2026, 1, 1), dt.datetime(2026, 2, 1), dt.datetime(2026, 1, 5)],
            pa.timestamp("us"),
        ),
        "html": pa.array([b"", valid, valid], pa.binary()),  # earliest dup is EMPTY
        "text": [""] * 3,
        "lang": ["en"] * 3,
    })
    p = str(tmp_path / "shadow.parquet")
    pq.write_table(t, p)

    out = build_extract_pipeline_maponly(p, ExtractConfig()).to_pandas()
    assert sorted(out["url"]) == ["https://a/s", "https://a/t"]
    assert "real body text" in out.set_index("url").loc["https://a/s", "extracted_text"]

    golden_out = run_golden(t).to_pandas()
    assert sorted(golden_out["url"]) == sorted(out["url"])


def test_winner_meta_scan_sees_nested_shards(ray_session, tmp_path):
    """Shard discovery for the winner meta scans must match pyarrow dataset
    discovery (recursive): duplicate urls split across a NESTED shard
    directory still dedup (regression: a top-level glob missed them)."""
    import datetime as dt

    import pyarrow.parquet as pq

    from deepseek_ocr_customvllm_ray.pipelines.extract import (
        build_extract_pipeline_maponly,
    )

    body = b"<html><body><div id=m><p>nested shard duplicate body, long enough to extract.</p></div></body></html>"

    def page(ts):
        return pa.table({
            "url": ["https://n/dup"],
            "warc_ts": pa.array([ts], pa.timestamp("us")),
            "html": pa.array([body], pa.binary()),
            "text": [""],
            "lang": ["en"],
        })

    root = tmp_path / "pages"
    (root / "sub").mkdir(parents=True)
    pq.write_table(page(dt.datetime(2026, 1, 1)), str(root / "a.parquet"))
    pq.write_table(page(dt.datetime(2026, 2, 1)), str(root / "b.parquet"))
    # the EARLIEST crawl hides in a nested directory
    pq.write_table(page(dt.datetime(2025, 12, 1)), str(root / "sub" / "c.parquet"))

    for strategy in ("local", "distributed"):
        out = build_extract_pipeline_maponly(
            str(root), ExtractConfig(winners_strategy=strategy)
        ).to_pandas()
        assert len(out) == 1, strategy
        assert out["url"].tolist() == ["https://n/dup"], strategy


def test_distributed_winners_many_tie_groups(ray_session, tmp_path):
    """Several urls with timestamp ties (different payloads per tie, plus an
    invalid candidate inside a tie group) resolve to exactly one row per
    url, matching the golden driver."""
    import datetime as dt

    import pyarrow.parquet as pq

    from deepseek_ocr_customvllm_ray.pipelines.extract import (
        build_extract_pipeline_maponly,
    )

    def body(tag):
        return (
            f"<html><body><div id=m><p>tie group body {tag}, long enough to extract "
            f"properly indeed.</p></div></body></html>"
        ).encode()

    T0 = dt.datetime(2026, 1, 1)
    rows = []
    for g in range(4):
        url = f"https://t/{g}"
        # two distinct payloads at the SAME earliest ts -> sha tie-break
        rows.append((url, T0, body(f"{g}a")))
        rows.append((url, T0, body(f"{g}b")))
        # a later crawl that must lose
        rows.append((url, dt.datetime(2026, 2, 1), body(f"{g}late")))
    # one tie group whose members include an INVALID (empty) candidate
    rows.append(("https://t/inv", T0, b""))
    rows.append(("https://t/inv", T0, body("inv-valid")))

    t = pa.table({
        "url": [r[0] for r in rows],
        "warc_ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "html": pa.array([r[2] for r in rows], pa.binary()),
        "text": [""] * len(rows),
        "lang": ["en"] * len(rows),
    })
    p = str(tmp_path / "ties.parquet")
    pq.write_table(t, p)

    golden_out = run_golden(t).to_pandas().sort_values("url").reset_index(drop=True)
    for strategy in ("local", "distributed"):
        out = (
            build_extract_pipeline_maponly(
                p, ExtractConfig(winners_strategy=strategy)
            )
            .to_pandas().sort_values("url").reset_index(drop=True)
        )
        assert out["url"].tolist() == golden_out["url"].tolist(), strategy
        assert out["extracted_text"].tolist() == golden_out["extracted_text"].tolist(), strategy


def test_skew_repartition_byte_identical(ray_session, corpus, golden):
    """The north-star byte-length-bucket repartition before the OCR actor
    stage reorders page rows only — output documents are byte-identical
    and carry no helper column."""
    import ray.data as rd

    gdf = golden.to_pandas().sort_values("url").reset_index(drop=True)
    out = (
        build_extract_pipeline(
            rd.from_arrow(corpus),
            ExtractConfig(ocr_concurrency=2, skew_repartition=True),
        )
        .to_pandas().sort_values("url").reset_index(drop=True)
    )
    assert "_size_bucket" not in out.columns
    assert "_skew_part" not in out.columns
    assert gdf["url"].tolist() == out["url"].tolist()
    for col in ["markdown", "extracted_text", "raw_md", "doc_json", "n_pages"]:
        assert gdf[col].tolist() == out[col].tolist(), col
