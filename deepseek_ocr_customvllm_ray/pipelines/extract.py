"""Flagship extraction pipeline (SURVEY §3.3 dataflow, Ray-Data-first).

::

    read(pages parquet, columns pruned)          # S1
      -> map_batches(route/validate)             # S1 validation, %PDF routing
      -> dedup guard                             # cfg.page_dedup_strategy:
                                                 #   "broadcast" (default) =
                                                 #   meta winners + filter, no
                                                 #   payload all-to-all;
                                                 #   "shuffle" = groupby(url)
                                                 #   keep-earliest exchange
      -> map_batches(explode_documents)          # S2 page explode (skew break);
                                                 #   html docs = 1 logical page
      -> map_batches(MockOcrEngine, concurrency=N, batch_size=B)  # A1-A5 actor pool
      -> map_batches(postprocess)                # M9-M16 / Readability
      -> groupby(url).map_groups(merge)          # G1  [shuffle 2: url]
      -> (caller: write_parquet / lineage pass)

Scale notes (100 TB design):
- the read prunes to the 4 needed columns; row filters push to row groups;
- the dedup guard runs BEFORE page explosion multiplies data volume; the
  default broadcast strategy never ships payload bytes through an
  all-to-all (stages/dedup_url.dedup_by_url_broadcast);
- page explode converts doc-size skew into uniform page-row units; the OCR
  actor pool's ``batch_size`` bounds per-task memory like ``max_num_seqs``;
- the page->doc merge is the one remaining all-to-all (page rows keyed on
  url); with ``page_dedup_strategy="shuffle"`` both exchanges share the
  same key and hash so the merge can reuse the dedup partitioning;
- nothing materializes the full dataset — callers consume by writing or
  aggregating.
"""

from __future__ import annotations

from typing import Optional

from ..config import ExtractConfig
from ..stages.dedup_url import dedup_by_url, dedup_by_url_broadcast
from ..stages.ocr_stage import (
    MockOcrEngine,
    explode_documents,
    make_explode_documents,
    make_postprocess_page_batch,
    merge_partition,
)
from ..stages.partition import with_hash_partition
from ..stages.validate import make_route_batch

INPUT_COLUMNS = ["url", "warc_ts", "html", "text", "lang"]


def read_pages(path, columns: Optional[list] = None, **kwargs):
    import ray.data as rd

    return rd.read_parquet(
        path, columns=columns or ["url", "warc_ts", "html", "lang"], **kwargs
    )


def warm_identity_batch(batch):
    """Identity map that also imports the extraction modules — used by
    warm-up passes so worker processes pay package import (regex compiles,
    module load) BEFORE the timed run, not inside it."""
    from ..sources.golden import extract_document  # noqa: F401
    from ..stages.validate import make_route_batch  # noqa: F401

    return batch


def build_extract_pipeline(ds, cfg: ExtractConfig = None, dedup: bool = True,
                           renderer=None, engine_cls=None,
                           engine_kwargs: Optional[dict] = None,
                           engine_resources: Optional[dict] = None):
    """pages Dataset -> extracted-documents Dataset (EXTRACTED_SCHEMA).

    Single consumption of the routed/deduped stream: html docs ride the
    unified page-row schema (one logical page) so the pipeline never forks
    (a fork would re-execute the read + dedup shuffle once per branch).
    ``renderer`` (a stages.ocr_stage.PageRenderer) swaps the pdf page
    renderer — the PyMuPDF/GPU deployment seam.  ``engine_cls`` swaps the
    OCR actor class the same way (``stages.vllm_engine.make_ocr_engine()``
    returns ``VllmOcrEngine`` on a vLLM cluster, the mock here);
    ``engine_kwargs`` feed its constructor (e.g. ``model_path``) and
    ``engine_resources`` its scheduling (e.g. ``{"num_gpus": 1}``).
    """
    cfg = cfg or ExtractConfig()

    ds = ds.map_batches(make_route_batch(cfg.max_payload_mb), batch_format="pyarrow")
    if dedup:
        if cfg.page_dedup_strategy == "broadcast":
            ds = dedup_by_url_broadcast(ds, max_payload_mb=cfg.max_payload_mb)
        else:
            ds = dedup_by_url(ds, num_partitions=cfg.shuffle_partitions)

    explode = (
        make_explode_documents(renderer) if renderer is not None else explode_documents
    )
    pages = ds.map_batches(explode, batch_format="pyarrow")
    if cfg.skew_repartition:
        # north-star skew handling: hash-partition page rows on a SALTED
        # serialized-byte-length bucket so each OCR actor batch is
        # size-homogeneous (stages/validate.byte_bucket_column).  Partition
        # id = bucket * spread + crc32(url) % spread: every partition holds
        # exactly one bucket (homogeneity) while each bucket fans out over
        # ``spread`` partitions (parallelism).  A range sort on the bucket
        # id would collapse to <= len(edges)+1 effective partitions (4
        # distinct key values) and pay sort sampling; the salted hash
        # exchange moves the same bytes with neither cost.  Output is keyed
        # (url, page_no), so the reorder is semantics-free.
        import pyarrow as _pa
        import pyarrow.compute as _pc

        from ..stages.partition import hash_mod
        from ..stages.validate import byte_bucket_column

        edges = tuple(cfg.skew_bucket_edges)
        n_buckets = len(edges) + 1
        spread = max(1, cfg.shuffle_partitions // n_buckets)

        def add_skew_part(batch):
            blen = _pc.cast(_pc.binary_length(batch["emission"]), _pa.int64())
            bucket = byte_bucket_column(blen, edges).to_numpy(
                zero_copy_only=False
            )
            salt = hash_mod(batch["url"].to_pylist(), spread)
            return batch.append_column(
                "_skew_part", _pa.array(bucket * spread + salt, _pa.int32())
            )

        def identity_partition(part: "_pa.Table") -> "_pa.Table":
            return part

        pages = (
            pages.map_batches(add_skew_part, batch_format="pyarrow")
            .groupby("_skew_part")
            .map_groups(identity_partition, batch_format="pyarrow")
            .drop_columns(["_skew_part"])
        )
    resources = {"num_cpus": 1}
    resources.update(engine_resources or {})
    pages = pages.map_batches(
        engine_cls or MockOcrEngine,
        fn_constructor_kwargs={"cfg": cfg, **(engine_kwargs or {})},
        batch_format="pyarrow",
        batch_size=cfg.ocr_batch_size,
        concurrency=(1, cfg.ocr_concurrency),
        **resources,
    )
    pages = pages.map_batches(make_postprocess_page_batch(cfg), batch_format="pyarrow")
    # merge: hash-partition page rows by url (groups co-located), then one
    # vectorized merge per partition — the map_groups(url) semantics (G1)
    # without a Python call per url
    pages = with_hash_partition(pages, "url", cfg.shuffle_partitions)
    return pages.groupby("_part").map_groups(merge_partition, batch_format="pyarrow")


def build_extract_pipeline_fused(ds, cfg: ExtractConfig = None, dedup: bool = True):
    """Single-shuffle variant: hash-partition raw doc rows by url once, then
    run dedup + the ENTIRE per-doc extraction inside one vectorized task per
    partition (``sources.golden.extract_document`` — the exact serial
    contract — applied doc-by-doc within the partition).

    Trade-off vs :func:`build_extract_pipeline`:
    - one all-to-all instead of two; no per-page Arrow struct round-trips
      (≈3-5x less CPU at equal output) — the preferred CPU-extraction path;
    - a document is processed by ONE task, so a pathological giant doc
      serializes within its partition (partition count and the byte-length
      bucketing bound this), and a GPU OCR engine cannot batch across docs.
      For GPU deployments use the page-exploded pipeline, which feeds an
      actor pool page rows.
    Both paths are byte-identical (tests/test_pipeline_e2e.py).
    """
    from ..sources.golden import extract_document, doc_to_row
    from ..sources.golden import EXTRACTED_SCHEMA as _SCHEMA

    cfg = cfg or ExtractConfig()
    ds = ds.map_batches(make_route_batch(cfg.max_payload_mb), batch_format="pyarrow")
    ds = with_hash_partition(ds, "url", cfg.shuffle_partitions)

    def process_partition(batch) -> "pa.Table":
        import pyarrow as pa

        from ..functions.winners import select_url_winners

        urls = batch["url"].to_pylist()
        tss = batch["warc_ts"].to_pylist()
        payloads = batch["html"].to_pylist()
        if dedup:
            best = select_url_winners(
                zip(urls, tss, payloads), cfg.max_payload_mb
            )
            rows_in = [(u, ts, p) for u, (ts, p) in sorted(best.items())]
        else:
            rows_in = list(zip(urls, tss, payloads))
        docs = []
        for u, ts, p in rows_in:
            doc = extract_document(u, ts.isoformat(), p, cfg)
            if doc is not None:
                docs.append(doc_to_row(doc))
        if not docs:
            return _SCHEMA.empty_table()
        return pa.Table.from_pylist(docs, schema=_SCHEMA)

    return ds.groupby("_part").map_groups(process_partition, batch_format="pyarrow")


def build_extract_pipeline_maponly(
    pages_path, cfg: ExtractConfig = None, dedup: bool = True
):
    """Shuffle-free flagship path: payloads NEVER move through an all-to-all.

    1. meta pass: read ONLY (url, warc_ts) — column-pruned, payload bytes
       stay in storage — and resolve duplicate-url winners with a tiny
       groupby (stages/dedup_meta.py);
    2. broadcast the winner map (``ray.put`` once, read per task);
    3. extraction pass: read full columns, route/validate, drop loser rows
       with the broadcast predicate, then extract each doc inline
       (``sources.golden.extract_document`` — the serial contract) in
       embarrassingly-parallel ``map_batches`` tasks.

    Linear scaling by construction: the only synchronisation is the tiny
    meta groupby.  Trade-offs: the input is read 1+epsilon times (meta pass
    reads 2 small columns; ties read a handful of payloads), and a giant
    doc serializes within its task (page-explode path covers that case).
    """
    import ray

    from ..sources.golden import EXTRACTED_SCHEMA as _SCHEMA
    from ..sources.golden import doc_to_row, extract_document
    from ..stages.dedup_meta import (
        compute_dup_winners_distributed,
        compute_dup_winners_local,
        make_winner_filter,
    )

    cfg = cfg or ExtractConfig()
    clone_rows = None
    winners = {}
    if dedup:
        # meta-only winner resolution (url/ts/byte-length, with the same
        # validation predicate as the route stage so an invalid earliest
        # crawl can't shadow a later valid one).  Strategy: driver-side
        # pandas below cfg.winners_local_max_rows (faster than any shuffle
        # at that size), Ray-groupby above it; "auto" decides from the
        # parquet footer row count (a metadata-only read).
        strategy = cfg.winners_strategy
        if strategy == "auto":
            # Row count is the only signal (metadata-only parquet-footer
            # read): below winners_local_max_rows the driver-side pandas
            # resolution is milliseconds and beats any exchange — a
            # controlled round-5 rerun (interleaved medians-of-3 at 32
            # CPUs, steady state) measured the local path 11.8 s vs
            # distributed 16.0 s end-to-end with far lower variance,
            # retiring round 4's CPU-count override (which rested on one
            # contended round-3 draw).  Above the row gate the driver scan
            # stops being tiny and the Ray groupby takes over.
            import pyarrow.dataset as pads

            n_rows = pads.dataset(pages_path, format="parquet").count_rows()
            strategy = (
                "local" if n_rows <= cfg.winners_local_max_rows else "distributed"
            )
        if strategy == "local":
            # per-shard Ray scan tasks project the byte-length validation
            # LOCALLY (payloads never enter the object store; a plain
            # read_parquet meta pass ships them through plasma and measures
            # slower than serial) + driver pandas resolution (milliseconds)
            from ..stages.dedup_meta import read_validated_meta_sharded

            meta = read_validated_meta_sharded(pages_path, cfg.max_payload_mb)
            winners, clone_rows = compute_dup_winners_local(
                pages_path,
                max_payload_mb=cfg.max_payload_mb,
                columns=["url", "warc_ts", "html", "lang"],
                meta=meta,
            )
        else:
            winners, clone_rows = compute_dup_winners_distributed(
                pages_path,
                max_payload_mb=cfg.max_payload_mb,
                columns=["url", "warc_ts", "html", "lang"],
            )

    read_kw = {}
    if cfg.read_blocks:
        read_kw["override_num_blocks"] = cfg.read_blocks
    ds = read_pages(pages_path, **read_kw)
    ds = ds.map_batches(make_route_batch(cfg.max_payload_mb), batch_format="pyarrow")
    if winners:
        from ..stages.dedup_meta import winners_to_arrays

        winners_ref = ray.put(winners_to_arrays(winners))
        ds = ds.map_batches(make_winner_filter(winners_ref), batch_format="pyarrow")
    if clone_rows is not None:
        # canonical rows for exact-clone urls rejoin AFTER the loser filter
        import ray.data as rd

        clones = rd.from_arrow(clone_rows).map_batches(
            make_route_batch(cfg.max_payload_mb), batch_format="pyarrow"
        )
        ds = ds.union(clones)

    def extract_batch(batch) -> "pa.Table":
        import pyarrow as pa

        docs = []
        for u, ts, p in zip(
            batch["url"].to_pylist(),
            batch["warc_ts"].to_pylist(),
            batch["html"].to_pylist(),
        ):
            doc = extract_document(u, ts.isoformat(), p, cfg)
            if doc is not None:
                docs.append(doc_to_row(doc))
        if not docs:
            return _SCHEMA.empty_table()
        return pa.Table.from_pylist(docs, schema=_SCHEMA)

    return ds.map_batches(extract_batch, batch_format="pyarrow")


def run_extract(pages_path, out_dir: Optional[str] = None, cfg: ExtractConfig = None):
    """read -> extract -> (optionally) write partitioned parquet; returns the
    lazy Dataset when out_dir is None."""
    ds = build_extract_pipeline(read_pages(pages_path), cfg)
    if out_dir is not None:
        ds.write_parquet(out_dir)
        return None
    return ds
