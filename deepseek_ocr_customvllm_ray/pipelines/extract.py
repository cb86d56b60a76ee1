"""Flagship extraction pipeline (SURVEY §3.3 dataflow, Ray-Data-first).

::

    read(pages parquet, columns pruned)          # S1
      -> map_batches(route/validate)             # S1 validation, %PDF routing
      -> groupby(url).map_groups(keep_earliest)  # dedup guard  [shuffle 1: url]
      -> map_batches(explode_documents)          # S2 page explode (skew break);
                                                 #   html docs = 1 logical page
      -> map_batches(MockOcrEngine, concurrency=N, batch_size=B)  # A1-A5 actor pool
      -> map_batches(postprocess)                # M9-M16 / Readability
      -> groupby(url).map_groups(merge)          # G1  [shuffle 2: url]
      -> (caller: write_parquet / lineage pass)

Scale notes (100 TB design):
- the read prunes to the 4 needed columns; row filters push to row groups;
- the dedup shuffle moves doc rows once, BEFORE page explosion multiplies
  data volume;
- page explode converts doc-size skew into uniform page-row units; the OCR
  actor pool's ``batch_size`` bounds per-task memory like ``max_num_seqs``;
- both shuffles key on ``url`` so the merge can reuse the dedup partitioning
  (same key, same hash);
- nothing materializes the full dataset — callers consume by writing or
  aggregating.
"""

from __future__ import annotations

from typing import Optional

from ..config import ExtractConfig
from ..stages.dedup_url import dedup_by_url
from ..stages.ocr_stage import (
    MockOcrEngine,
    explode_documents,
    make_postprocess_page_batch,
    merge_page_group,
)
from ..stages.validate import make_route_batch

INPUT_COLUMNS = ["url", "warc_ts", "html", "text", "lang"]


def read_pages(path, columns: Optional[list] = None, **kwargs):
    import ray.data as rd

    return rd.read_parquet(
        path, columns=columns or ["url", "warc_ts", "html", "lang"], **kwargs
    )


def build_extract_pipeline(ds, cfg: ExtractConfig = None, dedup: bool = True):
    """pages Dataset -> extracted-documents Dataset (EXTRACTED_SCHEMA).

    Single consumption of the routed/deduped stream: html docs ride the
    unified page-row schema (one logical page) so the pipeline never forks
    (a fork would re-execute the read + dedup shuffle once per branch).
    """
    cfg = cfg or ExtractConfig()

    ds = ds.map_batches(make_route_batch(cfg.max_payload_mb), batch_format="pyarrow")
    if dedup:
        ds = dedup_by_url(ds)

    pages = ds.map_batches(explode_documents, batch_format="pyarrow")
    pages = pages.map_batches(
        MockOcrEngine,
        fn_constructor_kwargs={"cfg": cfg},
        batch_format="pyarrow",
        batch_size=cfg.ocr_batch_size,
        concurrency=cfg.ocr_concurrency,
        num_cpus=1,
    )
    pages = pages.map_batches(make_postprocess_page_batch(cfg), batch_format="pyarrow")
    return pages.groupby("url").map_groups(merge_page_group, batch_format="pandas")


def run_extract(pages_path, out_dir: Optional[str] = None, cfg: ExtractConfig = None):
    """read -> extract -> (optionally) write partitioned parquet; returns the
    lazy Dataset when out_dir is None."""
    ds = build_extract_pipeline(read_pages(pages_path), cfg)
    if out_dir is not None:
        ds.write_parquet(out_dir)
        return None
    return ds
