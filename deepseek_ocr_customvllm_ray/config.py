"""Pipeline configuration.

Mirrors the observable knobs of the reference's ``app/config.py`` (constants
cited per field) without any serving/MinIO/DB settings.  Everything is a plain
dataclass so stages can be constructed with explicit config and remain
picklable for Ray.
"""

from __future__ import annotations

from dataclasses import dataclass, field


# Reference: app/config.py:58-60 & app/services/ocr_service.py:99 — 40-page GPU
# rounds.  In the Ray engine chunking is subsumed by block/batch sizing; this
# constant survives only as the default OCR-actor batch size.
DEFAULT_OCR_BATCH_SIZE = 40

# Reference: app/config.py:17 / app/core/model_init.py:31 — vLLM max_num_seqs.
DEFAULT_MAX_CONCURRENCY = 32

# Reference: app/config.py:20 — empty pages are dropped from clean markdown.
DEFAULT_SKIP_REPEAT = True

# Reference: process/ngram_norepeat.py wiring at app/core/model_init.py:44-48.
NGRAM_SIZE = 20
NGRAM_WINDOW = 50
# Whitelisted "tokens": the reference whitelists vocab ids {128821,128822}
# (<td>, </td>); the mock decode operates on word tokens, so the whitelist is
# the literal strings.
NGRAM_WHITELIST = frozenset({"<td>", "</td>"})

# Reference: app/config.py:57 — 200 MB upload cap.
MAX_PAYLOAD_MB = 200

# Page-split marker, byte-exact (ocr_service.py:125).
PAGE_SPLIT_MARKER = "\n\n<--- Page Split --->\n\n"

# End-of-sentence terminator emitted by the model (postprocess_md.py:34).
EOS_TOKEN = "<｜end▁of▁sentence｜>"

# Clean-markdown page marker (postprocess_md.py:285).
PAGE_MARKER = "\n\n\n\n"


@dataclass(frozen=True)
class ExtractConfig:
    """Knobs for the extraction pipeline."""

    skip_repeat: bool = DEFAULT_SKIP_REPEAT
    # decode-time n-gram suppression (A4); disable for oracle-checkable runs
    # where the emission must pass through verbatim
    ngram_suppress: bool = True
    ocr_batch_size: int = DEFAULT_OCR_BATCH_SIZE
    ocr_concurrency: int = 8          # actor pool MAX size for the OCR stage
    # hash partitions for the url shuffles; scale with cluster size (rule of
    # thumb: ~2x total cores, and at 100 TB enough that one partition's pages
    # fit a worker heap)
    shuffle_partitions: int = 32
    # read granularity: None = Ray's default block splitting; set to
    # ~8-16x total cores for tight task packing on small-file inputs
    read_blocks: int = None
    ngram_size: int = NGRAM_SIZE
    ngram_window: int = NGRAM_WINDOW
    ngram_whitelist: frozenset = field(default_factory=lambda: NGRAM_WHITELIST)
    max_payload_mb: int = MAX_PAYLOAD_MB
    # Byte-length skew bucketing before the OCR stage (SURVEY §4 "Skew"):
    # when enabled, page rows hash-partition on their (salted) emission
    # byte-length bucket so every OCR actor batch holds similarly-sized
    # pages —
    # batch_size x bucket_max bounds per-batch bytes (the vLLM
    # max_num_seqs memory analog).  Costs one page-row all-to-all, so it
    # is OFF for the CPU mock (page explode already equalizes work) and
    # ON for real-image GPU deployments where a batch mixing a 10 MB scan
    # with thumbnails over-commits the actor's heap.
    skew_repartition: bool = False
    skew_bucket_edges: tuple = (4_096, 65_536, 1_048_576)
    # Duplicate-url winner resolution for the map-only pipeline:
    # "local"       — driver-side pandas over the (url, ts, byte-length)
    #                 meta view; fastest below ~10^7 rows;
    # "distributed" — Ray groupby over the same meta view (no driver
    #                 materialization of per-row meta);
    # "auto"        — pick by the parquet footer row count; crossover at
    #                 ~10^7 rows (driver pandas resolution is milliseconds
    #                 at that size; the sharded meta scan parallelizes the
    #                 payload-length read either way).
    winners_strategy: str = "auto"
    winners_local_max_rows: int = 10_000_000
    # Row count is the ONLY "auto" signal.  Round 4's CPU-count override
    # (distributed whenever >= 16 CPUs) was motivated by one contended
    # round-3 draw; a controlled round-5 rerun (interleaved medians-of-3,
    # 32 CPUs, steady state) measured local 11.8 s vs distributed 16.0 s
    # with far lower variance, so the override is gone.  Above
    # winners_local_max_rows the driver-side resolution stops being
    # milliseconds and "auto" switches to the distributed groupby.
    # Dedup exchange for the page-exploded/fused pipelines:
    # "broadcast" — meta-only winner resolution over the validated stream +
    #               broadcast filter; payload rows never cross an all-to-all
    #               (the upstream read+route executes twice: once for the
    #               thin meta view, once for the filter pass — measured far
    #               cheaper than sorting payload bytes);
    # "shuffle"   — hash-partition payload rows by url, partition-local
    #               keep-earliest; ONE pass over the input, for upstreams
    #               too expensive to recompute.
    page_dedup_strategy: str = "broadcast"
