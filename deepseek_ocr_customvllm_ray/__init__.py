"""Ray-Data-native document extraction engine.

A from-scratch rebuild of the data-processing capabilities of the reference
DeepSeek-OCR serving stack (`/root/reference`) as batch `ray.data.Dataset`
pipelines over Parquet tables of Common-Crawl-style web pages.

Layout:
- ``functions/``  pure, deterministic per-record transforms (the byte-identity
  surface of the reference string pipeline, plus hashing / text-analysis
  kernels).
- ``sources/``    readers + the seeded synthetic corpus generator.
- ``stages/``     Ray Data stages (map_batches callables, actor classes).
- ``pipelines/``  end-to-end wiring (read -> extract -> merge -> write).
- ``state/``      checkpoint manifest for exact resume.

Nothing in this package calls ``ray.init`` / ``ray.shutdown``; sessions are
owned by bench.py / CLI entry points / the test fixture.
"""

__version__ = "0.1.0"
