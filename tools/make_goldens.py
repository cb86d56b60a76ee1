"""Generate golden-snapshot parquet for the deterministic rows-only queries.

The driver's correctness gate compares queries() output against oracle_sql()
via DuckDB at sf0.01.  Hashing/heuristic operators (simhash, langid,
fingerprints, MinHash clusters, IVF knn, n-gram Jaccard) are deterministic
pure functions of the input but not SQL-expressible, so their oracles are
pinned snapshots: this tool runs each query at sf0.01 and writes
``golden/<name>.parquet``; the oracle SQL is then
``SELECT * FROM read_parquet('/root/repo/golden/<name>.parquet')``.

Regenerate (ONLY after an intentional semantic change, with the pytest
parity suite green) with::

    python tools/make_goldens.py [sf_dir]

Each pinned query is parallelism-invariant (per-row maps, or label
propagation whose fixpoint is independent of execution order; the IVF
k-means sample is a deterministic file-order head read), so a snapshot
taken at one num_cpus is valid at any other.
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLDEN_QUERIES = [
    "minhash_clusters",
    "simhash_signatures",
    "simhash_pairs",
    "langid_heuristic",
    "doc_fingerprints",
    "knn_ivf",
    "ngram_jaccard_pairs",
    "bpe_token_counts",
    "audio_pipeline",
    "video_pipeline",
    "image_pipeline",
    "embedding_near_dups",
    "approx_distinct_texts",
    "pack_sequences",
    "approx_char_quantiles",
    "snapshot_near_dedup",
    "kmeans_clusters",
    "semantic_dedup",
    "layout_pdf",
    "augment_fingerprints",
    "dsir_select",
    "host_pagerank",
    "compression_ratio",
]

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "golden")


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import pandas as pd

    import __ray_entry__ as entrymod

    only = set(sys.argv[2:])
    queries = entrymod.queries()
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name in GOLDEN_QUERIES:
        if only and name not in only:
            continue
        res = queries[name](sf_dir)
        if isinstance(res, pd.DataFrame):
            table = pa.Table.from_pandas(res, preserve_index=False)
        elif isinstance(res, pa.Table):
            table = res
        else:  # ray Dataset
            table = pa.Table.from_pandas(res.to_pandas(), preserve_index=False)
        out = os.path.join(GOLDEN_DIR, f"{name}.parquet")
        pq.write_table(table, out)
        print(f"wrote {out}: {table.num_rows} rows, schema {table.schema.names}")
    ray.shutdown()


if __name__ == "__main__":
    main()
