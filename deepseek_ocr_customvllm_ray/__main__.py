"""CLI: ``python -m deepseek_ocr_customvllm_ray <command>``.

Commands
--------
extract   IN OUT [--pipeline maponly|fused|exploded] [--no-dedup]
          run the flagship extraction over a pages parquet file/dir and
          write the extracted-documents parquet.
resume    IN OUT [--shards N]
          resumable run with the checkpoint manifest (skips completed
          shards; cleans partial ones).
gen       OUT [--docs N] [--seed S] [--shards K]
          write a synthetic Common-Crawl-style pages corpus.
golden    IN OUT
          run the sequential golden driver (single process, no Ray).
query     NAME SF_DIR [-o OUT.parquet]
          run one named operator pipeline (the ``__ray_entry__.queries()``
          registry) over a directory of driver-schema parquet tables;
          print a head sample or write the full result.  ``query list``
          prints the registry.

This module OWNS its Ray session (guarded init; the driver-facing
``__ray_entry__`` never initializes Ray).
"""

from __future__ import annotations

import argparse
import sys


def _ray_session(num_cpus: int):
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    try:
        from ray.data import DataContext

        DataContext.get_current().enable_progress_bars = False
    except Exception:
        pass
    return ray


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="deepseek_ocr_customvllm_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p_ex = sub.add_parser("extract")
    p_ex.add_argument("input")
    p_ex.add_argument("output")
    p_ex.add_argument("--pipeline", choices=["maponly", "fused", "exploded"], default="maponly")
    p_ex.add_argument("--no-dedup", action="store_true")
    p_ex.add_argument("--num-cpus", type=int, default=8)

    p_rs = sub.add_parser("resume")
    p_rs.add_argument("input")
    p_rs.add_argument("output")
    p_rs.add_argument("--shards", type=int, default=16)
    p_rs.add_argument("--num-cpus", type=int, default=8)

    p_gen = sub.add_parser("gen")
    p_gen.add_argument("output")
    p_gen.add_argument("--docs", type=int, default=1000)
    p_gen.add_argument("--seed", type=int, default=42)
    p_gen.add_argument("--shards", type=int, default=1)

    p_go = sub.add_parser("golden")
    p_go.add_argument("input")
    p_go.add_argument("output")

    p_q = sub.add_parser("query")
    p_q.add_argument("name")
    p_q.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.01")
    p_q.add_argument("-o", "--output", default=None)
    p_q.add_argument("--num-cpus", type=int, default=8)

    args = ap.parse_args(argv)

    if args.cmd == "gen":
        from .sources.corpus import write_corpus, write_corpus_sharded

        if args.shards > 1:
            n = write_corpus_sharded(args.output, n_shards=args.shards, n_docs=args.docs, seed=args.seed)
        else:
            n = write_corpus(args.output, n_docs=args.docs, seed=args.seed).num_rows
        print(f"wrote {n} pages to {args.output}")
        return 0

    if args.cmd == "golden":
        import pyarrow.parquet as pq

        from .sources.golden import run_golden

        table = pq.read_table(args.input)
        out = run_golden(table)
        pq.write_table(out, args.output)
        print(f"extracted {out.num_rows} documents -> {args.output}")
        return 0

    if args.cmd == "query" and args.name == "list":
        from .pipelines import queries as qmod

        print("\n".join(sorted(n[2:] for n in dir(qmod) if n.startswith("q_"))))
        return 0

    ray = _ray_session(args.num_cpus)
    try:
        if args.cmd == "extract":
            from .config import ExtractConfig
            from .pipelines.extract import (
                build_extract_pipeline,
                build_extract_pipeline_fused,
                build_extract_pipeline_maponly,
                read_pages,
            )

            cfg = ExtractConfig()
            dedup = not args.no_dedup
            if args.pipeline == "maponly":
                ds = build_extract_pipeline_maponly(args.input, cfg, dedup=dedup)
            elif args.pipeline == "fused":
                ds = build_extract_pipeline_fused(read_pages(args.input), cfg, dedup=dedup)
            else:
                ds = build_extract_pipeline(read_pages(args.input), cfg, dedup=dedup)
            ds.write_parquet(args.output)
            print(f"extracted -> {args.output}")
        elif args.cmd == "resume":
            from .pipelines.resumable import run_resumable

            res = run_resumable(args.input, args.output, n_shards=args.shards)
            print(
                f"completed_before={res['completed_before']} "
                f"processed={res['processed']} removed_partial={res['removed_partial']}"
            )
        elif args.cmd == "query":
            from .pipelines import queries as qmod

            registry = {
                name[2:]: getattr(qmod, name)
                for name in dir(qmod)
                if name.startswith("q_")
            }
            if args.name not in registry:
                print(f"unknown query {args.name!r}; try 'query list'")
                return 2
            else:
                res = registry[args.name](args.sf_dir)
                df = res.to_pandas() if hasattr(res, "to_pandas") else res
                if args.output:
                    import pyarrow as pa
                    import pyarrow.parquet as pq

                    pq.write_table(
                        pa.Table.from_pandas(df, preserve_index=False),
                        args.output,
                    )
                    print(f"{len(df)} rows -> {args.output}")
                else:
                    print(df.head(20).to_string())
                    print(f"[{len(df)} rows]")
    finally:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
