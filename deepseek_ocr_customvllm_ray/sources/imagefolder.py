"""S3: sorted image-folder reader feeding the batch-CLI path (K7).

The reference batch CLI globs ``INPUT_PATH/*`` for image extensions,
SORTED, and emits one ``.md`` per image stem (``Scripts/run_batch.py:
99-118`` read, ``:133-146`` write).  Ray-native re-expression:

- ``ray.data.read_binary_files(..., include_paths=True)`` over the folder;
- extension filter + LEXICOGRAPHIC rank carried as an explicit ``order``
  column — the contract is deterministic work-unit ordering, and under a
  streaming executor block order is not ordering, so the rank rides the
  row (SURVEY §2.7);
- ``stem`` column for the stem-matched per-image output files.

Decode: the sandbox has no PIL, so the OCR step treats the file bytes as
the page emission (the ``SyntheticPdfRenderer`` stand-in pattern); a real
deployment decodes with PIL and feeds the vLLM engine — the reader,
ordering, and writer contracts are identical either way.
"""

from __future__ import annotations

import os
from typing import Optional

import pyarrow as pa

# Reference extension set (run_batch.py:101), matched case-insensitively.
IMAGE_EXTENSIONS = (".png", ".jpg", ".jpeg", ".bmp", ".tif", ".tiff", ".webp")


def read_image_folder(path: str, extensions=IMAGE_EXTENSIONS):
    """Folder -> Dataset[(order, stem, path, data)] of image files in
    lexicographic path order (``order`` = rank in the sorted listing).

    Non-image files are excluded BEFORE the read (file-level pruning: the
    driver lists names only; payload bytes of excluded files never leave
    storage).  Raises if no image files match, like the reference CLI.
    """
    import ray.data as rd

    exts = tuple(e.lower() for e in extensions)
    names = sorted(
        f for f in os.listdir(path)
        if os.path.isfile(os.path.join(path, f)) and f.lower().endswith(exts)
    )
    if not names:
        raise FileNotFoundError(f"no image files ({', '.join(exts)}) in {path}")
    rank = {os.path.join(path, f): i for i, f in enumerate(names)}

    ds = rd.read_binary_files(sorted(rank), include_paths=True)

    def annotate(batch: pa.Table) -> pa.Table:
        paths = batch["path"].to_pylist()
        return pa.table({
            "order": pa.array(
                [rank[os.path.join(path, os.path.basename(p))] for p in paths],
                pa.int64(),
            ),
            "stem": pa.array(
                [os.path.splitext(os.path.basename(p))[0] for p in paths],
                pa.string(),
            ),
            "path": batch["path"],
            "data": batch["bytes"],
        })

    return ds.map_batches(annotate, batch_format="pyarrow")


def batch_cli_markdown(images_ds, decode=None):
    """Image rows -> Dataset[(order, stem, markdown)]: the per-image clean
    contract (M17 + tag strip, ``functions.mdtext.batch_cli_clean``) over
    each image's OCR emission.

    ``decode``: ``bytes -> str`` raw-emission hook.  Default = utf-8 decode
    of the file bytes (the sandbox mock-engine contract); a GPU deployment
    passes a closure that rasterizes + runs the vLLM engine.
    """
    from ..functions.mdtext import batch_cli_clean

    def fn(batch: pa.Table) -> pa.Table:
        raws = [
            decode(b) if decode is not None
            else (b or b"").decode("utf-8", errors="replace")
            for b in batch["data"].to_pylist()
        ]
        return pa.table({
            "order": batch["order"],
            "stem": batch["stem"],
            "markdown": pa.array(
                [batch_cli_clean(r) for r in raws], pa.large_string()
            ),
        })

    return images_ds.map_batches(fn, batch_format="pyarrow")


def write_per_image_md(md_ds, out_dir: str) -> int:
    """K7 writer: one ``{stem}.md`` per image (stem-matched, like
    run_batch.py:133-146).  Small-corpus CLI artifact — each task writes
    its batch's files; returns the count of files on disk.

    Images differing only by extension share a stem; the reference's
    serial loop writes them in sorted order so the LAST one wins.  Under
    parallel tasks that would be a race, so the winner (max ``order``
    per stem) is resolved first on a thin (stem, order) projection and
    only winning rows write — deterministic on any cluster shape."""
    os.makedirs(out_dir, exist_ok=True)

    winners = (
        md_ds.select_columns(["stem", "order"])
        .to_pandas()
        .groupby("stem")["order"]
        .max()
        .to_dict()
    )

    def write_batch(batch: pa.Table) -> pa.Table:
        n = 0
        for stem, order, md in zip(
            batch["stem"].to_pylist(),
            batch["order"].to_pylist(),
            batch["markdown"].to_pylist(),
        ):
            if winners.get(stem) != order:
                continue  # an extension-sibling later in sort order wins
            with open(os.path.join(out_dir, f"{stem}.md"), "w") as f:
                f.write(md)
            n += 1
        return pa.table({"n": pa.array([n], pa.int64())})

    counts = md_ds.map_batches(write_batch, batch_format="pyarrow")
    return sum(r["n"] for r in counts.take_all())
