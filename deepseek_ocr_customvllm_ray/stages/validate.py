"""Input validation + routing stage (stateless ``map_batches``).

The analog of the reference's upload validation — extension check and
``MAX_UPLOAD_MB`` size cap (app/api/routes/ocr.py:33-43, app/config.py:57) —
re-expressed as a vectorized Arrow batch predicate:

- payload magic ``%PDF`` -> ``doc_kind="pdf"``, else ``"html"``;
- empty payloads and payloads over the size cap are dropped (the reference
  rejects the upload with HTTP 400/413);
- adds ``byte_len`` (skew bucketing / lineage input) and ``url_host``
  (the lineage partition key) columns.

Zero-copy where possible: predicates via pyarrow.compute over the binary
column's byte lengths; only the host parse is per-row Python (cheap, bounded
by url length).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _hosts_of(urls) -> pa.Array:
    # url -> netloc via the ONE shared parser (state/manifest.host_of_url)
    from ..state.manifest import host_of_url

    out = []
    for u in urls:
        s = u.as_py() if hasattr(u, "as_py") else u
        out.append("" if s is None else host_of_url(s))
    return pa.array(out, pa.string())


def make_route_batch(max_payload_mb: int):
    """Returns the map_batches callable (closure over the size cap)."""
    cap = max_payload_mb * 1024 * 1024

    def route_batch(batch: pa.Table) -> pa.Table:
        byte_len = pc.binary_length(batch["html"]).cast(pa.int64())
        keep = pc.and_(pc.greater(byte_len, 0), pc.less_equal(byte_len, cap))
        # rows with null url / warc_ts are unprocessable (no key, no
        # deterministic timestamp) — reject like the reference rejects a
        # malformed upload
        keep = pc.and_(keep, pc.is_valid(batch["url"]))
        keep = pc.and_(keep, pc.is_valid(batch["warc_ts"]))
        batch = batch.append_column("byte_len", byte_len).filter(keep)
        if batch.num_rows == 0:
            return batch.append_column(
                "doc_kind", pa.array([], pa.string())
            ).append_column("url_host", pa.array([], pa.string()))
        # %PDF magic routing — vectorized prefix compare
        prefixes = pc.binary_slice(batch["html"], 0, 4)
        is_pdf = pc.equal(prefixes, pa.scalar(b"%PDF", pa.binary()))
        kind = pc.if_else(is_pdf, "pdf", "html")
        batch = batch.append_column("doc_kind", kind)
        batch = batch.append_column("url_host", _hosts_of(batch["url"]))
        return batch

    return route_batch


def byte_bucket_column(byte_len: pa.ChunkedArray, edges) -> pa.Array:
    """Bucket index per row for skew-aware partitioning (SURVEY §4 Skew):
    bucket i = count of edges <= byte_len (so a value exactly on an edge
    belongs to the bucket ABOVE it)."""
    arr = byte_len.to_numpy(zero_copy_only=False)
    return pa.array(np.searchsorted(np.asarray(edges), arr, side="right"), pa.int32())
