"""THE url-dedup winner rule, stated once.

Winner per url = the row with min ``(warc_ts, sha1(payload))`` among rows
that pass validation (non-empty payload, under the size cap, non-null
url/ts).  Validation precedes dedup (reference-faithful: a rejected upload
never enters the job store), so an invalid earliest crawl cannot shadow a
later valid one.

Callers: the golden sequential driver, the fused pipeline's per-partition
dedup, and (semantically) the metadata-only resolution in
``stages/dedup_meta.py`` — a single definition so the byte-identity
guarantee between paths cannot drift.
"""

from __future__ import annotations

import hashlib
from typing import Dict, Iterable, Tuple


def select_url_winners(
    rows: Iterable[Tuple[str, object, bytes]], max_payload_mb: int
) -> Dict[str, Tuple[object, bytes]]:
    """rows: iterable of (url, warc_ts, payload) -> {url: (ts, payload)}."""
    cap = max_payload_mb * 1024 * 1024
    best: Dict[str, tuple] = {}
    for url, ts, payload in rows:
        if not payload or len(payload) > cap or url is None or ts is None:
            continue
        key = (ts, hashlib.sha1(payload).hexdigest())
        if url not in best or key < best[url][0]:
            best[url] = (key, ts, payload)
    return {u: (ts, p) for u, (_, ts, p) in best.items()}
