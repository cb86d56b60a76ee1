"""Exact URL dedup guard — hash-partition + per-group earliest
(SURVEY §2.8: the per-row invariant is keyed on url, so duplicate crawls of
the same url must collapse to one deterministic winner BEFORE extraction).

Winner = min (warc_ts, sha1(payload)): earliest crawl wins; byte-hash
tie-break makes the choice independent of block arrival order under the
streaming executor.  The groupby is a shuffle keyed on url — at 100 TB this
is the cheap shuffle (doc-level rows, payload moves once, before any page
explosion multiplies rows).
"""

from __future__ import annotations

import hashlib

import pandas as pd


def keep_earliest(group: pd.DataFrame) -> pd.DataFrame:
    if len(group) == 1:
        return group
    keys = [
        (ts, hashlib.sha1(payload).hexdigest())
        for ts, payload in zip(group["warc_ts"], group["html"])
    ]
    best = min(range(len(keys)), key=keys.__getitem__)
    return group.iloc[[best]]


def dedup_by_url(ds):
    """``Dataset -> Dataset`` with one row per url."""
    return ds.groupby("url").map_groups(keep_earliest, batch_format="pandas")
