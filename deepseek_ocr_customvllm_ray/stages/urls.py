"""URL canonicalization and per-domain corpus shaping.

Web-pipeline operators above the extraction layer: parse/normalize page
URLs (the join key of the whole engine — reference contract keys every
record by ``url``, `app/services/task_service.py` / SURVEY §2.6) and cap
the number of documents any one registered domain contributes to a crawl
snapshot (domain quotas — the standard defense against template farms and
crawler traps dominating a training corpus).

Both operators are fully vectorized:

* :func:`make_url_parse_batch` is map-only — one RE2 ``extract_regex``
  pass splits scheme/hostport/path, host casefold + port strip + a
  public-suffix-aware registered-domain regex all run as Arrow kernels;
  no Python touches a row.
* :func:`domain_quota` is the only shuffling op: ONE hash-partitioned
  exchange on the domain column co-locates each domain, then a
  per-partition ``lexsort`` + group-boundary subtraction ranks rows
  inside every domain at numpy speed (no per-group dispatch).  Ships
  whatever columns the caller kept — project before quota-ing if the
  payload is heavy.

Registered-domain extraction uses a deliberately small embedded
public-suffix sample (the full PSL is a data file, not an algorithm); the
regex alternation is the documented extension point.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .partition import with_hash_partition

__all__ = ["make_url_parse_batch", "domain_quota", "REGISTERED_DOMAIN_PATTERN"]

#: two-label default, three labels for common second-level public suffixes
REGISTERED_DOMAIN_PATTERN = (
    r"(?P<rd>[^.]+\.(?:co\.uk|ac\.uk|gov\.uk|com\.au|co\.jp|com\.br)|[^.]+\.[^.]+)$"
)

_URL_PATTERN = r"^(?P<scheme>https?)://(?P<hostport>[^/?#]+)(?P<path>/[^?#]*)?"


def make_url_parse_batch(url_col: str, id_col: str):
    """``map_batches`` fn: URL → normalized components + canonical form.

    Output columns ``(id, url, host, registered_domain, path,
    canonical_url)``:

    * ``host`` — lowercased, ``:port`` stripped;
    * ``registered_domain`` — last two host labels (three for the embedded
      public-suffix sample, see :data:`REGISTERED_DOMAIN_PATTERN`);
    * ``path`` — up to but excluding any ``?query``/``#fragment``;
      missing → ``"/"``;
    * ``canonical_url`` — ``https://`` + host without a leading ``www.``
      + path: scheme-insensitive, query/fragment-free (the usual web-crawl
      URL-dedup key).

    Rows whose URL does not match ``https?://host...`` are dropped (the
    reference pipeline only ever sees http(s) page records).
    """

    def fn(batch: pa.Table) -> pa.Table:
        urls = batch[url_col]
        parts = pc.extract_regex(urls, _URL_PATTERN)
        ok = pc.fill_null(pc.is_valid(parts), False)
        batch = batch.filter(ok)
        parts_ok = parts.filter(ok) if isinstance(parts, pa.ChunkedArray) else parts.filter(ok)
        if isinstance(parts_ok, pa.ChunkedArray):
            parts_ok = parts_ok.combine_chunks()
        hostport = pc.utf8_lower(parts_ok.field("hostport"))
        host = pc.replace_substring_regex(hostport, pattern=r":\d+$", replacement="")
        # an absent optional group comes back as "" (not null) from the
        # Arrow kernel — both spell "no path segment"
        raw_path = pc.fill_null(parts_ok.field("path"), "")
        path = pc.if_else(pc.equal(raw_path, ""), pa.scalar("/"), raw_path)
        rd = pc.extract_regex(host, REGISTERED_DOMAIN_PATTERN)
        if isinstance(rd, pa.ChunkedArray):
            rd = rd.combine_chunks()
        # hosts with a single label (e.g. "localhost") don't match: keep
        # the host itself as its own registered domain.  Mask on the
        # PARENT struct's validity — .field() of a null struct slot is an
        # undefined child value ("" here), not null.
        registered = pc.if_else(pc.is_valid(rd), rd.field("rd"), host)
        canonical = pc.binary_join_element_wise(
            "https://",
            pc.replace_substring_regex(host, pattern=r"^www\.", replacement=""),
            path,
            "",
        )
        return pa.table({
            id_col: batch[id_col].cast(pa.int64()),
            url_col: batch[url_col],
            "host": host,
            "registered_domain": registered,
            "path": path,
            "canonical_url": canonical,
        })

    return fn


def domain_quota(ds, domain_col: str, id_col: str, k: int, num_partitions: int = 32):
    """Keep at most ``k`` rows per domain, lowest ``id_col`` first.

    SQL equivalent: ``QUALIFY row_number() OVER (PARTITION BY domain
    ORDER BY id) <= k``.  One hash-partitioned exchange on the domain;
    per-partition rank is a vectorized lexsort + group-boundary prefix
    subtraction (no per-group Python dispatch).  All input columns pass
    through unchanged.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    parts = with_hash_partition(ds, domain_col, num_partitions)

    def cap(batch: pa.Table) -> pa.Table:
        # pyarrow kernel: every input column passes through (a crawl table
        # may carry the html payload), so winners move via one Arrow
        # ``take`` instead of a pandas object pivot
        batch = batch.drop_columns(["_part"])
        if not batch.num_rows:
            return batch
        dom = batch[domain_col].to_numpy(zero_copy_only=False)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, dom))
        dom_s = dom[order]
        new_group = np.empty(len(dom_s), dtype=bool)
        new_group[0] = True
        new_group[1:] = dom_s[1:] != dom_s[:-1]
        group_start = np.maximum.accumulate(
            np.where(new_group, np.arange(len(dom_s)), 0)
        )
        rank = np.arange(len(dom_s)) - group_start
        keep_sorted = order[rank < k]
        return batch.take(pa.array(np.sort(keep_sorted), pa.int64()))

    return parts.groupby("_part").map_groups(cap, batch_format="pyarrow")
