"""Checkpoint manifest for exact resume (north_rule requirement).

The reference has NO checkpointing — a failed job deletes its input and is
unrecoverable (ocr_service.py:206-213).  The Ray engine replaces that with a
resumable output layout:

- output parquet is hive-partitioned by ``shard_id`` (= crc32(url_host) %
  n_shards): one directory per shard, so completed work is addressable;
- after a shard's rows are fully written, a manifest record
  ``{shard_id, n_docs, n_pages, total_md_bytes, content_hash}`` is written
  ATOMICALLY (temp file + rename) to ``{out}/_manifest/shard={id}.json``;
- resume = read the manifest, DELETE partial shard dirs that lack a manifest
  record (they may hold incomplete files from the crashed run), and filter
  the input to missing shards only — an anti-join via a broadcast
  completed-shard set inside ``map_batches``.

``content_hash`` is the XOR of per-doc 63-bit hashes of (url, markdown) —
order-insensitive, so a resumed run and a cold run produce the same hash
regardless of block scheduling.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import zlib
from typing import Dict, List, Set

MANIFEST_DIR = "_manifest"


def shard_of_host(host: str, n_shards: int) -> int:
    return zlib.crc32(host.encode("utf-8")) % n_shards


def host_of_url(url: str) -> str:
    """netloc of a url (shared by routing, lineage, and shard assignment —
    keep ONE implementation so manifest shard ids can never drift from
    input-side shard filtering)."""
    i = url.find("://")
    rest = url[i + 3:] if i >= 0 else url
    j = rest.find("/")
    return rest if j < 0 else rest[:j]


def doc_hash63(url: str, markdown: str) -> int:
    d = hashlib.sha1()
    d.update(url.encode("utf-8"))
    d.update(b"\x00")
    d.update(markdown.encode("utf-8"))
    return int.from_bytes(d.digest()[:8], "big") >> 1


def manifest_path(out_dir: str, shard_id: int) -> str:
    return os.path.join(out_dir, MANIFEST_DIR, f"shard={shard_id}.json")


def read_manifest(out_dir: str) -> Dict[int, dict]:
    mdir = os.path.join(out_dir, MANIFEST_DIR)
    out: Dict[int, dict] = {}
    if not os.path.isdir(mdir):
        return out
    for name in os.listdir(mdir):
        if not name.startswith("shard=") or not name.endswith(".json"):
            continue
        try:
            with open(os.path.join(mdir, name), "r", encoding="utf-8") as f:
                rec = json.load(f)
            out[int(rec["shard_id"])] = rec
        except Exception:
            continue  # torn write of the manifest itself -> treat as missing
    return out


def write_manifest_record(out_dir: str, rec: dict) -> None:
    """Atomic: write temp then rename (same filesystem)."""
    mdir = os.path.join(out_dir, MANIFEST_DIR)
    os.makedirs(mdir, exist_ok=True)
    final = manifest_path(out_dir, int(rec["shard_id"]))
    tmp = final + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(rec, f, ensure_ascii=False, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, final)


def clean_partial_shards(out_dir: str, completed: Set[int]) -> List[int]:
    """Delete shard dirs that have no manifest record (partial writes from a
    crashed run).  Returns the removed shard ids."""
    removed = []
    if not os.path.isdir(out_dir):
        return removed
    for name in os.listdir(out_dir):
        if not name.startswith("shard_id="):
            continue
        try:
            sid = int(name.split("=", 1)[1])
        except ValueError:
            continue  # stray non-numeric partition dir — leave it alone
        if sid not in completed:
            shutil.rmtree(os.path.join(out_dir, name), ignore_errors=True)
            removed.append(sid)
    return removed
