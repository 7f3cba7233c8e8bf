"""Deterministic document identity.

The reference mints docIDs with a Postgres ``SERIAL`` (init_db.sql:3) —
assignment order depends on crawl arrival order. A distributed build
must instead derive IDs purely from content so that runs at any
parallelism (and resumed runs) produce the identical index
(SURVEY §7.5 hard part 5). Scheme:

    bucket  = crc32(url) % num_buckets          # content-determined shard
    rank    = index of url in the sorted unique urls of its bucket
    doc_id  = (bucket << DOC_BUCKET_BITS) | rank

Properties relied on downstream:
  * doc_ids are unique and strictly increasing with (bucket, url-order)
  * all doc_ids of bucket b live in one contiguous range
    [b << BITS, (b+1) << BITS), so per-bucket posting runs concatenate
    in bucket order into globally docID-sorted lists with NO re-sort at
    merge time — the groupby(term) merge only decodes, concatenates and
    re-encodes (pipelines/build.py).
  * 2**DOC_BUCKET_BITS = ~1.1e12 docs per bucket max; with >=1M buckets
    this comfortably covers the 10^12-doc target while keeping
    per-bucket state small.
"""

from __future__ import annotations

import zlib

import numpy as np

DOC_BUCKET_BITS = 40


def url_bucket(url: str, num_buckets: int) -> int:
    return zlib.crc32(url.encode("utf-8")) % num_buckets


def url_buckets(urls, num_buckets: int) -> np.ndarray:
    """Vectorized-enough bucket assignment (crc32 is C-speed per call)."""
    crc = zlib.crc32
    return np.fromiter(
        (crc(u.encode("utf-8")) % num_buckets for u in urls),
        dtype=np.int32,
        count=len(urls),
    )


def doc_id_base(bucket: int) -> int:
    return bucket << DOC_BUCKET_BITS


def doc_bucket(doc_id: int) -> int:
    return doc_id >> DOC_BUCKET_BITS
