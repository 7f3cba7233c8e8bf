"""Deliberately naive single-process oracle for the fulltext engine
(SURVEY §5.2): dict-of-lists inverted index + textbook BM25 + full sort.

Independence: this module reimplements dedup, docID assignment, index
construction, stats and scoring from the written spec (SURVEY §7.6,
functions/ids.py docstring) WITHOUT importing any pipelines/stages/codec
code. It shares only the row-level tokenizer kernel, whose semantics
are pinned separately by golden-table unit tests — sharing it keeps the
oracle about the DISTRIBUTED computation, not about Porter's algorithm.
"""

from __future__ import annotations

import math
import zlib
from collections import Counter

from rse_ray.functions.tokenizer import tokenize

K1 = 1.2
B = 0.75
BUCKET_BITS = 40


class OracleIndex:
    def __init__(self, rows: list[dict], num_buckets: int, stem: bool = True):
        """rows: dicts with url, warc_ts, text (pre-extraction golden)."""
        self.stem = stem
        # D1 dedup: keep max warc_ts per url (last-writer-wins upsert)
        best: dict[str, dict] = {}
        for r in rows:
            cur = best.get(r["url"])
            if cur is None or r["warc_ts"] > cur["warc_ts"]:
                best[r["url"]] = r
        # docID spec: bucket = crc32(url) % B; rank within sorted bucket
        buckets: dict[int, list[str]] = {}
        for url in best:
            b = zlib.crc32(url.encode("utf-8")) % num_buckets
            buckets.setdefault(b, []).append(url)
        self.doc_ids: dict[str, int] = {}
        for b, urls in buckets.items():
            for rank, url in enumerate(sorted(urls)):
                self.doc_ids[url] = (b << BUCKET_BITS) | rank
        # naive inverted index
        self.postings: dict[str, dict[int, int]] = {}
        self.doc_len: dict[int, int] = {}
        self.url_of: dict[int, str] = {}
        for url, r in best.items():
            did = self.doc_ids[url]
            self.url_of[did] = url
            toks = tokenize(r["text"], stem=stem)
            self.doc_len[did] = len(toks)
            for t, c in Counter(toks).items():
                self.postings.setdefault(t, {})[did] = c
        self.N = len(best)
        self.avgdl = sum(self.doc_len.values()) / self.N if self.N else 0.0

    def df(self, term: str) -> int:
        return len(self.postings.get(term, ()))

    def search(self, query: str, k: int = 10) -> list[tuple[int, float]]:
        qtf = Counter(tokenize(query, stem=self.stem))
        scores: dict[int, float] = {}
        for term in sorted(qtf):  # fixed accumulation order (fp determinism)
            plist = self.postings.get(term)
            if not plist:
                continue
            df = len(plist)
            idf = math.log(1 + (self.N - df + 0.5) / (df + 0.5))
            w = qtf[term] * idf
            for did, tf in plist.items():
                dl = self.doc_len[did]
                tf_part = (tf * (K1 + 1)) / (tf + K1 * (1 - B + B * dl / self.avgdl))
                scores[did] = scores.get(did, 0.0) + w * tf_part
        ranked = sorted(scores.items(), key=lambda x: (-x[1], x[0]))
        return ranked[:k]
