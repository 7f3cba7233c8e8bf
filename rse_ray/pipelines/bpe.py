"""Distributed BPE vocabulary training and encoding — the tokenizer-
construction step of an LLM training-data pipeline (Sennrich et al.
2016, "Neural Machine Translation of Rare Words with Subword Units"),
built Ray-Data-first:

  1. ``word_counts``: ONE corpus shuffle reduces 10^12 raw tokens to
     the distinct-word frequency table (the classic trainer state —
     every published BPE trainer iterates over word types weighted by
     frequency, never over the corpus).
  2. ``bpe_train``: the word table shards across a pool of actors;
     each superstep the driver picks the globally most frequent
     adjacent symbol pair (exact counts — ties broken lexicographically
     so the merge list is deterministic on ANY shard count) and
     broadcasts it; actors apply the merge INCREMENTALLY via a
     pair->words inverted index and return only count deltas for
     affected pairs. Per-merge traffic is O(affected pairs), not
     O(vocabulary).
  3. ``bpe_encode_counts``: a stateless map_batches stage applying the
     learned merge list in rank order (the same sequential semantics
     training used), with a per-actor distinct-word cache.

Merge semantics (identical in trainer, encoder, pure-Python test
reference, and the SQL oracle twin): words are symbol sequences
(initial symbols = characters, no end-of-word marker); pair counts
include every adjacent occurrence; applying a merge rewrites each word
left-to-right greedily (``aaa`` + (a,a) -> ``aa a``). The SQL twin
(``bpe_encode_oracle_sql``) represents a word as its symbols joined by
TWO spaces with single-space ends, so one non-overlapping
``replace(' l  r ', ' lr ')`` per merge reproduces the left-to-right
greedy pass exactly — the leading space of the next candidate is the
trailing space of the replacement, which DuckDB's scan has already
passed, and the double separator leaves it intact.

Driver state is the global pair-count dict — bounded by
|alphabet|^2 + O(num_merges x alphabet), kilobytes in practice, never
corpus- or vocabulary-sized.
"""

from __future__ import annotations

from collections import Counter, defaultdict

import numpy as np
import pandas as pd
import pyarrow as pa

from rse_ray.util import parts_for


def _words_of(text: str) -> list[str]:
    """The pre-tokenizer shared by trainer, encoder and SQL twin:
    lowercase, split on whitespace, drop empties."""
    return text.lower().split() if text else []


def word_counts(ds, *, text_col: str = "text"):
    """Corpus -> distinct (word, freq) table: per-batch Counter partial
    then ONE groupby — the only all-to-all in BPE training, and it
    carries word types, not tokens."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch.column(text_col).to_pylist():
            c.update(_words_of(t))
        return pa.table({
            "word": pa.array(list(c.keys()), type=pa.string()),
            "freq": pa.array(np.fromiter(c.values(), dtype=np.int64,
                                         count=len(c))),
        })

    return ds.select_columns([text_col]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("word").aggregate(Sum("freq", alias_name="freq"))


def _merge_word(sym: tuple, pair: tuple) -> tuple:
    """One left-to-right greedy merge pass (the BPE rewrite rule)."""
    a, b = pair
    out = []
    i, n = 0, len(sym)
    while i < n:
        if i + 1 < n and sym[i] == a and sym[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return tuple(out)


def _pair_counts(sym: tuple, f: int, into: Counter) -> None:
    for p in zip(sym, sym[1:]):
        into[p] += f


class _ShardState:
    """One shard of the word table: symbol sequences + frequencies,
    a pair -> word-index inverted index, and incremental merge
    application returning count deltas. Plain class so the pure-Python
    test reference and the Ray actor share one implementation."""

    def __init__(self, words: list[str], freqs: list[int]) -> None:
        self.syms = [tuple(w) for w in words]
        self.freq = list(freqs)
        self.index: dict[tuple, set] = defaultdict(set)
        self.counts: Counter = Counter()
        for i, (s, f) in enumerate(zip(self.syms, self.freq)):
            _pair_counts(s, f, self.counts)
            for p in zip(s, s[1:]):
                self.index[p].add(i)

    def init_counts(self) -> dict:
        return dict(self.counts)

    def merge(self, pair: tuple) -> dict:
        delta: Counter = Counter()
        for i in sorted(self.index.get(pair, ())):
            old, f = self.syms[i], self.freq[i]
            new = _merge_word(old, pair)
            for p in set(zip(old, old[1:])):
                self.index[p].discard(i)
            _pair_counts(old, -f, delta)
            _pair_counts(new, f, delta)
            for p in zip(new, new[1:]):
                self.index[p].add(i)
            self.syms[i] = new
        self.index.pop(pair, None)
        return {p: d for p, d in delta.items() if d}


def bpe_train(ds, *, num_merges: int = 32, text_col: str = "text",
              num_shards: int | None = None) -> pd.DataFrame:
    """Train a BPE merge list over the corpus -> DataFrame
    (rank, left, right, pair_count), deterministic on any shard count
    (exact global counts; ties broken by lexicographically smallest
    pair). ``pair_count`` is the pair's global frequency at selection
    time — the trainer's own audit trail.

    Scale shape: word_counts is the only corpus shuffle; the word
    table shards across ``num_shards`` actors (input-derived via
    parts_for, capped — each actor holds word TYPES, ~10-100 bytes
    each); supersteps move only the chosen pair down and sparse count
    deltas up."""
    import ray

    wc = word_counts(ds, text_col=text_col).materialize()
    n_words = wc.count()
    if n_words == 0 or num_merges <= 0:
        return pd.DataFrame({"rank": pd.array([], dtype="int64"),
                             "left": pd.array([], dtype="string"),
                             "right": pd.array([], dtype="string"),
                             "pair_count": pd.array([], dtype="int64")})
    P = num_shards or min(64, parts_for(n_words, rows_per_part=250_000,
                                        min_parts=2))

    Shard = ray.remote(_RemoteShard)
    actors = [Shard.remote(refs) for refs in
              _split_refs(wc, P)]
    counts: Counter = Counter()
    for d in ray.get([a.init_counts.remote() for a in actors]):
        counts.update(d)
    merges = []
    for rank in range(num_merges):
        live = [(c, p) for p, c in counts.items() if c > 0]
        if not live:
            break
        best_c = max(c for c, _ in live)
        pair = min(p for c, p in live if c == best_c)
        merges.append((rank, pair[0], pair[1], best_c))
        for d in ray.get([a.merge.remote(pair) for a in actors]):
            for p, dv in d.items():
                counts[p] += dv
    return pd.DataFrame({
        "rank": pd.array([m[0] for m in merges], dtype="int64"),
        "left": [m[1] for m in merges],
        "right": [m[2] for m in merges],
        "pair_count": pd.array([m[3] for m in merges], dtype="int64"),
    })


class _RemoteShard(_ShardState):
    """Actor wrapper: constructed from pinned Arrow block refs of the
    word-count table (zero-copy out of the object store)."""

    def __init__(self, refs) -> None:
        import ray

        tables = [t for t in ray.get(list(refs)) if t.num_rows]
        words: list[str] = []
        freqs: list[int] = []
        for t in tables:
            words.extend(t.column("word").to_pylist())
            freqs.extend(t.column("freq").to_pylist())
        super().__init__(words, freqs)


def _split_refs(materialized_ds, p: int):
    """Round-robin the materialized Dataset's Arrow block refs into
    ``p`` groups — words are already distinct (post-groupby), so any
    disjoint assignment is a valid sharding."""
    refs = materialized_ds.to_arrow_refs()
    groups = [refs[i::p] for i in range(p)]
    return [g for g in groups if g] or [refs]


def encode_word(word: str, merges: list[tuple[str, str]]) -> tuple:
    """Sequential-application BPE encode (the semantics training and
    the SQL twin use): apply each merge, in rank order, as one greedy
    left-to-right pass."""
    sym = tuple(word)
    for pair in merges:
        if pair[0] in sym:
            sym = _merge_word(sym, pair)
    return sym


def bpe_encode_counts(ds, merges: list[tuple[str, str]], *,
                      id_col: str = "doc_id", text_col: str = "text"):
    """-> (id_col, n_tokens_bpe): per-document BPE token count under a
    learned merge list — the "how many tokens will this corpus cost"
    accounting pass every pretraining-data budget needs.

    Scale shape: stateless actor-pool map; the merge list ships once
    per actor and a distinct-word encode cache amortizes Zipf-repeated
    words across batches. Documents with no words are dropped (the SQL
    twin's unnest does the same)."""
    merges = [tuple(m) for m in merges]

    class Encoder:
        def __init__(self) -> None:
            self.cache: dict[str, int] = {}

        def _len(self, w: str) -> int:
            got = self.cache.get(w)
            if got is None:
                got = self.cache[w] = len(encode_word(w, merges))
            return got

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids, ns = [], []
            for did, t in zip(batch.column(id_col).to_pylist(),
                              batch.column(text_col).to_pylist()):
                ws = _words_of(t)
                if not ws:
                    continue
                ids.append(did)
                ns.append(sum(self._len(w) for w in ws))
            return pa.table({
                id_col: pa.array(ids, type=batch.schema.field(id_col).type),
                "n_tokens_bpe": pa.array(ns, type=pa.int64()),
            })

    return ds.select_columns([id_col, text_col]) \
        .map_batches(Encoder, concurrency=(1, 8), batch_format="pyarrow")


def bpe_encode_oracle_sql(merges: list[tuple[str, str]],
                          table: str = "documents",
                          id_col: str = "doc_id",
                          text_col: str = "text") -> str:
    """Exact SQL twin of bpe_encode_counts for a FIXED merge list:
    symbols joined by two spaces, one chained replace per merge (see
    module docstring for the equivalence argument), token count from
    the separator count."""

    def q(s: str) -> str:
        return s.replace("'", "''")

    expr = ("' ' || rtrim(regexp_replace(word, '(.)', '\\1  ', 'g')) "
            "|| ' '")
    for left, right in merges:
        expr = (f"replace({expr}, ' {q(left)}  {q(right)} ', "
                f"' {q(left)}{q(right)} ')")
    return f"""
WITH w AS (SELECT {id_col},
                  unnest(list_filter(
                      regexp_split_to_array(lower({text_col}), '\\s+'),
                      x -> x <> '')) AS word
           FROM {table}),
e AS (SELECT {id_col}, {expr} AS s FROM w)
SELECT {id_col},
       sum(((length(s) - length(replace(s, '  ', ''))) / 2)::BIGINT
           + 1)::BIGINT AS n_tokens_bpe
FROM e GROUP BY {id_col}"""
