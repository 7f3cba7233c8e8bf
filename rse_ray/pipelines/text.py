"""Text-analysis operators over a documents table (doc_id, text, ...).

These are the training-data-pipeline operators (language-ID, quality
scoring, token counting, fingerprinting) plus the SQL-checkable face of
the fulltext core (tokenize -> postings -> df -> corpus stats -> BM25).

Tokenization here defaults to ``stem=False`` so a DuckDB oracle
(regexp_split_to_array + lower) can reproduce it exactly; the stemmed
path is exercised by the fixture-corpus tests (tests/test_build_search).

Every operator is a per-batch transform (no Python-per-row Dataset
calls); aggregations pre-reduce inside the batch and shuffle only
(key, partial) rows (ray_guide 'Aggregation at scale').
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _tok(text: str, stem: bool) -> list[str]:
    from rse_ray.functions.tokenizer import tokenize

    return tokenize(text, stem=stem)


# --------------------------------------------------------------------------
# token stats / postings / df / corpus stats
# --------------------------------------------------------------------------

def doc_token_stats(ds, *, stem: bool = False):
    """Per-doc token counts: (doc_id, n_tokens, n_unique)."""

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        texts = batch.column("text").to_pylist()
        n_tokens = np.empty(len(texts), dtype=np.int64)
        n_unique = np.empty(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            toks = _tok(t, stem)
            n_tokens[i] = len(toks)
            n_unique[i] = len(set(toks))
        return pa.table(
            {"doc_id": pa.array(ids), "n_tokens": pa.array(n_tokens),
             "n_unique": pa.array(n_unique)}
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def postings(ds, *, stem: bool = False):
    """(term, doc_id, tf) posting rows — A1: tf is aggregated inside the
    doc (a doc never spans batches), so this is shuffle-free."""

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        texts = batch.column("text").to_pylist()
        terms, dids, tfs = [], [], []
        for did, t in zip(ids, texts):
            for term, tf in Counter(_tok(t, stem)).items():
                terms.append(term)
                dids.append(int(did))
                tfs.append(tf)
        return pa.table(
            {"term": pa.array(terms, type=pa.string()),
             "doc_id": pa.array(dids, type=pa.int64()),
             "tf": pa.array(tfs, type=pa.int64())}
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def term_df(ds, *, stem: bool = False):
    """(term, df, total_tf) — pre-aggregated per batch, then ONE small
    groupby over (term, partial) rows instead of raw postings."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        df_c: Counter = Counter()
        tf_c: Counter = Counter()
        for t in texts:
            c = Counter(_tok(t, stem))
            df_c.update(c.keys())
            tf_c.update(c)
        terms = sorted(df_c)
        return pa.table(
            {"term": pa.array(terms, type=pa.string()),
             "df_p": pa.array([df_c[t] for t in terms], type=pa.int64()),
             "tf_p": pa.array([tf_c[t] for t in terms], type=pa.int64())}
        )

    out = ds.map_batches(partial, batch_format="pyarrow").groupby("term").aggregate(
        Sum("df_p", alias_name="df"), Sum("tf_p", alias_name="total_tf")
    )
    return out


def corpus_stats(ds, *, stem: bool = False) -> pd.DataFrame:
    """One row: (n_docs, total_tokens, avgdl)."""

    def partial(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        toks = sum(len(_tok(t, stem)) for t in texts)
        return pa.table({"docs_p": pa.array([len(texts)], type=pa.int64()),
                         "tokens_p": pa.array([toks], type=pa.int64())})

    agg = ds.map_batches(partial, batch_format="pyarrow").sum(["docs_p", "tokens_p"])
    n_docs = int(agg["sum(docs_p)"])
    n_tokens = int(agg["sum(tokens_p)"])
    return pd.DataFrame(
        {"n_docs": pd.array([n_docs], dtype="int64"),
         "total_tokens": pd.array([n_tokens], dtype="int64"),
         "avgdl": [round(n_tokens / n_docs, 6)]}
    )


# --------------------------------------------------------------------------
# quality scoring / fingerprints / language id
# --------------------------------------------------------------------------

STOPWORDS = ("the", "a")


def quality_scores(ds, *, stem: bool = False):
    """Per-doc quality features (length, uniqueness, mean token length,
    stopword ratio). All ratios are exact int/int divisions rounded to
    6dp so a SQL oracle reproduces them bit-for-bit."""

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        texts = batch.column("text").to_pylist()
        n = len(texts)
        n_tokens = np.empty(n, dtype=np.int64)
        uniq_ratio = np.empty(n, dtype=np.float64)
        mean_len = np.empty(n, dtype=np.float64)
        stop_ratio = np.empty(n, dtype=np.float64)
        stops = set(STOPWORDS)
        for i, t in enumerate(texts):
            toks = _tok(t, stem)
            nt = len(toks)
            n_tokens[i] = nt
            if nt:
                uniq_ratio[i] = round(len(set(toks)) / nt, 6)
                mean_len[i] = round(sum(len(w) for w in toks) / nt, 6)
                stop_ratio[i] = round(sum(1 for w in toks if w in stops) / nt, 6)
            else:
                uniq_ratio[i] = mean_len[i] = stop_ratio[i] = 0.0
        return pa.table(
            {"doc_id": pa.array(ids), "n_tokens": pa.array(n_tokens),
             "uniq_ratio": pa.array(uniq_ratio),
             "mean_token_len": pa.array(mean_len),
             "stopword_ratio": pa.array(stop_ratio)}
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def fingerprints(ds):
    """(doc_id, fp): md5 content fingerprint — the exact-dedup key and
    the per-partition content hash used in manifests."""

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        texts = batch.column("text").to_pylist()
        fps = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts]
        return pa.table({"doc_id": pa.array(ids), "fp": pa.array(fps, type=pa.string())})

    return ds.map_batches(fn, batch_format="pyarrow")


# tiny per-language letter-frequency profiles (public-knowledge letter
# statistics, coarse). Deterministic heuristic, not a model.
_LANG_PROFILES = {
    "en": {"e": 12.7, "t": 9.1, "a": 8.2, "o": 7.5, "i": 7.0, "n": 6.7, "s": 6.3, "h": 6.1},
    "de": {"e": 16.4, "n": 9.8, "i": 7.6, "s": 7.3, "r": 7.0, "a": 6.5, "t": 6.2, "d": 5.1},
    "fr": {"e": 14.7, "s": 7.9, "a": 7.6, "i": 7.5, "t": 7.2, "n": 7.1, "r": 6.6, "u": 6.3},
    "es": {"e": 12.5, "a": 12.2, "o": 8.7, "s": 7.2, "r": 6.9, "n": 6.8, "i": 6.2, "d": 5.0},
}


class LangId:
    """Actor-pool language-ID stage: profiles built once per actor
    (__init__), batches scored vectorized (__call__) — the stateful
    map_batches pattern (model-loading stand-in)."""

    def __init__(self) -> None:
        langs = sorted(_LANG_PROFILES)
        self.langs = langs
        mat = np.zeros((len(langs), 26), dtype=np.float64)
        for li, lang in enumerate(langs):
            for ch, w in _LANG_PROFILES[lang].items():
                mat[li, ord(ch) - 97] = w
        norm = np.linalg.norm(mat, axis=1, keepdims=True)
        self.mat = mat / np.where(norm == 0, 1, norm)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        texts = batch.column("text").to_pylist()
        n = len(texts)
        # one bincount over the whole batch: chars outside latin-1 can
        # never be a-z, so encode(..., "ignore") drops them losslessly
        # for the histogram (same counts as the per-char scan)
        bufs = [t.encode("latin-1", "ignore") for t in texts]
        lens = np.fromiter((len(b) for b in bufs), dtype=np.int64, count=n)
        arr = np.frombuffer(b"".join(bufs), dtype=np.uint8)
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
        valid = (arr >= 97) & (arr <= 122)
        key = doc_idx[valid] * 26 + (arr[valid].astype(np.int64) - 97)
        hist = np.bincount(key, minlength=n * 26).astype(
            np.float64
        ).reshape(n, 26)
        norm = np.linalg.norm(hist, axis=1, keepdims=True)
        hist /= np.where(norm == 0, 1, norm)
        sims = hist @ self.mat.T
        pred = [self.langs[j] for j in np.argmax(sims, axis=1)]
        return pa.table(
            {"doc_id": pa.array(ids), "lang_pred": pa.array(pred, type=pa.string())}
        )


def lang_id(ds, *, concurrency: int | None = 4):
    from rse_ray.util import clamp_pool

    return ds.map_batches(LangId, batch_format="pyarrow",
                          concurrency=clamp_pool(concurrency))


# --------------------------------------------------------------------------
# BPE-ish regex token counting + winnowing fingerprints
# --------------------------------------------------------------------------

# GPT-2-style pretokenizer shape, restricted to constructs RE2 (DuckDB)
# and Python `re` treat identically (no lookahead): contraction tails,
# space-prefixed letter runs, digit runs, punctuation runs, whitespace
BPE_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+"


def regex_token_counts(ds):
    """(doc_id, n_ws_tokens, n_bpe_tokens): whitespace tokens vs BPE-ish
    regex pretokens — the two token-budget estimators a training-data
    pipeline tracks. The regex is compiled once per task (module-level
    cache), applied per batch."""
    import re

    pat = re.compile(BPE_PATTERN)

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        texts = batch.column("text").to_pylist()
        n = len(texts)
        ws = np.empty(n, dtype=np.int64)
        bpe = np.empty(n, dtype=np.int64)
        for i, t in enumerate(texts):
            ws[i] = len(t.split())
            bpe[i] = len(pat.findall(t))
        return pa.table(
            {"doc_id": pa.array(ids), "n_ws_tokens": pa.array(ws),
             "n_bpe_tokens": pa.array(bpe)}
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def winnow_fingerprints(ds, *, window: int = 64, mod_bits: int = 4):
    """Winnowing/content-defined fingerprints: (doc_id, fp) rows, one
    per selected rolling-hash position (flat-map: docs yield 0..n
    rows). The fingerprint set is the content-defined-chunking key used
    for shift-robust dedup."""
    from rse_ray.functions.hashing import rolling_fingerprint

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        texts = batch.column("text").to_pylist()
        out_id, out_fp = [], []
        for did, t in zip(ids, texts):
            for fp in rolling_fingerprint(t, window=window, mod_bits=mod_bits):
                out_id.append(int(did))
                out_fp.append(fp)
        return pa.table(
            {"doc_id": pa.array(out_id, type=pa.int64()),
             "fp": pa.array(out_fp, type=pa.int64())}
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def tfidf_topk(ds, *, k: int = 3, stem: bool = False,
               num_parts: int | None = None):
    """Top-k TF-IDF keywords per document: score = tf * ln(n_docs/df),
    ranked per doc by (round(score, 6) DESC, term ASC) — the rounded
    rank key pins ordering against last-ulp libm drift between
    engines. Output: (doc_id, term, score).

    Scale shape: postings (per-batch, shuffle-free) hash-join term_df
    on the STRING term key via the co-partitioned hash_join (one
    all-to-all per side — the df side at web scale is the built
    index's term-sharded dictionary, already partitioned this way),
    then one groupby(doc_id) top-k. n_docs is a scalar driver
    aggregate. No broadcast of the vocabulary: a 10^9-term dictionary
    never materializes on one process.
    """
    from rse_ray.pipelines.relational import hash_join, top_k_per_group

    # MATERIALIZED: p feeds three consumers (the df aggregation, the
    # join's count(), and the join itself) — without pinning, the lazy
    # plan re-tokenizes the corpus once per consumer. The pinned blocks
    # are the posting table itself (spillable), the thing any index
    # build holds anyway.
    p = postings(ds, stem=stem).materialize()
    # df derived FROM the postings (one row per (term, doc), so df =
    # row count per term) — the corpus is tokenized once, not twice.
    # Per-batch pre-count so the groupby shuffles (term, partial) rows.
    from ray.data.aggregate import Sum

    def df_partial(batch: pa.Table) -> pa.Table:
        terms, counts = np.unique(
            batch.column("term").to_numpy(zero_copy_only=False),
            return_counts=True)
        return pa.table({"term": pa.array(terms, type=pa.string()),
                         "df_p": pa.array(counts.astype(np.int64))})

    d = p.select_columns(["term"]) \
        .map_batches(df_partial, batch_format="pyarrow") \
        .groupby("term").aggregate(Sum("df_p", alias_name="df"))
    n_docs = int(ds.count())

    joined = hash_join(p, d, left_on="term", right_on="term",
                       right_cols=["df"], num_parts=num_parts)

    def score(batch: pa.Table) -> pa.Table:
        tf = batch.column("tf").to_numpy().astype(np.float64)
        df = batch.column("df").to_numpy().astype(np.float64)
        s = np.round(tf * np.log(n_docs / df), 6)
        return pa.table({"doc_id": batch.column("doc_id"),
                         "term": batch.column("term"),
                         "score": pa.array(s, type=pa.float64())})

    scored = joined.map_batches(score, batch_format="pyarrow")
    return top_k_per_group(scored, group="doc_id", order="score",
                           k=k, tie="term", descending=True)


def vsm_cosine_topk(ds, query: str, *, k: int = 20, stem: bool = False,
                    num_parts: int | None = None):
    """Classic vector-space-model retrieval (the pre-BM25 ranking the
    reference's LIKE-scan search approximates): documents and query as
    tf·idf vectors (w = tf * ln(N/df)), ranked by true cosine — the
    doc norm runs over ALL the doc's terms, not just query terms, so
    this is NOT a BM25 re-skin. Output: top-k (doc_id, score), ties
    (round(score,6) DESC, doc_id ASC).

    Scale shape mirrors tfidf_topk: postings -> df join (co-partitioned
    hash join on term), per-doc norm via one groupby, query-term
    contributions via an `is_in` filter (|q| terms — never a corpus
    broadcast), final dot/norm join on doc_id, distributed sort +
    limit(k)."""
    from ray.data.aggregate import Sum

    from rse_ray.functions.tokenizer import tokenize
    from rse_ray.pipelines.relational import hash_join

    p = postings(ds, stem=stem).materialize()

    def df_partial(batch: pa.Table) -> pa.Table:
        terms, counts = np.unique(
            batch.column("term").to_numpy(zero_copy_only=False),
            return_counts=True)
        return pa.table({"term": pa.array(terms, type=pa.string()),
                         "df_p": pa.array(counts.astype(np.int64))})

    d = p.select_columns(["term"]) \
        .map_batches(df_partial, batch_format="pyarrow") \
        .groupby("term").aggregate(Sum("df_p", alias_name="df")) \
        .materialize()
    n_docs = int(ds.count())

    joined = hash_join(p, d, left_on="term", right_on="term",
                       right_cols=["df"], num_parts=num_parts)

    # query vector: |q| rows of the df table reach the driver, nothing
    # else does
    qtf = Counter(tokenize(query, stem=stem))
    qterms = sorted(qtf)
    qdf = d.map_batches(
        lambda b: b.filter(pc.is_in(b.column("term"),
                                    pa.array(qterms, type=pa.string()))),
        batch_format="pyarrow").to_pandas()
    qw = {t: qtf[t] * math.log(n_docs / df)
          for t, df in zip(qdf["term"], qdf["df"])}
    qnorm = math.sqrt(sum(v * v for v in qw.values()))
    if not qw or qnorm == 0:
        return pd.DataFrame({"doc_id": pd.array([], dtype="int64"),
                             "score": pd.array([], dtype="float64")})
    qw_terms = np.array(sorted(qw), dtype=object)
    qw_vals = np.array([qw[t] for t in qw_terms])

    # ONE pass over the weighted postings accumulates, per doc: the
    # full norm (over ALL terms), the query dot, and a match flag —
    # then a single groupby(doc_id) finishes. (The unfused shape — a
    # norms groupby + a dots groupby + a doc_id join — costs two extra
    # all-to-alls for identical output; measured 21 s -> this.)
    def partial(batch: pa.Table) -> pa.Table:
        tf = batch.column("tf").to_numpy().astype(np.float64)
        df = batch.column("df").to_numpy().astype(np.float64)
        w = tf * np.log(n_docs / df)
        terms = batch.column("term").to_numpy(zero_copy_only=False)
        hit = np.isin(terms, qw_terms)
        dot = np.zeros(len(w))
        idx = np.searchsorted(qw_terms, terms[hit])
        dot[hit] = w[hit] * qw_vals[idx]
        g = pa.table({"doc_id": batch.column("doc_id"),
                      "w2": pa.array(w * w), "d": pa.array(dot),
                      "m": pa.array(hit.astype(np.int64))}) \
            .group_by("doc_id") \
            .aggregate([("w2", "sum"), ("d", "sum"), ("m", "sum")])
        return pa.table({"doc_id": pc.cast(g.column("doc_id"), pa.int64()),
                         "s2_p": g.column("w2_sum"),
                         "d_p": g.column("d_sum"),
                         "m_p": g.column("m_sum")})

    agg = joined.map_batches(partial, batch_format="pyarrow") \
        .groupby("doc_id") \
        .aggregate(Sum("s2_p", alias_name="norm2"),
                   Sum("d_p", alias_name="dot"),
                   Sum("m_p", alias_name="n_match"))

    def finish(batch: pa.Table) -> pa.Table:
        # only docs matching >= 1 query term rank (the m flag, NOT
        # dot > 0: a term with df == N has idf 0 yet still matches)
        keep = pc.greater(batch.column("n_match"), 0)
        batch = batch.filter(keep)
        dot = batch.column("dot").to_numpy().astype(np.float64)
        nrm = np.sqrt(batch.column("norm2").to_numpy().astype(np.float64))
        s = np.round(dot / (nrm * qnorm), 6)
        return pa.table({"doc_id": pc.cast(batch.column("doc_id"),
                                           pa.int64()),
                         "score": pa.array(s)})

    return agg.map_batches(finish, batch_format="pyarrow") \
        .sort(["score", "doc_id"], descending=[True, False]) \
        .limit(k).to_pandas()


def oov_rate(ds, *, vocab_n: int = 20, stem: bool = False):
    """Out-of-vocabulary rate per document against the corpus's own
    top-``vocab_n`` terms by TOTAL term frequency (ties term-asc) —
    the vocabulary-coverage filter an LLM-data pipeline runs before
    tokenizer training. Output (doc_id, n_tokens, oov_rate).

    The vocabulary is a top-k over the aggregated term counts (small
    by construction); it is np.isin-probed per batch from task-local
    state — the corpus itself never funnels through a collect."""
    from ray.data.aggregate import Sum

    def tf_partial(batch: pa.Table) -> pa.Table:
        toks = [t for txt in batch.column("text").to_pylist()
                for t in _tok(txt, stem)]
        terms, counts = np.unique(np.array(toks, dtype=object),
                                  return_counts=True)
        return pa.table({"term": pa.array(terms, type=pa.string()),
                         "c_p": pa.array(counts.astype(np.int64))})

    tot = ds.map_batches(tf_partial, batch_format="pyarrow") \
        .groupby("term").aggregate(Sum("c_p", alias_name="c")) \
        .to_pandas()
    tot = tot.sort_values(["c", "term"], ascending=[False, True],
                          kind="stable").head(vocab_n)
    vocab = np.sort(tot["term"].to_numpy().astype(object))

    def fn(batch: pa.Table) -> pa.Table:
        ids, n_toks, rates = [], [], []
        for did, txt in zip(batch.column("doc_id").to_pylist(),
                            batch.column("text").to_pylist()):
            toks = np.array(_tok(txt, stem), dtype=object)
            n = len(toks)
            oov = float(np.count_nonzero(~np.isin(toks, vocab))) / n \
                if n else 0.0
            ids.append(did)
            n_toks.append(n)
            rates.append(round(oov, 6))
        return pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                         "n_tokens": pa.array(n_toks, type=pa.int64()),
                         "oov_rate": pa.array(rates, type=pa.float64())})

    return ds.map_batches(fn, batch_format="pyarrow")


class _LangIdConfusion:
    """Actor-pool stage: score with the SAME LangId model (bound once
    per actor) and reduce each batch to (lang_true, lang_pred, n)
    partial counts."""

    def __init__(self) -> None:
        self._inner = LangId()

    def __call__(self, batch: pa.Table) -> pa.Table:
        pred = self._inner(batch).column("lang_pred").to_pylist()
        true = batch.column("lang").to_pylist()
        c = Counter(zip(true, pred))
        keys = sorted(c)
        return pa.table({
            "lang_true": pa.array([k[0] for k in keys], type=pa.string()),
            "lang_pred": pa.array([k[1] for k in keys], type=pa.string()),
            "n_p": pa.array([c[k] for k in keys], type=pa.int64()),
        })


def langid_confusion(ds, *, concurrency: int | None = 4):
    """Language-ID evaluation: the confusion matrix (lang_true,
    lang_pred, n) of the n-gram LangId model against the table's
    stored labels — the model-eval step every labeling pipeline needs
    before trusting predictions at corpus scale. ONE actor-pool pass
    scores and carries the truth through; per-batch partials make the
    final exchange a |langs|^2 histogram."""
    from ray.data.aggregate import Sum

    from rse_ray.util import clamp_pool

    return ds.map_batches(_LangIdConfusion, batch_format="pyarrow",
                          concurrency=clamp_pool(concurrency)) \
        .groupby(["lang_true", "lang_pred"]) \
        .aggregate(Sum("n_p", alias_name="n"))


def zipf_slope(ds, *, stem: bool = False, round_to: int = 6):
    """Rank-frequency power-law fit over the term distribution (Zipf's
    law — the corpus-planning statistic next to vocab_growth's Heaps
    curve): OLS of ln(total_tf) on ln(rank), rank = exact global
    ROW_NUMBER by (total_tf DESC, term). Output one row
    (n_terms, slope, intercept), both rounded (distributed float
    summation order differs from any serial oracle; the rounding IS
    the contract, per the module-wide policy).

    Scale shape: term_df pre-aggregates per batch; the rank is the
    shared two-pass block-offset global_rank (one range exchange over
    vocab-sized rows, never corpus rows); the regression reduces to
    five scalar sums (per-batch partials, one tiny fold)."""
    from rse_ray.pipelines.relational import global_rank

    ranked = global_rank(term_df(ds, stem=stem), order="total_tf",
                         key="term", descending=True, out_col="rank")

    def partial(batch: pa.Table) -> pa.Table:
        x = np.log(batch.column("rank").to_numpy().astype(np.float64))
        y = np.log(batch.column("total_tf").to_numpy().astype(np.float64))
        return pa.table({
            "n": pa.array([len(x)], type=pa.int64()),
            "sx": pa.array([float(x.sum())]),
            "sy": pa.array([float(y.sum())]),
            "sxy": pa.array([float((x * y).sum())]),
            "sxx": pa.array([float((x * x).sum())]),
        })

    s = ranked.map_batches(partial, batch_format="pyarrow") \
        .sum(["n", "sx", "sy", "sxy", "sxx"])
    n = float(s["sum(n)"])
    sx, sy = s["sum(sx)"], s["sum(sy)"]
    sxy, sxx = s["sum(sxy)"], s["sum(sxx)"]
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    scale = 10.0 ** round_to

    def _r(v: float) -> float:   # half-away, SQL round semantics
        return float(np.copysign(np.floor(abs(v) * scale + 0.5), v) / scale)

    return pd.DataFrame({"n_terms": [int(n)],
                         "slope": [_r(slope)],
                         "intercept": [_r(intercept)]})


def negative_sampling_table(ds, *, alpha: float = 0.75,
                            stem: bool = False, round_to: int = 9):
    """word2vec negative-sampling distribution (Mikolov et al. 2013):
    P(term) proportional to total_tf^alpha (alpha=0.75 flattens the
    head) -> (term, weight), weights rounded and summing to ~1. The
    embedding-training prep step over the corpus unigram counts.

    Scale shape: term_df partials -> one vocab-sized groupby; the
    normalizer is one scalar fold of per-batch pow-sums; the weight
    map is stateless with Z as a closure constant."""
    tdf = term_df(ds, stem=stem)

    def zpart(batch: pa.Table) -> pa.Table:
        tf = batch.column("total_tf").to_numpy().astype(np.float64)
        return pa.table({"z": pa.array([float((tf ** alpha).sum())])})

    z = float(tdf.map_batches(zpart, batch_format="pyarrow").sum("z"))

    def weight(batch: pa.Table) -> pa.Table:
        tf = batch.column("total_tf").to_numpy().astype(np.float64)
        # half-away rounding (weights are positive)
        w = np.floor(tf ** alpha / z * 10.0 ** round_to + 0.5) \
            / 10.0 ** round_to
        return pa.table({
            "term": batch.column("term"),
            "weight": pa.array(w),
        })

    return tdf.map_batches(weight, batch_format="pyarrow")


def vocab_growth(ds, *, stem: bool = False):
    """Heaps-law vocabulary growth curve: for each document (ascending
    doc_id), the CUMULATIVE token count and cumulative distinct-term
    count over docs 0..doc_id — the corpus-planning statistic (how
    fast does vocabulary grow with data?). Output (doc_id,
    cum_tokens, cum_vocab), one row per document, zero-token docs
    included.

    Scale shape: a term's contribution to the curve is decided by its
    FIRST occurrence alone — one groupby(term).min (batch-level
    pre-aggregation first, so the shuffle moves (term, min) partials,
    never raw postings), reduced to per-doc new-term counts; the
    per-doc token counts ride a union into the SAME groupby(doc_id);
    the cumulative step is the two-pass block-offset prefix pattern
    shared with global_rank/epoch_shuffle (O(blocks) driver rows, row
    data never collects on the driver)."""
    from ray.data.aggregate import Min, Sum

    def both_partial(batch: pa.Table) -> pa.Table:
        """ONE tokenize pass emits a tagged union: per-doc token-count
        rows (term null) AND per-term batch-local first-doc rows —
        tokenization (the dominant cost) is paid once, not once per
        downstream branch."""
        ids = batch.column("doc_id").to_numpy()
        texts = batch.column("text").to_pylist()
        nt = np.empty(len(ids), dtype=np.int64)
        first: dict = {}
        for i, (did, t) in enumerate(zip(ids, texts)):
            toks = _tok(t, stem)
            nt[i] = len(toks)
            d = int(did)
            for term in set(toks):
                if term not in first or d < first[term]:
                    first[term] = d
        terms = sorted(first)
        return pa.table({
            "term": pa.array([None] * len(ids) + terms, type=pa.string()),
            "doc_id": pa.array(np.concatenate(
                [ids.astype(np.int64),
                 np.fromiter((first[t] for t in terms), np.int64,
                             len(terms))])),
            "nt": pa.array(np.concatenate(
                [nt, np.zeros(len(terms), np.int64)])),
        })

    tagged = ds.map_batches(both_partial,
                            batch_format="pyarrow").materialize()

    def first_rows(b: pa.Table) -> pa.Table:
        t = b.filter(pc.is_valid(b.column("term")))
        return pa.table({"term": t.column("term"),
                         "d_p": t.column("doc_id")})

    firsts = tagged.map_batches(first_rows, batch_format="pyarrow") \
        .groupby("term").aggregate(Min("d_p", alias_name="first_doc"))

    def new_counts(batch: pa.Table) -> pa.Table:
        d = batch.column("first_doc").to_numpy()
        u, c = np.unique(d, return_counts=True)
        return pa.table({"doc_id": pa.array(u.astype(np.int64)),
                         "nt": pa.array(np.zeros(len(u), np.int64)),
                         "nv": pa.array(c.astype(np.int64))})

    def doc_rows(b: pa.Table) -> pa.Table:
        t = b.filter(pc.is_null(b.column("term"))).drop_columns(["term"])
        return t.append_column(
            "nv", pa.array(np.zeros(t.num_rows, np.int64)))

    per_doc = tagged.map_batches(doc_rows, batch_format="pyarrow") \
        .union(firsts.map_batches(new_counts, batch_format="pyarrow")) \
        .groupby("doc_id").aggregate(Sum("nt", alias_name="nt"),
                                     Sum("nv", alias_name="nv"))

    ordered = per_doc.sort("doc_id").materialize()

    def block_tot(batch: pa.Table) -> pa.Table:
        n = min(batch.num_rows, 1)
        return pa.table({
            "d0": batch.column("doc_id").slice(0, 1),
            "snt": pa.array([int(pc.sum(batch.column("nt")).as_py() or 0)] * n,
                            type=pa.int64()),
            "snv": pa.array([int(pc.sum(batch.column("nv")).as_py() or 0)] * n,
                            type=pa.int64()),
        })

    totals = ordered.map_batches(block_tot, batch_size=None,
                                 batch_format="pyarrow").to_pandas() \
        .sort_values("d0").reset_index(drop=True)
    base = {int(d0): (int(ont), int(onv)) for d0, ont, onv in zip(
        totals["d0"],
        totals["snt"].cumsum().shift(fill_value=0),
        totals["snv"].cumsum().shift(fill_value=0))}

    def cum(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "cum_tokens": pa.array([], type=pa.int64()),
                             "cum_vocab": pa.array([], type=pa.int64())})
        ont, onv = base[int(batch.column("doc_id")[0].as_py())]
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "cum_tokens": pa.array(
                np.cumsum(batch.column("nt").to_numpy()) + ont),
            "cum_vocab": pa.array(
                np.cumsum(batch.column("nv").to_numpy()) + onv),
        })

    return ordered.map_batches(cum, batch_size=None, batch_format="pyarrow")


def lm_quality_buckets(ds, *, n_buckets: int = 3,
                       lang_col: str = "lang"):
    """CCNet-style per-language quality bucketing (Wenzek et al.
    2020): every document ranks WITHIN ITS LANGUAGE by the
    corpus-trained bigram-LM cross entropy (doc_lm_score; lower =
    more fluent) and splits into NTILE(n_buckets) head/middle/tail
    buckets — the standard pretraining-corpus triage. Output
    (doc_id, lang, cross_entropy, rank, bucket).

    Scale shape: the LM scoring is the oracled doc_lm_score pipeline;
    the per-language ROW_NUMBER is the shared two-pass block-offset
    group_rank (ONE range exchange, O(blocks x langs) driver rows);
    group sizes fall out of the same pass, so the NTILE arithmetic is
    a stateless map with a |langs| dict as closure constant. The lang
    column rides a co-partitioned hash join onto the scores."""
    from rse_ray.pipelines.relational import group_rank, hash_join

    scored = doc_lm_score(ds.select_columns(["doc_id", "text"]))
    joined = hash_join(
        scored, ds.select_columns(["doc_id", lang_col]),
        left_on="doc_id", right_on="doc_id", right_cols=[lang_col])
    ranked, sizes = group_rank(joined, group=lang_col,
                               order="cross_entropy", key="doc_id",
                               descending=False, out_col="rank")

    def bucket(batch: pa.Table) -> pa.Table:
        langs = batch.column(lang_col).to_pylist()
        rank = batch.column("rank").to_numpy().astype(np.int64)
        n = np.array([sizes[g] for g in langs], dtype=np.int64)
        q, r = n // n_buckets, n % n_buckets
        head = (q + 1) * r                    # rows in the fat buckets
        in_head = rank <= head
        b = np.where(in_head,
                     (rank - 1) // np.where(q + 1 == 0, 1, q + 1) + 1,
                     r + (rank - head - 1) // np.where(q == 0, 1, q) + 1)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "lang": batch.column(lang_col),
            "cross_entropy": batch.column("cross_entropy"),
            "rank": pa.array(rank),
            "bucket": pa.array(b.astype(np.int64)),
        })

    return ranked.map_batches(bucket, batch_format="pyarrow")


def pack_sequences(ds, *, budget: int = 512, stem: bool = False):
    """Sequence packing for LLM pretraining — concatenate the token
    stream in doc_id order and cut a training sequence every ``budget``
    tokens; each doc reports the sequence its first token lands in and
    its offset inside it. Output: (doc_id, n_tokens, seq_id, seq_offset).

    Scale shape — a DISTRIBUTED PREFIX SUM, no shuffle of the docs:
      1. per-batch token counts (map_batches) with a batch-order key;
      2. per-block totals -> driver computes block prefix offsets
         (O(blocks) ints on the driver, never rows);
      3. second pass adds local cumsum + block offset per row.
    Determinism: the stream order is doc_id (content), not arrival
    order — a repartitioned corpus packs identically.
    """
    counted = doc_token_stats(ds, stem=stem).select_columns(
        ["doc_id", "n_tokens"])

    # the packing order is doc_id: range-partition by sorting (Ray's
    # sort is a range exchange — each output block holds a contiguous
    # doc_id range, which makes block-prefix offsets well-defined).
    # MATERIALIZED so both prefix-sum passes see the SAME blocks: this
    # pins the 16-bytes/doc counts projection, ~0.02% of the corpus —
    # not the corpus itself.
    ordered = counted.sort("doc_id").materialize()

    # pass 1: per-block (min_doc, total_tokens) partials
    def block_total(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"lo": pa.array([], type=pa.int64()),
                             "tok": pa.array([], type=pa.int64())})
        nt = batch.column("n_tokens").to_numpy()
        return pa.table({
            "lo": pa.array([int(batch.column("doc_id")[0].as_py())],
                           type=pa.int64()),
            "tok": pa.array([int(nt.sum())], type=pa.int64()),
        })

    totals = ordered.map_batches(
        block_total, batch_size=None, batch_format="pyarrow").to_pandas()
    totals = totals.sort_values("lo").reset_index(drop=True)
    offsets = totals["tok"].cumsum().shift(fill_value=0)
    base = {int(lo): int(off) for lo, off in zip(totals["lo"], offsets)}

    # pass 2: local cumsum + the block's global offset
    def assign(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "n_tokens": pa.array([], type=pa.int64()),
                             "seq_id": pa.array([], type=pa.int64()),
                             "seq_offset": pa.array([], type=pa.int64())})
        ids = batch.column("doc_id").to_numpy()
        nt = batch.column("n_tokens").to_numpy()
        start = np.cumsum(nt) - nt + base[int(ids[0])]
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_tokens": batch.column("n_tokens"),
            "seq_id": pa.array(start // budget, type=pa.int64()),
            "seq_offset": pa.array(start % budget, type=pa.int64()),
        })

    return ordered.map_batches(assign, batch_size=None,
                               batch_format="pyarrow")


def doc_chunks(ds, *, chunk: int = 64, overlap: int = 16,
               stem: bool = False):
    """RAG-style WITHIN-doc chunking (the complement of cross-doc
    `pack_sequences`): each doc's token stream splits into windows of
    ``chunk`` tokens starting every ``chunk - overlap`` tokens; the
    final partial window is kept (min 1 token). Output one row per
    chunk: (doc_id, chunk_id, start_tok, n_tokens). Pure flat-map —
    embarrassingly parallel, no shuffle."""
    if overlap >= chunk:
        raise ValueError("overlap must be < chunk")
    stride = chunk - overlap

    def fn(batch: pa.Table) -> pa.Table:
        d_ids, c_ids, starts, lens = [], [], [], []
        for did, txt in zip(batch.column("doc_id").to_pylist(),
                            batch.column("text").to_pylist()):
            n = len(_tok(txt, stem)) if txt is not None else 0
            if n == 0:
                continue
            n_chunks = max(1, -(-max(n - overlap, 1) // stride))
            for c in range(n_chunks):
                s = c * stride
                d_ids.append(did)
                c_ids.append(c)
                starts.append(s)
                lens.append(min(chunk, n - s))
        return pa.table({"doc_id": pa.array(d_ids, type=pa.int64()),
                         "chunk_id": pa.array(c_ids, type=pa.int64()),
                         "start_tok": pa.array(starts, type=pa.int64()),
                         "n_tokens": pa.array(lens, type=pa.int64())})

    return ds.select_columns(["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow")


def pretrain_pack(documents_ds, *, lang: str = "en", budget: int = 512,
                  stem: bool = False):
    """END-TO-END pretraining-data prep — the composition proof that
    the stages chain as one lazy pipeline: language filter -> exact
    dedup (keep min doc_id per identical text) -> GPT-style sequence
    packing. Three stages, three different scale shapes (stateless
    filter, (hash, id) shuffle + semi-join, distributed prefix sum),
    one Dataset flowing through. The filtered corpus is consumed three
    times (dedup, join-left, join sizing) and deliberately
    RE-EXECUTES the cheap read+filter each time rather than pinning
    full text in the object store; the only pins are the id-only
    survivor set (8 B/doc) and pack_sequences' 16 B/doc count
    projection. Output: (doc_id, n_tokens, seq_id, seq_offset) for
    surviving docs."""
    from rse_ray.pipelines.dedup import exact_dedup
    from rse_ray.pipelines.relational import hash_join

    kept_lang = documents_ds.select_columns(["doc_id", "text", "lang"]) \
        .map_batches(
            lambda b, lg=lang: b.filter(
                pc.equal(b.column("lang"), lg)).select(["doc_id", "text"]),
            batch_format="pyarrow")
    # materialized: hash_join probes right_ds.schema() (one execution)
    # before consuming it — pinning the id-only projection (8 B/doc)
    # halves the dedup cost
    survivors = exact_dedup(kept_lang).select_columns(["doc_id"]) \
        .materialize()
    kept = hash_join(kept_lang, survivors, left_on="doc_id",
                     right_on="doc_id", right_cols=[], how="semi")
    return pack_sequences(kept, budget=budget, stem=stem)


def bigram_counts(ds, *, top_n: int = 50, stem: bool = False):
    """Corpus bigram counts (n-gram LM statistics), top-N by count with
    (count DESC, bigram ASC) deterministic order. Pre-aggregated per
    batch (Counter over the batch's bigrams) so the groupby shuffles
    partial counts, not one row per token position."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        from collections import Counter
        c: Counter = Counter()
        for t in batch.column("text").to_pylist():
            toks = _tok(t, stem)
            c.update(f"{a} {b}" for a, b in zip(toks, toks[1:]))
        grams = sorted(c)
        return pa.table({
            "bigram": pa.array(grams, type=pa.string()),
            "c_p": pa.array([c[g] for g in grams], type=pa.int64()),
        })

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("bigram").aggregate(Sum("c_p", alias_name="n"))

    # per-block head BEFORE the collect: each aggregated block keeps
    # its own top-N, so the driver sees at most blocks x N rows — the
    # bigram vocabulary (corpus-sized at web scale) never lands on one
    # process. A block-local head supersets the global head because
    # groupby made bigrams unique across blocks.
    def block_head(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        return pa.Table.from_pandas(
            df.sort_values(["n", "bigram"], ascending=[False, True])
              .head(top_n), preserve_index=False)

    out = agg.map_batches(block_head, batch_size=None,
                          batch_format="pyarrow").to_pandas()
    return out.sort_values(["n", "bigram"], ascending=[False, True]) \
        .head(top_n).reset_index(drop=True)


def repetition_scores(ds, *, stem: bool = False):
    """Gopher/MassiveText-style repetition filters, per doc:
    top_bigram_frac (count of the most frequent bigram / total
    bigrams) and dup_trigram_frac (1 - distinct/total trigrams) —
    the signals that catch boilerplate and degenerate repetition.
    Per-batch Counter kernels, no shuffle; zero-gram docs score 0."""
    from collections import Counter

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        texts = batch.column("text").to_pylist()
        top_bg = np.zeros(len(texts), dtype=np.float64)
        dup_tg = np.zeros(len(texts), dtype=np.float64)
        for i, t in enumerate(texts):
            toks = _tok(t, stem)
            if len(toks) >= 2:
                bc = Counter(zip(toks, toks[1:]))
                total = len(toks) - 1
                top_bg[i] = round(max(bc.values()) / total, 6)
            if len(toks) >= 3:
                tg = Counter(zip(toks, toks[1:], toks[2:]))
                total3 = len(toks) - 2
                dup_tg[i] = round(1.0 - len(tg) / total3, 6)
        return pa.table({
            "doc_id": pa.array(ids),
            "top_bigram_frac": pa.array(top_bg),
            "dup_trigram_frac": pa.array(dup_tg),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


# PII presets for pattern_scan — RE2-compatible (no lookaround, no
# backreferences) so the same pattern string runs identically under
# Python re and DuckDB regexp_* for the oracle cross-check.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
    "phone": r"\+?\d[\d\- ]{7,14}\d",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
}


def pattern_scan(ds, *, patterns: dict[str, str] | None = None,
                 redact: bool = False, id_col: str = "doc_id",
                 text_col: str = "text"):
    """Per-document regex scan — the PII-detection / policy-filter
    primitive of a training-data pipeline: for each named pattern,
    count its non-overlapping matches per doc (``n_<name>`` columns);
    with ``redact=True`` also report ``redacted_len``, the text length
    after replacing every match with ``<NAME>`` (patterns applied in
    sorted-name order, so the Ray and SQL sides agree on cascaded
    replacements). Defaults to the ``PII_PATTERNS`` presets (email /
    IPv4 / phone / SSN).

    Scale shape: embarrassingly parallel per-batch map, no shuffle.
    Patterns compile ONCE at the driver and ship as compiled objects
    (re.Pattern pickles by source, recompiling once per worker — not
    per batch, not per row). The findall loop is per-string — inherent
    to regex scanning; the engine underneath is C."""
    import re

    pats = {name: re.compile(p)
            for name, p in sorted((patterns or PII_PATTERNS).items())}

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        out = {id_col: batch.column(id_col)}
        for name, rx in pats.items():
            out[f"n_{name}"] = pa.array(
                [len(rx.findall(t)) if t else 0 for t in texts],
                type=pa.int64())
        if redact:
            red = []
            for t in texts:
                if t:
                    for name, rx in pats.items():
                        t = rx.sub(f"<{name.upper()}>", t)
                red.append(len(t) if t else 0)
            out["redacted_len"] = pa.array(red, type=pa.int64())
        return pa.table(out)

    return ds.select_columns([id_col, text_col]) \
        .map_batches(fn, batch_format="pyarrow")


_LM_CACHE: dict = {}  # worker-global broadcast-LM cache (doc_lm_score)


def doc_lm_score(ds, *, stem: bool = False, id_col: str = "doc_id",
                 text_col: str = "text"):
    """Corpus-trained bigram-LM cross-entropy per document — the
    model-based quality signal (CCNet/KenLM shape): train add-one-
    smoothed bigram statistics on the corpus itself, then score each
    doc by the average negative log-likelihood of its bigrams,
    P(w2|w1) = (c(w1 w2) + 1) / (c_pred(w1) + V) where c_pred counts
    w1's appearances as a bigram predecessor and V is the corpus
    distinct-token count. High cross-entropy = improbable word
    sequences (gibberish/boilerplate candidates). Output
    (id, n_bigrams, cross_entropy) with <2-token docs scoring 0.

    Scale shape: pass 1 is the bigram_counts explode — per-batch
    Counter partials, ONE groupby((w1, w2)) — with each token also
    emitted once as a (w, NULL) row so the same shuffle yields the
    vocabulary; the aggregated LM table (bigram vocab after the
    count-aggregation, the standard n-gram-LM budget) is collected
    and broadcast ONCE via ray.put. Pass 2 is a per-batch map:
    token->id via the broadcast vocab, bigram counts looked up through
    a packed-int64 key dict, numpy log/mean per doc."""
    from collections import Counter

    import ray
    from ray.data.aggregate import Sum

    # unigram sentinel: w2 = "" (tokens are never empty post-filter),
    # so Ray's groupby sort never compares None against str
    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch.column(text_col).to_pylist():
            if not t:  # null/empty text contributes nothing
                continue
            toks = _tok(t, stem)
            c.update(zip(toks, toks[1:]))
            c.update((w, "") for w in toks)
        keys = sorted(c)
        return pa.table({
            "w1": pa.array([k[0] for k in keys], type=pa.string()),
            "w2": pa.array([k[1] for k in keys], type=pa.string()),
            "c_p": pa.array([c[k] for k in keys], type=pa.int64()),
        })

    lm = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(["w1", "w2"]).aggregate(Sum("c_p", alias_name="n")) \
        .to_pandas()

    uni = lm[lm["w2"] == ""]
    vocab = {w: i for i, w in enumerate(sorted(uni["w1"]))}
    V = len(vocab)
    big = lm[lm["w2"] != ""]
    pred = big.groupby("w1")["n"].sum()
    c_pred = np.zeros(V, dtype=np.float64)
    for w, n in pred.items():
        c_pred[vocab[w]] = float(n)
    # bigram counts as SORTED packed-key + count numpy arrays (plasma
    # zero-copy; a python dict would re-deserialize on every access)
    pk = np.fromiter((vocab[r.w1] * V + vocab[r.w2]
                      for r in big.itertuples()),
                     dtype=np.int64, count=len(big))
    cnt = big["n"].to_numpy(dtype=np.float64)
    srt = np.argsort(pk)
    lm_ref = ray.put((vocab, V, c_pred, pk[srt], cnt[srt]))

    def score(batch: pa.Table) -> pa.Table:
        # worker-global cache: ONE ray.get deserialization per worker
        # process, not per batch (the vocab dict is not zero-copy)
        lm = _LM_CACHE.get(lm_ref.hex())
        if lm is None:
            _LM_CACHE.clear()  # at most one resident LM per worker
            lm = _LM_CACHE[lm_ref.hex()] = ray.get(lm_ref)
        vocab, V, c_pred, big_keys, big_cnt = lm
        ids = batch.column(id_col)
        nb = np.zeros(batch.num_rows, dtype=np.int64)
        ce = np.zeros(batch.num_rows, dtype=np.float64)
        for i, t in enumerate(batch.column(text_col).to_pylist()):
            toks = _tok(t, stem) if t else []
            if len(toks) < 2:
                continue
            tid = np.array([vocab[w] for w in toks], dtype=np.int64)
            keys = tid[:-1] * V + tid[1:]
            if len(big_keys):
                idx = np.minimum(np.searchsorted(big_keys, keys),
                                 len(big_keys) - 1)
                cb = np.where(big_keys[idx] == keys, big_cnt[idx], 0.0)
            else:
                cb = np.zeros(len(keys))
            p = (cb + 1.0) / (c_pred[tid[:-1]] + V)
            nb[i] = len(keys)
            ce[i] = round(float(np.mean(-np.log(p))), 6)
        return pa.table({id_col: ids,
                         "n_bigrams": pa.array(nb),
                         "cross_entropy": pa.array(ce)})

    return ds.select_columns([id_col, text_col]) \
        .map_batches(score, batch_format="pyarrow")


# --------------------------------------------------------------------------
# token-distribution statistics: entropy / KL / collocations / skip-grams
# --------------------------------------------------------------------------

def token_entropy(ds, *, stem: bool = False, id_col: str = "doc_id",
                  text_col: str = "text"):
    """Per-document Shannon entropy (nats) of the unigram token
    distribution — a degenerate-text signal complementing the Gopher
    repetition filters (a doc repeating one token has entropy ~0; rich
    vocabulary pushes it toward ln(n_unique)). Output
    (id, n_tokens, entropy) with zero-token docs scoring 0.

    Scale shape: embarrassingly parallel per-batch map, no shuffle —
    each doc's distribution is local to its row."""

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col)
        ntok = np.zeros(batch.num_rows, dtype=np.int64)
        ent = np.zeros(batch.num_rows, dtype=np.float64)
        for i, t in enumerate(batch.column(text_col).to_pylist()):
            toks = _tok(t, stem) if t else []
            if not toks:
                continue
            cnt = np.fromiter(Counter(toks).values(), dtype=np.float64)
            p = cnt / cnt.sum()
            ntok[i] = len(toks)
            ent[i] = round(float(-(p * np.log(p)).sum()), 6)
        return pa.table({id_col: ids,
                         "n_tokens": pa.array(ntok),
                         "entropy": pa.array(ent)})

    return ds.select_columns([id_col, text_col]) \
        .map_batches(fn, batch_format="pyarrow")


_BC_CACHE: dict = {}  # worker-global broadcast cache (corpus_divergence)


def corpus_divergence(ds, *, stem: bool = False, id_col: str = "doc_id",
                      text_col: str = "text"):
    """Per-document KL divergence KL(p_doc || p_corpus) over unigram
    token distributions — the DSIR-style importance signal (Xie et al.
    2023 select data by distributional closeness; here the 'target' is
    the corpus itself, so high KL flags outlier documents). Output
    (id, n_tokens, kl), zero-token docs scoring 0. Every doc token is
    in the corpus vocabulary by construction, so the ratio is always
    finite.

    Scale shape: pass 1 builds corpus unigram counts with per-batch
    Counter partials + ONE groupby(term) — vocabulary-sized output
    (~10^7 entries for web corpora, the standard unigram-LM budget),
    collected once and broadcast via ray.put. Pass 2 is a per-batch
    map; the broadcast dict deserializes once per worker (module-global
    cache keyed by object ref), not per batch."""
    import ray
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch.column(text_col).to_pylist():
            if t:
                c.update(_tok(t, stem))
        keys = sorted(c)
        return pa.table({
            "term": pa.array(keys, type=pa.string()),
            "c_p": pa.array([c[k] for k in keys], type=pa.int64()),
        })

    cu = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("term").aggregate(Sum("c_p", alias_name="n")) \
        .to_pandas()
    total = float(cu["n"].sum())
    log_pc = {w: float(np.log(n / total))
              for w, n in zip(cu["term"], cu["n"])}
    ref = ray.put(log_pc)

    def score(batch: pa.Table) -> pa.Table:
        lp = _BC_CACHE.get(ref.hex())
        if lp is None:
            _BC_CACHE.clear()  # at most one resident table per worker
            lp = _BC_CACHE[ref.hex()] = ray.get(ref)
        ids = batch.column(id_col)
        ntok = np.zeros(batch.num_rows, dtype=np.int64)
        kl = np.zeros(batch.num_rows, dtype=np.float64)
        for i, t in enumerate(batch.column(text_col).to_pylist()):
            toks = _tok(t, stem) if t else []
            if not toks:
                continue
            c = Counter(toks)
            cnt = np.fromiter(c.values(), dtype=np.float64)
            lpc = np.fromiter((lp[w] for w in c), dtype=np.float64,
                              count=len(c))
            p = cnt / cnt.sum()
            ntok[i] = len(toks)
            kl[i] = round(float((p * (np.log(p) - lpc)).sum()), 6)
        return pa.table({id_col: ids,
                         "n_tokens": pa.array(ntok),
                         "kl": pa.array(kl)})

    return ds.select_columns([id_col, text_col]) \
        .map_batches(score, batch_format="pyarrow")


def skipgram_counts(ds, *, window: int = 2, top_n: int = 50,
                    stem: bool = False):
    """Corpus (center, context) skip-gram pair counts within ``window``
    token positions, both directions — the word2vec/GloVe co-occurrence
    statistic. Ordered pairs: each position pair (i, i+d), d = 1..w,
    contributes 'a b' AND 'b a'. Top-N by (count DESC, pair ASC).

    Scale shape: same as bigram_counts — per-batch Counter partials,
    ONE groupby(pair) over (pair, partial) rows, block-local head
    before the driver head (groupby makes pairs block-unique, so a
    block head supersets the global head)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch.column("text").to_pylist():
            if not t:
                continue
            toks = _tok(t, stem)
            for d in range(1, window + 1):
                # tuple keys: format once per DISTINCT pair at table
                # build, not once per occurrence
                c.update(zip(toks, toks[d:]))
                c.update(zip(toks[d:], toks))
        keys = sorted(c)
        return pa.table({
            "skipgram": pa.array([f"{a} {b}" for a, b in keys],
                                 type=pa.string()),
            "c_p": pa.array([c[k] for k in keys], type=pa.int64()),
        })

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("skipgram").aggregate(Sum("c_p", alias_name="n"))

    def block_head(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        return pa.Table.from_pandas(
            df.sort_values(["n", "skipgram"], ascending=[False, True])
              .head(top_n), preserve_index=False)

    out = agg.map_batches(block_head, batch_size=None,
                          batch_format="pyarrow").to_pandas()
    return out.sort_values(["n", "skipgram"], ascending=[False, True]) \
        .head(top_n).reset_index(drop=True)


def pmi_topk(ds, *, min_count: int = 5, top_n: int = 50,
             stem: bool = False):
    """Top-N collocations by pointwise mutual information:
    pmi(x, y) = ln( p(x y) / (p(x) p(y)) ) with p(x y) = c_xy / N2
    (N2 = total bigram count) and p(x) = c_x / N1 (N1 = total token
    count), over bigrams with c_xy >= min_count (the classic
    Church & Hanks 1990 statistic with a count floor). Output
    (bigram, n, pmi), ordered (pmi DESC, bigram ASC), pmi rounded to
    6 places before ranking so Ray and SQL tie-break identically.

    Scale shape: ONE counting pass emits both bigram partials and
    unigram partials (w2 = '' sentinel rows, the doc_lm_score trick)
    through a single groupby((w1, w2)) — the aggregated table is
    materialized (bigram-vocabulary-sized, far below corpus size).
    Unigram counts (vocab-sized) are collected and broadcast once via
    ray.put; the pmi map + block-local head run distributed over the
    aggregated bigram blocks, so the full bigram vocabulary never
    lands on the driver — it sees at most blocks x N rows."""
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch.column("text").to_pylist():
            if not t:
                continue
            toks = _tok(t, stem)
            c.update(zip(toks, toks[1:]))
            c.update((w, "") for w in toks)
        keys = sorted(c)
        return pa.table({
            "w1": pa.array([k[0] for k in keys], type=pa.string()),
            "w2": pa.array([k[1] for k in keys], type=pa.string()),
            "c_p": pa.array([c[k] for k in keys], type=pa.int64()),
        })

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(["w1", "w2"]).aggregate(Sum("c_p", alias_name="n")) \
        .materialize()

    # unigram side: vocab-sized collect -> broadcast
    def only_uni(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.equal(batch.column("w2"), ""))

    uni = agg.map_batches(only_uni, batch_format="pyarrow").to_pandas()
    n1 = float(uni["n"].sum())
    cx = dict(zip(uni["w1"], uni["n"].astype(float)))

    # N2 = total bigram occurrences: tiny per-block partial sums
    def part_n2(batch: pa.Table) -> pa.Table:
        m = pc.invert(pc.equal(batch.column("w2"), ""))
        s = pc.sum(pc.filter(batch.column("n"), m)).as_py() or 0
        return pa.table({"s": pa.array([s], type=pa.int64())})

    n2 = float(agg.map_batches(part_n2, batch_size=None,
                               batch_format="pyarrow")
               .to_pandas()["s"].sum())

    ref = ray.put((cx, n1, n2))

    def pmi_block(batch: pa.Table) -> pa.Table:
        got = _BC_CACHE.get(ref.hex())
        if got is None:
            _BC_CACHE.clear()
            got = _BC_CACHE[ref.hex()] = ray.get(ref)
        cxd, n1_, n2_ = got
        m = pc.and_(pc.invert(pc.equal(batch.column("w2"), "")),
                    pc.greater_equal(batch.column("n"), min_count))
        b = batch.filter(m)
        if b.num_rows == 0:
            return pa.table({"bigram": pa.array([], type=pa.string()),
                             "n": pa.array([], type=pa.int64()),
                             "pmi": pa.array([], type=pa.float64())})
        w1 = b.column("w1").to_pylist()
        w2 = b.column("w2").to_pylist()
        n = b.column("n").to_numpy().astype(np.float64)
        ca = np.fromiter((cxd[w] for w in w1), dtype=np.float64,
                         count=len(w1))
        cb = np.fromiter((cxd[w] for w in w2), dtype=np.float64,
                         count=len(w2))
        pmi = np.round(np.log((n / n2_) / ((ca / n1_) * (cb / n1_))), 6)
        df = pd.DataFrame({
            "bigram": [f"{a} {b_}" for a, b_ in zip(w1, w2)],
            "n": n.astype(np.int64), "pmi": pmi})
        df = df.sort_values(["pmi", "bigram"], ascending=[False, True]) \
            .head(top_n)
        return pa.Table.from_pandas(df, preserve_index=False)

    out = agg.map_batches(pmi_block, batch_size=None,
                          batch_format="pyarrow").to_pandas()
    return out.sort_values(["pmi", "bigram"], ascending=[False, True]) \
        .head(top_n).reset_index(drop=True)


def _lev_capped(a: str, b: str, cap: int) -> int:
    """Levenshtein distance, early-exit > cap (returns cap + 1). Classic
    banded DP — candidate sets are tiny after the deletion-key filter,
    so per-pair cost is irrelevant; correctness is the contract."""
    if abs(len(a) - len(b)) > cap:
        return cap + 1
    if a == b:
        return 0
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        best = i
        for j, cb in enumerate(b, 1):
            c = min(prev[j] + 1, cur[j - 1] + 1,
                    prev[j - 1] + (ca != cb))
            cur.append(c)
            best = min(best, c)
        if best > cap:
            return cap + 1
        prev = cur
    return prev[-1]


def fuzzy_term_match(ds, probes: list[str], *, max_dist: int = 1,
                     stem: bool = False, text_col: str = "text"):
    """Fuzzy dictionary lookup (spell-correction candidates): for each
    probe string, every corpus vocabulary term within Levenshtein
    distance <= max_dist. Output (probe, term, dist).

    Scale shape (SymSpell deletion-neighborhood): the probes' deletion
    variants ({p} ∪ del_k(p)) are built ONCE on the driver and
    broadcast; each batch intersects its own terms' deletion variants
    against that dict — a map-side semi-join, NO vocabulary shuffle.
    Candidates are verified with an exact capped DP in the same task;
    only verified (probe, term, dist) rows — a near-empty stream —
    reach the final dedup groupby. At a 10^8-term web vocabulary this
    stays one pass over the corpus + a trivial shuffle, vs the O(V x P)
    cross join a naive form would need."""
    def _del_variants(w: str, k: int) -> set[str]:
        out = {w}
        frontier = {w}
        for _ in range(k):
            frontier = {v[:i] + v[i + 1:]
                        for v in frontier for i in range(len(v))}
            out |= frontier
        return out

    probe_of: dict[str, list[str]] = {}
    for p in probes:
        pl = p.lower()
        for v in _del_variants(pl, max_dist):
            probe_of.setdefault(v, []).append(pl)

    def fn(batch: pa.Table) -> pa.Table:
        seen: set[str] = set()
        for t in batch.column(text_col).to_pylist():
            if t:
                seen.update(_tok(t, stem))
        out_p, out_t, out_d = [], [], []
        for term in seen:
            cands: set[str] = set()
            for v in _del_variants(term, max_dist):
                got = probe_of.get(v)
                if got:
                    cands.update(got)
            for p in sorted(cands):
                d = _lev_capped(p, term, max_dist)
                if d <= max_dist:
                    out_p.append(p)
                    out_t.append(term)
                    out_d.append(d)
        return pa.table({"probe": pa.array(out_p, type=pa.string()),
                         "term": pa.array(out_t, type=pa.string()),
                         "dist": pa.array(out_d, type=pa.int64())})

    from ray.data.aggregate import Min

    # dedupe across batches (a term occurs in many blocks); dist is a
    # function of (probe, term), so Min is just "pick the one value"
    return ds.select_columns([text_col]) \
        .map_batches(fn, batch_format="pyarrow") \
        .groupby(["probe", "term"]).aggregate(Min("dist", alias_name="dist"))


def facet_counts(ds, query: str, *, facets: tuple[str, ...] = ("lang",
                 "source"), stem: bool = False, text_col: str = "text"):
    """Faceted search: how the full result set of a query distributes
    over attribute dimensions (the sidebar counts of a search UI).
    Output (*facets, n) — matching docs (>= 1 query term, OR
    semantics) counted per facet combination.

    Scale shape: one pass over the corpus — per batch, the match mask
    and a pa.Table.group_by partial count; only (facet-combo, partial)
    rows reach the final groupby, so the shuffle is O(distinct facet
    combos), not O(hits). A serving deployment would instead intersect
    the posting union with a doc->facet columnstore; the scan form is
    the batch-analytics twin of that and is what a 100 TB refresh job
    would run."""
    from ray.data.aggregate import Sum

    qset = set(_tok(query, stem))
    if not qset:
        raise ValueError("empty query")

    def fn(batch: pa.Table) -> pa.Table:
        mask = [bool(t) and not qset.isdisjoint(_tok(t, stem))
                for t in batch.column(text_col).to_pylist()]
        sel = batch.filter(pa.array(mask, type=pa.bool_())) \
            .select(list(facets))
        return sel.group_by(list(facets)).aggregate([([], "count_all")]) \
            .rename_columns(list(facets) + ["n_p"])

    out = ds.select_columns(list(facets) + [text_col]) \
        .map_batches(fn, batch_format="pyarrow") \
        .groupby(list(facets)).aggregate(Sum("n_p", alias_name="n"))
    return out


def kwic_snippets(ds, query: str, *, window: int = 3, stem: bool = False,
                  id_col: str = "doc_id", text_col: str = "text"):
    """Keyword-in-context snippet generation — the result-page excerpt
    a search engine shows under each hit. For every doc containing at
    least one query term: pos = the FIRST token position (0-based)
    holding any query term, snippet = the tokens within ``window`` of
    it joined by single spaces. Output (id, pos, snippet).

    Scale shape: per-batch map over the hit docs, no shuffle; in a
    serving deployment this runs over only the top-k docs' texts
    (hydrated from the doc store), here it is exposed as a corpus scan
    so the oracle covers every matching doc."""
    qterms = set(_tok(query, stem))
    if not qterms:
        raise ValueError("empty query")

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        out_ids, out_pos, out_sn = [], [], []
        for did, t in zip(ids, batch.column(text_col).to_pylist()):
            toks = _tok(t, stem) if t else []
            if not toks:
                continue
            hit = np.flatnonzero(np.isin(
                np.asarray(toks, dtype=object), list(qterms)))
            if not len(hit):
                continue
            i0 = int(hit[0])
            lo = max(0, i0 - window)
            out_ids.append(did)
            out_pos.append(i0)
            out_sn.append(" ".join(toks[lo:i0 + window + 1]))
        return pa.table({id_col: pa.array(out_ids, type=pa.int64()),
                         "pos": pa.array(out_pos, type=pa.int64()),
                         "snippet": pa.array(out_sn, type=pa.string())})

    return ds.select_columns([id_col, text_col]) \
        .map_batches(fn, batch_format="pyarrow")


# --------------------------------------------------------------------------
# positional queries: exact phrase match / term proximity
# --------------------------------------------------------------------------

def phrase_match(ds, phrase: str, *, stem: bool = False,
                 id_col: str = "doc_id", text_col: str = "text"):
    """Exact token-sequence (phrase) occurrence count per document —
    the positional-query capability of a fulltext engine, run as a
    distributed scan (the right shape for one-off phrase analytics;
    repeated phrase QUERIES would warrant a positional index). A match
    at position i means tokens[i : i+k] equals the phrase's k tokens;
    overlapping matches all count. Output (id, n_matches), only docs
    with >= 1 match.

    Scale shape: embarrassingly parallel per-batch map, no shuffle;
    per doc the k-way comparison is a numpy shifted-AND, not a Python
    position loop."""
    ph = _tok(phrase, stem)
    k = len(ph)
    if k == 0:
        raise ValueError("empty phrase")

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        out_ids, out_n = [], []
        for did, t in zip(ids, batch.column(text_col).to_pylist()):
            toks = _tok(t, stem) if t else []
            n = len(toks) - k + 1
            if n <= 0:
                continue
            arr = np.asarray(toks, dtype=object)
            m = arr[0:n] == ph[0]
            for j in range(1, k):
                m = m & (arr[j:n + j] == ph[j])
            c = int(np.count_nonzero(m))
            if c:
                out_ids.append(did)
                out_n.append(c)
        return pa.table({id_col: pa.array(out_ids, type=pa.int64()),
                         "n_matches": pa.array(out_n, type=pa.int64())})

    return ds.select_columns([id_col, text_col]) \
        .map_batches(fn, batch_format="pyarrow")


def term_proximity(ds, term_a: str, term_b: str, *, stem: bool = False,
                   id_col: str = "doc_id", text_col: str = "text"):
    """Minimum token distance between two terms per document — the
    proximity-ranking signal (NEAR/k retrieval). Output
    (id, min_dist), only docs containing BOTH terms; min_dist is the
    smallest |pos_a - pos_b| over all occurrence pairs.

    Scale shape: per-batch map, no shuffle; per doc the nearest-pair
    search is a sorted searchsorted merge, O((na+nb) log), never the
    na x nb grid."""
    ta = _tok(term_a, stem)
    tb = _tok(term_b, stem)
    if len(ta) != 1 or len(tb) != 1:
        raise ValueError("term_proximity takes single terms")
    wa, wb = ta[0], tb[0]

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        out_ids, out_d = [], []
        for did, t in zip(ids, batch.column(text_col).to_pylist()):
            toks = _tok(t, stem) if t else []
            if not toks:
                continue
            arr = np.asarray(toks, dtype=object)
            pa_ = np.flatnonzero(arr == wa)
            pb_ = np.flatnonzero(arr == wb)
            if not len(pa_) or not len(pb_):
                continue
            # for each a-position, the nearest b-position via insertion
            j = np.searchsorted(pb_, pa_)
            lo = np.clip(j - 1, 0, len(pb_) - 1)
            hi = np.clip(j, 0, len(pb_) - 1)
            best = int(np.minimum(np.abs(pa_ - pb_[lo]),
                                  np.abs(pa_ - pb_[hi])).min())
            out_ids.append(did)
            out_d.append(best)
        return pa.table({id_col: pa.array(out_ids, type=pa.int64()),
                         "min_dist": pa.array(out_d, type=pa.int64())})

    return ds.select_columns([id_col, text_col]) \
        .map_batches(fn, batch_format="pyarrow")


# --------------------------------------------------------------------------
# field-weighted retrieval (BM25F)
# --------------------------------------------------------------------------

def bm25f_scores(ds, query: str, *, title_len: int = 8,
                 w_title: float = 2.0, w_body: float = 1.0,
                 k1: float = 1.2, b: float = 0.75, stem: bool = False,
                 round_to: int = 6):
    """BM25F field-weighted scoring (Robertson/Zaragoza's simple
    weighted variant): each doc splits into a title field (first
    ``title_len`` tokens) and a body field; per-term weighted tf
    tf~ = w_title*tf_title + w_body*tf_body and weighted doc length
    dl~ = w_title*|title| + w_body*|body| feed ONE shared saturation
    (tf~*(k1+1)) / (tf~ + k1*(1-b+b*dl~/avg dl~)) with the corpus idf
    ln(1+(N-df+.5)/(df+.5)) — so a title hit is worth w_title body
    hits BEFORE saturation, which is what distinguishes BM25F from a
    per-field score sum. Returns (doc_id, score) for every doc
    matching >= 1 query term.

    Scale shape: pass 1 pre-reduces (N, sum dl~, per-query-term df)
    inside each batch and shuffles only (|q|+1) rows per block; pass 2
    is map-only (a doc never spans batches, so its full score is
    batch-local) — no posting shuffle, no driver materialization."""
    from ray.data.aggregate import Sum

    from rse_ray.functions.tokenizer import tokenize

    qtf = Counter(tokenize(query, stem=stem))
    qterms = sorted(qtf)
    wt, wb = float(w_title), float(w_body)

    def _fields(text: str):
        toks = _tok(text, stem)
        return toks[:title_len], toks[title_len:]

    def stats_partial(batch: pa.Table) -> pa.Table:
        n = 0
        swdl = 0.0
        df_c = Counter()
        for t in batch.column("text").to_pylist():
            if t is None:
                continue
            title, body = _fields(t)
            if not title:          # empty doc: outside N/avgdl (SQL dl CTE)
                continue
            n += 1
            swdl += wt * len(title) + wb * len(body)
            seen = set(title)
            seen.update(body)
            df_c.update(q for q in qterms if q in seen)
        return pa.table(
            {"term": pa.array([""] + qterms, type=pa.string()),
             "df_p": pa.array([0] + [df_c[q] for q in qterms],
                              type=pa.int64()),
             "n_p": pa.array([n] + [0] * len(qterms), type=pa.int64()),
             "wdl_p": pa.array([swdl] + [0.0] * len(qterms),
                               type=pa.float64())}
        )

    st = ds.map_batches(stats_partial, batch_format="pyarrow") \
        .groupby("term") \
        .aggregate(Sum("df_p", alias_name="df"),
                   Sum("n_p", alias_name="n"),
                   Sum("wdl_p", alias_name="wdl")).take_all()
    n_docs = sum(int(r["n"]) for r in st)
    sum_wdl = sum(float(r["wdl"]) for r in st)
    df = {r["term"]: int(r["df"]) for r in st if r["term"]}
    if n_docs == 0:
        import ray.data
        return ray.data.from_arrow(pa.table(
            {"doc_id": pa.array([], type=pa.int64()),
             "score": pa.array([], type=pa.float64())}))
    avgdl = sum_wdl / n_docs
    # (term, qtf*idf) for terms present in the corpus, sorted for a
    # deterministic accumulation order
    qw = [(t, qtf[t] * math.log(1 + (n_docs - df[t] + 0.5) / (df[t] + 0.5)))
          for t in qterms if df.get(t, 0) > 0]

    def score(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        out_ids, out_scores = [], []
        for did, t in zip(ids, batch.column("text").to_pylist()):
            if t is None:
                continue
            title, body = _fields(t)
            if not title:
                continue
            ct, cb = Counter(title), Counter(body)
            wdl = wt * len(title) + wb * len(body)
            norm = k1 * (1 - b + b * wdl / avgdl)
            s = 0.0
            hit = False
            for term, w in qw:
                wtf = wt * ct.get(term, 0) + wb * cb.get(term, 0)
                if wtf > 0:
                    hit = True
                    s += w * (wtf * (k1 + 1)) / (wtf + norm)
            if hit:
                out_ids.append(int(did))
                out_scores.append(round(s, round_to))
        return pa.table(
            {"doc_id": pa.array(out_ids, type=pa.int64()),
             "score": pa.array(out_scores, type=pa.float64())}
        )

    return ds.map_batches(score, batch_format="pyarrow")


def normalize_text(ds, *, id_col: str = "doc_id", text_col: str = "text"):
    """Unicode text normalization — the cleanup stage a web corpus runs
    before tokenization/dedup: NFC-compose, strip combining accents
    (NFD -> drop marks, the strip_accents contract), lowercase, and
    collapse runs of whitespace to single spaces. Map-only, per-batch;
    null text passes through as null (the cleanup must not invent
    rows). The DuckDB twin is
    trim(regexp_replace(lower(strip_accents(nfc_normalize(x))),
    '\\s+', ' ', 'g')) — parity of nfc_normalize/strip_accents with
    unicodedata verified over composed/decomposed/compat samples."""
    import re
    import unicodedata

    ws = re.compile(r"\s+")

    def fn(batch: pa.Table) -> pa.Table:
        out = []
        for t in batch.column(text_col).to_pylist():
            if t is None:
                out.append(None)
                continue
            s = unicodedata.normalize("NFC", t)
            s = "".join(c for c in unicodedata.normalize("NFD", s)
                        if not unicodedata.combining(c))
            out.append(ws.sub(" ", s.lower()).strip())
        return pa.table(
            {id_col: batch.column(id_col),
             "norm_text": pa.array(out, type=pa.string())}
        )

    return ds.map_batches(fn, batch_format="pyarrow")


# --------------------------------------------------------------------------
# PII scan / redaction (training-data hygiene)
# --------------------------------------------------------------------------

# RE2 syntax on BOTH sides: pyarrow's count/replace_substring_regex and
# DuckDB's regexp_* are all RE2, so one literal pattern string is the
# whole cross-engine contract (no dialect translation layer needed).
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
# phones: optional +, then >=9 chars of digit/space/dash ending in a
# digit. The class excludes '.' and '@' so IPv4s and e-mail local parts
# can never be swallowed; greedy extension over spaces is identical in
# both RE2 engines, so parity holds even on adjacent numbers.
PII_PHONE = r"\+?\d[\d\-\s]{7,}\d"


def pii_counts(ds, *, id_col: str = "doc_id", text_col: str = "text"):
    """Per-doc PII hit counts: (doc_id, n_emails, n_ipv4, n_phones).

    The scrubbing pass every LLM training corpus runs before release.
    Pure zero-copy Arrow — pc.count_substring_regex is a vectorized RE2
    scan per batch, no Python loop, no materialization. At 100 TB this
    is a map-only stage: no shuffle, streams block by block.
    """

    def fn(batch: pa.Table) -> pa.Table:
        t = batch.column(text_col)
        return pa.table({
            id_col: batch.column(id_col),
            "n_emails": pc.cast(pc.count_substring_regex(t, PII_EMAIL),
                                pa.int64()),
            "n_ipv4": pc.cast(pc.count_substring_regex(t, PII_IPV4),
                              pa.int64()),
            "n_phones": pc.cast(pc.count_substring_regex(t, PII_PHONE),
                                pa.int64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def pii_redact(ds, *, id_col: str = "doc_id", text_col: str = "text"):
    """Replace PII spans with typed placeholders: (doc_id, red_text).

    Replacement ORDER is part of the contract (email -> ipv4 -> phone):
    once e-mails are gone the phone pattern cannot touch their digits,
    and the IPv4 dots fence it off from addresses. The DuckDB twin
    nests regexp_replace(..., 'g') in the same order.
    """

    def fn(batch: pa.Table) -> pa.Table:
        t = batch.column(text_col)
        t = pc.replace_substring_regex(t, PII_EMAIL, "<EMAIL>")
        t = pc.replace_substring_regex(t, PII_IPV4, "<IP>")
        t = pc.replace_substring_regex(t, PII_PHONE, "<PHONE>")
        return pa.table({id_col: batch.column(id_col), "red_text": t})

    return ds.map_batches(fn, batch_format="pyarrow")


# --------------------------------------------------------------------------
# Gopher-style quality filter rules
# --------------------------------------------------------------------------

# rule thresholds (Rae et al. 2021 'Gopher', Table A1 shape — bounds
# tightened to discriminate on the synthetic corpus); shared verbatim
# with the SQL twin
GOPHER_MIN_WORDS = 30
GOPHER_MAX_WORDS = 90
GOPHER_MIN_MWL = 4.0
GOPHER_MAX_MWL = 5.0
GOPHER_MIN_ALPHA = 0.8
GOPHER_MAX_SYMBOL = 0.05


def gopher_rules(ds, *, id_col: str = "doc_id", text_col: str = "text"):
    """Per-doc Gopher quality-rule evaluation: word-count bounds, mean
    word length bounds, alphabetic-word fraction, and symbol-to-word
    ratio ('#' plus '...' hits), with the conjunctive ``passes`` flag.
    -> (doc_id, n_words, mean_word_len, frac_alpha_words,
        symbol_ratio, passes).

    Metrics are REPORTED at 6dp but ``passes`` is decided on the
    unrounded doubles in both engines (sum-of-int/int divisions are
    bit-identical IEEE, so the flag cannot straddle the rounding).
    Zero-word docs are dropped (no denominators). Map-only; the
    per-batch loop is the same split cost every text op here pays."""
    import re

    ell = re.compile(r"\.\.\.")
    alpha = re.compile(r"[A-Za-z]")

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        o_id, o_n, o_mwl, o_fa, o_sym, o_pass = [], [], [], [], [], []
        for i, t in zip(ids, texts):
            if t is None:
                continue
            words = t.split()
            n = len(words)
            if n == 0:
                continue
            mwl = sum(len(w) for w in words) / n
            fa = sum(1 for w in words if alpha.search(w)) / n
            sym = (t.count("#") + len(ell.findall(t))) / n
            o_id.append(i)
            o_n.append(n)
            o_mwl.append(mwl)
            o_fa.append(fa)
            o_sym.append(sym)
            o_pass.append(
                GOPHER_MIN_WORDS <= n <= GOPHER_MAX_WORDS
                and GOPHER_MIN_MWL <= mwl <= GOPHER_MAX_MWL
                and fa >= GOPHER_MIN_ALPHA
                and sym <= GOPHER_MAX_SYMBOL)

        def r6(vals):
            a = np.asarray(vals, dtype=np.float64)
            return np.copysign(np.floor(np.abs(a) * 1e6 + 0.5), a) / 1e6

        return pa.table({
            id_col: pa.array(o_id, type=pa.int64()),
            "n_words": pa.array(o_n, type=pa.int64()),
            "mean_word_len": pa.array(r6(o_mwl), type=pa.float64()),
            "frac_alpha_words": pa.array(r6(o_fa), type=pa.float64()),
            "symbol_ratio": pa.array(r6(o_sym), type=pa.float64()),
            "passes": pa.array(o_pass, type=pa.bool_()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


# --------------------------------------------------------------------------
# MLM masking plan (BERT 80/10/10)
# --------------------------------------------------------------------------

def mlm_mask_plan(ds, *, rate_pct: int = 15, id_col: str = "doc_id",
                  text_col: str = "text"):
    """Deterministic BERT-style masking plan: select ``rate_pct``% of
    token positions and assign the classic 80/10/10 action split —
    replace with [MASK], replace with a deterministically chosen
    token from the same doc (which, as in BERT's uniform draw, may
    coincide with the original), or keep. Output one row per
    SELECTED position: (doc_id, pos, token, action, replacement).

    Selection/action keys on md5's high-8-bytes-little-endian of
    "doc_id:pos" — DuckDB's md5_number_lower, the repo's pinned
    content-hash convention (same as SimHash) — so the exact plan is
    SQL-reproducible: h%100 < rate selects, (h//100)%10 buckets the
    action (0-7 mask / 8 random / 9 keep), and the 'random' token is
    the doc's own token at (h//1000) % dl. Per-token md5 is the only
    per-row Python (the price of a hash both engines can compute; a
    splitmix64 over (doc_id<<20|pos) is the vectorized variant when
    SQL parity isn't needed). Map-only: the plan streams out block by
    block, no shuffle."""

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        o_id, o_pos, o_tok, o_act, o_rep = [], [], [], [], []
        for i, t in zip(ids, texts):
            if t is None:
                continue
            toks = [w for w in t.lower().split() if w]
            dl = len(toks)
            for p, tok in enumerate(toks):
                h = int.from_bytes(
                    hashlib.md5(f"{i}:{p}".encode()).digest()[8:],
                    "little")
                if h % 100 >= rate_pct:
                    continue
                bucket = (h // 100) % 10
                if bucket < 8:
                    act, rep = "mask", "[MASK]"
                elif bucket == 8:
                    act, rep = "random", toks[(h // 1000) % dl]
                else:
                    act, rep = "keep", tok
                o_id.append(i)
                o_pos.append(p)
                o_tok.append(tok)
                o_act.append(act)
                o_rep.append(rep)
        return pa.table({
            id_col: pa.array(o_id, type=pa.int64()),
            "pos": pa.array(o_pos, type=pa.int64()),
            "token": pa.array(o_tok, type=pa.string()),
            "action": pa.array(o_act, type=pa.string()),
            "replacement": pa.array(o_rep, type=pa.string()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def codec_size_report(ds, *, stem: bool = False):
    """Per-term wire-size comparison of the two posting codecs over
    the REAL encoders: sort each term's doc_ids, delta them (first
    value absolute), and report len(varint_encode(deltas)) vs
    len(for_encode(deltas)) -> (term, n_postings, varint_bytes,
    for_bytes). The numbers come from encoding, not from a size
    formula, so the SQL twin (closed-form byte counts from bin()
    widths) independently cross-checks the byte layout itself — a
    format-stability oracle, not just a size estimate. One
    groupby(term) shuffle of (term, doc_id) rows."""
    from rse_ray.functions.codec import for_encode, varint_encode
    from rse_ray.pipelines.text import postings as _postings

    p = _postings(ds, stem=stem).select_columns(["term", "doc_id"])

    def report(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g["doc_id"].to_numpy(np.int64)).astype(np.uint64)
        deltas = np.diff(ids, prepend=np.uint64(0))
        return pd.DataFrame({
            "term": [g["term"].iloc[0]],
            "n_postings": [np.int64(len(ids))],
            "varint_bytes": [np.int64(len(varint_encode(deltas)))],
            "for_bytes": [np.int64(len(for_encode(deltas)))],
        })

    return p.groupby("term").map_groups(report, batch_format="pandas")


# --------------------------------------------------------------------------
# Aho-Corasick multi-phrase scan (blocklist matching)
# --------------------------------------------------------------------------

class PhraseScanner:
    """Actor-pool stage: count occurrences of a fixed phrase list in
    every doc with one Aho-Corasick pass — the blocklist/compliance
    scan a corpus release runs, where the phrase list is thousands of
    entries and per-phrase rescanning (p regex passes per doc) is the
    anti-pattern. The automaton (goto/fail/output tables) is built
    ONCE per actor in __init__ (the per-worker expensive-init
    discipline, ST3); __call__ streams batches through it. Emits one
    row per (doc, phrase) with >= 1 hit: (doc_id, phrase, n).

    Matches are counted at every end position (AC's native semantics).
    For phrase lists whose entries cannot self-overlap (e.g.
    multi-word phrases with distinct words) this equals the per-phrase
    non-overlapping count, which is what the SQL twin
    (len(regexp_extract_all(text, lit))) expresses — the fixture list
    keeps that property and the pytest pins the overlap behavior.

    The per-character transition loop is Python (this container has no
    C automaton lib); at fleet scale you swap pyahocorasick/hyperscan
    in behind the SAME actor interface — the distribution shape
    (build-once actor pool, map-only streaming) is the part this
    operator pins, and it already beats p sequential regex passes once
    the phrase list outgrows a handful."""

    def __init__(self, phrases: list[str]) -> None:
        self.phrases = list(phrases)
        # build goto / fail / output (classic AC over dict transitions)
        self.goto: list[dict[str, int]] = [{}]
        self.out: list[list[int]] = [[]]
        for pi, p in enumerate(self.phrases):
            s = 0
            for ch in p:
                nxt = self.goto[s].get(ch)
                if nxt is None:
                    self.goto.append({})
                    self.out.append([])
                    nxt = len(self.goto) - 1
                    self.goto[s][ch] = nxt
                s = nxt
            self.out[s].append(pi)
        self.fail = [0] * len(self.goto)
        from collections import deque

        q = deque()
        for s in self.goto[0].values():
            q.append(s)
        while q:
            r = q.popleft()
            for ch, s in self.goto[r].items():
                q.append(s)
                f = self.fail[r]
                while f and ch not in self.goto[f]:
                    f = self.fail[f]
                self.fail[s] = self.goto[f].get(ch, 0)
                if self.fail[s] == s:
                    self.fail[s] = 0
                self.out[s] = self.out[s] + self.out[self.fail[s]]

    def _scan(self, text: str, counts: np.ndarray) -> None:
        s = 0
        goto, fail, out = self.goto, self.fail, self.out
        for ch in text:
            while s and ch not in goto[s]:
                s = fail[s]
            s = goto[s].get(ch, 0)
            if out[s]:
                for pi in out[s]:
                    counts[pi] += 1

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        o_id, o_ph, o_n = [], [], []
        counts = np.zeros(len(self.phrases), dtype=np.int64)
        for i, t in zip(ids, texts):
            if t is None:
                continue
            counts[:] = 0
            self._scan(t, counts)
            for pi in np.flatnonzero(counts):
                o_id.append(i)
                o_ph.append(self.phrases[pi])
                o_n.append(int(counts[pi]))
        return pa.table({
            "doc_id": pa.array(o_id, type=pa.int64()),
            "phrase": pa.array(o_ph, type=pa.string()),
            "n": pa.array(o_n, type=pa.int64()),
        })


def phrase_scan(ds, phrases: list[str], *, concurrency: int = 4,
                batch_size: int = 256):
    """Blocklist scan over the corpus: actor pool of PhraseScanner
    (automaton built once per actor), map-only, no shuffle."""
    return ds.map_batches(
        PhraseScanner, fn_constructor_args=(phrases,),
        concurrency=concurrency, batch_size=batch_size,
        batch_format="pyarrow")


def content_chunks(ds, *, window: int = 16, mod_bits: int = 5,
                   id_col: str = "doc_id", text_col: str = "text"):
    """Content-defined chunking of each doc's byte stream
    (hashing.cdc_boundaries): -> (doc_id, chunk_idx, start, length),
    0-based byte offsets. The storage-dedup shape: identical text runs
    produce identical chunks regardless of their position, so a
    downstream exact dedup on (md5 of chunk) dedupes at sub-document
    granularity. Map-only explode; chunk boundaries are local, so the
    operator shards perfectly."""
    from rse_ray.functions.hashing import cdc_boundaries

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        o_id, o_idx, o_start, o_len = [], [], [], []
        for i, t in zip(ids, texts):
            if t is None:
                continue
            prev = 0
            for j, cut in enumerate(cdc_boundaries(
                    t.encode("utf-8"), window, mod_bits)):
                o_id.append(i)
                o_idx.append(j)
                o_start.append(prev)
                o_len.append(cut - prev)
                prev = cut
        return pa.table({
            id_col: pa.array(o_id, type=pa.int64()),
            "chunk_idx": pa.array(o_idx, type=pa.int64()),
            "start": pa.array(o_start, type=pa.int64()),
            "length": pa.array(o_len, type=pa.int64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def dup_chunks(ds, *, window: int = 16, mod_bits: int = 5,
               id_col: str = "doc_id", text_col: str = "text"):
    """Chunk-level exact dedup — the payoff of content_chunks: md5
    each CDC chunk's bytes and report every chunk CONTENT that occurs
    more than once corpus-wide, with its first owner:
    (rep_doc_id, rep_chunk_idx, n_copies), order (doc_id, chunk_idx).
    One explode + one groupby(md5) shuffle of (hash, doc, idx) rows —
    chunk text itself never travels (the representative is named by
    position, not by payload), so the shuffle is fixed-width no matter
    how large chunks are."""
    from rse_ray.functions.hashing import cdc_boundaries

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        o_h, o_id, o_idx = [], [], []
        for i, t in zip(ids, texts):
            if t is None:
                continue
            data = t.encode("utf-8")
            prev = 0
            for j, cut in enumerate(cdc_boundaries(data, window,
                                                   mod_bits)):
                o_h.append(hashlib.md5(data[prev:cut]).hexdigest())
                o_id.append(i)
                o_idx.append(j)
                prev = cut
        return pa.table({
            "h": pa.array(o_h, type=pa.string()),
            id_col: pa.array(o_id, type=pa.int64()),
            "chunk_idx": pa.array(o_idx, type=pa.int64()),
        })

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"rep_doc_id": pd.array([], dtype="int64"),
                                 "rep_chunk_idx": pd.array([], dtype="int64"),
                                 "n_copies": pd.array([], dtype="int64")})
        g = g.sort_values([id_col, "chunk_idx"])
        return pd.DataFrame({
            "rep_doc_id": [int(g[id_col].iloc[0])],
            "rep_chunk_idx": [int(g["chunk_idx"].iloc[0])],
            "n_copies": [np.int64(len(g))],
        })

    return (ds.map_batches(explode, batch_format="pyarrow")
            .groupby("h").map_groups(fold, batch_format="pandas"))


# --------------------------------------------------------------------------
# training-mix planning (LLaMA-style source reweighting)
# --------------------------------------------------------------------------

def _mix_weights(sources: list[str]) -> dict[str, float]:
    """Pinned source weights: 1 + (numeric suffix % 4) — deterministic
    from the name, mirrored literally in the SQL twin."""
    return {s: 1.0 + (int(s[3:]) % 4) for s in sources}


def mix_plan(ds, *, id_col: str = "doc_id", text_col: str = "text",
             source_col: str = "source", round_to: int = 6):
    """Training-mix plan: given per-source sampling weights, compute
    each source's target token share and the repetition factor that
    realizes it over this corpus — the 'epochs per source' table a
    LLaMA-style data recipe publishes. repeat_factor_s =
    (w_s / sum w) * T / tokens_s, so sum_s(repeat * tokens) == T: the
    plan reshapes the mix at constant total token budget.
    -> (source, n_docs, n_tokens, target_share, repeat_factor).
    Shuffle: one (source, n_docs, n_tokens) row per batch-source."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        srcs = batch.column(source_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        agg: dict[str, list[int]] = {}
        for s, t in zip(srcs, texts):
            a = agg.setdefault(s, [0, 0])
            a[0] += 1
            a[1] += 0 if t is None else len(
                [w for w in t.lower().split() if w])
        ks = sorted(agg)
        return pa.table({
            source_col: pa.array(ks, type=pa.string()),
            "nd": pa.array([agg[k][0] for k in ks], type=pa.int64()),
            "nt": pa.array([agg[k][1] for k in ks], type=pa.int64()),
        })

    g = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(source_col).aggregate(
            Sum("nd", alias_name="n_docs"),
            Sum("nt", alias_name="n_tokens")).to_pandas() \
        .sort_values(source_col).reset_index(drop=True)
    g = g[g["n_tokens"] > 0]
    w = _mix_weights(list(g[source_col]))
    sw = sum(w[s] for s in g[source_col])
    T = float(g["n_tokens"].sum())
    share = np.array([w[s] / sw for s in g[source_col]])
    rep = share * T / g["n_tokens"].to_numpy(dtype=np.float64)
    return pd.DataFrame({
        "source": g[source_col],
        "n_docs": g["n_docs"].astype("int64"),
        "n_tokens": g["n_tokens"].astype("int64"),
        "target_share": np.round(share, round_to),
        "repeat_factor": np.round(rep, round_to),
    })


def _unrounded_factors(plan) -> dict[str, float]:
    """plan -> per-source UNROUNDED repeat factor (the plan's 6dp
    column is for reporting; repeat decisions pin on the raw double)."""
    w = _mix_weights(list(plan["source"]))
    sw = sum(w.values())
    T = float(plan["n_tokens"].sum())
    return {s: (w[s] / sw) * T / nt
            for s, nt in zip(plan["source"], plan["n_tokens"])}


def _repeat_count(r: float | None, doc_id: int) -> int:
    """floor(r) + 1 with probability frac(r), decided by
    md5_number_lower('mix:'||doc_id) — the single rounding convention
    both mix_epochs and corpus_release (and their SQL twins) share."""
    import struct

    if r is None:
        return 0
    base = int(np.floor(r))
    thr = int(np.floor((r - base) * 1_000_000 + 0.5))
    h = struct.unpack(
        "<Q", hashlib.md5(f"mix:{doc_id}".encode()).digest()[8:])[0]
    return base + (1 if h % 1_000_000 < thr else 0)


def mix_epochs(ds, *, id_col: str = "doc_id", text_col: str = "text",
               source_col: str = "source"):
    """Materialization plan for mix_plan: per doc, the integer number
    of times it enters the training stream — floor(repeat_factor) plus
    one with probability frac(repeat_factor), decided by the
    md5_number_lower('mix:'||doc_id) hash so the stochastic rounding
    is exactly reproducible (and unbiased across docs).
    -> (doc_id, n_repeats). The plan row set is tiny (one per source)
    and broadcast into the map closure."""
    plan = mix_plan(ds, id_col=id_col, text_col=text_col,
                    source_col=source_col)
    rep = _unrounded_factors(plan)

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        srcs = batch.column(source_col).to_pylist()
        out = [_repeat_count(rep.get(s), i) for i, s in zip(ids, srcs)]
        return pa.table({
            id_col: batch.column(id_col),
            "n_repeats": pa.array(out, type=pa.int64()),
        })

    return ds.select_columns([id_col, source_col]) \
        .map_batches(fn, batch_format="pyarrow")


def corpus_release(ds):
    """The end-to-end training-corpus release pipeline, composed from
    this module's verified stage SEMANTICS — the chain a real 100 TB
    release runs, as one lazy Dataset graph:

        quality gate (gopher_rules.passes)
          -> exact text dedup (keep min doc_id)
          -> PII redaction (typed placeholders, text path)
          -> mix_epochs repetition factors RECOMPUTED over survivors

    Output: (doc_id, lang, source, n_words, n_repeats) for surviving
    docs with n_repeats >= 1.

    Shape note (this replaced a 3x-hash_join draft measured at 27 s
    @sf0.1): the quality gate, redaction and repeat assignment are all
    PER-ROW functions, so they run INLINE in map stages — joins would
    pay two all-to-all exchanges each to attach what a map can
    compute. The only corpus-wide exchanges left are the dedup groupby
    and mix_plan's per-source aggregate (20 rows, driver-folded and
    broadcast back into the final map's closure — legitimately
    broadcast-small at any corpus size, unlike per-doc tables)."""
    import re

    alpha = re.compile(r"[A-Za-z]")
    ell = re.compile(r"\.\.\.")

    def quality_gate(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_pylist()
        texts = b.column("text").to_pylist()
        langs = b.column("lang").to_pylist()
        srcs = b.column("source").to_pylist()
        rows = {"doc_id": [], "text": [], "lang": [], "source": [],
                "n_words": []}
        for i, t, lg, s in zip(ids, texts, langs, srcs):
            if t is None:
                continue
            words = t.split()
            n = len(words)
            if n == 0:
                continue
            mwl = sum(len(w) for w in words) / n
            fa = sum(1 for w in words if alpha.search(w)) / n
            sym = (t.count("#") + len(ell.findall(t))) / n
            if not (GOPHER_MIN_WORDS <= n <= GOPHER_MAX_WORDS
                    and GOPHER_MIN_MWL <= mwl <= GOPHER_MAX_MWL
                    and fa >= GOPHER_MIN_ALPHA
                    and sym <= GOPHER_MAX_SYMBOL):
                continue
            rows["doc_id"].append(i)
            rows["text"].append(t)
            rows["lang"].append(lg)
            rows["source"].append(s)
            rows["n_words"].append(n)
        return pa.table({
            "doc_id": pa.array(rows["doc_id"], type=pa.int64()),
            "text": pa.array(rows["text"], type=pa.string()),
            "lang": pa.array(rows["lang"], type=pa.string()),
            "source": pa.array(rows["source"], type=pa.string()),
            "n_words": pa.array(rows["n_words"], type=pa.int64()),
        })

    survivors = ds.map_batches(quality_gate, batch_format="pyarrow")
    # checkpoint: two consumers below (mix stats + final map) would
    # re-execute the gate+dedup chain once each otherwise; at 100 TB
    # this is the write_parquet checkpoint, here its in-memory stand-in
    deduped = exact_dedup_keep(survivors).materialize()

    # per-source repeat factors over the SURVIVOR set (tiny aggregate,
    # genuinely broadcast-safe: one row per source)
    rep = _unrounded_factors(mix_plan(deduped))

    def finish(b: pa.Table) -> pa.Table:
        # redaction (pii_redact) belongs to the payload WRITE, which
        # this metadata gate doesn't perform — running the three RE2
        # replaces here and discarding them would be three wasted
        # corpus scans; pii_redact's own oracle owns that contract
        ids = b.column("doc_id").to_pylist()
        srcs = b.column("source").to_pylist()
        nrep = [_repeat_count(rep.get(s), i)
                for i, s in zip(ids, srcs)]
        out = pa.table({
            "doc_id": b.column("doc_id"),
            "lang": b.column("lang"),
            "source": b.column("source"),
            "n_words": b.column("n_words"),
            "n_repeats": pa.array(nrep, type=pa.int64()),
        })
        return out.filter(pc.greater_equal(out.column("n_repeats"),
                                           pa.scalar(1)))

    return deduped.map_batches(finish, batch_format="pyarrow")


def exact_dedup_keep(ds, *, key_col: str = "text",
                     id_col: str = "doc_id"):
    """exact_dedup's keep-min-id rule, but returning the surviving
    FULL rows (not the (id, n_copies) report): one groupby(text-hash)
    shuffle, survivors keep every column."""

    def add_hash(batch: pa.Table) -> pa.Table:
        vals = batch.column(key_col).to_pylist()
        # null keys group TOGETHER but never with the literal string
        # "None" (SQL's PARTITION BY md5(text) groups NULLs likewise)
        hs = ["\x00NULL" if v is None else
              hashlib.md5(v.encode("utf-8")).hexdigest()
              for v in vals]
        return batch.append_column("_h", pa.array(hs, type=pa.string()))

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(id_col).head(1).drop(columns=["_h"])

    return (ds.map_batches(add_hash, batch_format="pyarrow")
            .groupby("_h").map_groups(keep_first, batch_format="pandas"))


def freq_spectrum(ds, *, stem: bool = False):
    """Token frequency-of-frequencies (the Good-Turing / Zipf spectrum
    N_r = how many vocabulary types occur exactly r times): term
    counts pre-reduced per batch, one groupby(term) to global counts,
    then a second tiny groupby(count). -> (n_occurrences, n_types),
    the table smoothing estimators and vocabulary-growth models
    consume. Shuffle: (term, partial) rows then (r, 1) rows."""
    from collections import Counter

    from ray.data.aggregate import Sum

    from rse_ray.functions.tokenizer import tokenize

    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch.column("text").to_pylist():
            if t is not None:
                c.update(tokenize(t, stem=stem))
        ks = sorted(c)
        return pa.table({
            "term": pa.array(ks, type=pa.string()),
            "n": pa.array([c[k] for k in ks], type=pa.int64()),
        })

    counts = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("term").aggregate(Sum("n", alias_name="n"))

    def to_spectrum(batch: pa.Table) -> pa.Table:
        return pa.table({
            "n_occurrences": batch.column("n"),
            "one": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
        })

    return counts.map_batches(to_spectrum, batch_format="pyarrow") \
        .groupby("n_occurrences") \
        .aggregate(Sum("one", alias_name="n_types"))


def feature_hashing(ds, *, dim: int = 64, stem: bool = False):
    """Feature-hashing doc vectors (Weinberger et al. 2009, the
    'hashing trick'): each term maps to bucket
    md5_number_lower('fh:'||term) % dim with sign from the hash's next
    bit, vector[b] = sum of sign * tf — a fixed-width embedding with
    NO vocabulary state, the input featurizer for linear classifiers /
    sketch-based similarity at corpus scale. Values stay integers
    (sign-weighted counts), so the contract is exact, no fp rounding.
    Output exploded as (doc_id, dim, value), zero entries omitted.
    Map-only; the vocabulary never ships anywhere."""
    from collections import Counter

    from rse_ray.functions.tokenizer import tokenize
    from rse_ray.pipelines.sketch import _md5_u64

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        o_id, o_dim, o_val = [], [], []
        for i, t in zip(ids, texts):
            if t is None:
                continue
            c = Counter(tokenize(t, stem=stem))
            if not c:
                continue
            terms = sorted(c)
            h = _md5_u64([f"fh:{w}" for w in terms])
            bucket = (h % np.uint64(dim)).astype(np.int64)
            sign = np.where(((h // np.uint64(dim))
                             % np.uint64(2)) == 1, 1, -1)
            tf = np.fromiter((c[w] for w in terms), dtype=np.int64,
                             count=len(terms))
            vec = np.zeros(dim, dtype=np.int64)
            np.add.at(vec, bucket, sign * tf)
            nz = np.flatnonzero(vec)
            o_id.extend([i] * len(nz))
            o_dim.extend(int(d) for d in nz)
            o_val.extend(int(v) for v in vec[nz])
        return pa.table({
            "doc_id": pa.array(o_id, type=pa.int64()),
            "dim": pa.array(o_dim, type=pa.int64()),
            "value": pa.array(o_val, type=pa.int64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def auto_stopwords(ds, *, ratio: float = 0.5, stem: bool = False):
    """Corpus-derived stopword detection: terms whose document
    frequency exceeds ``ratio`` of the corpus (the collection-specific
    stopword list Lucene's commongrams / SEO pipelines compute, rather
    than a hand-curated one). -> (term, df, df_ratio) for qualifying
    terms. Pre-aggregated (term, doc_id) dedup inside batches, one
    groupby(term) shuffle, then a tiny N-broadcast finish."""
    from ray.data.aggregate import Sum

    from rse_ray.functions.tokenizer import tokenize

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        seen: set = set()
        for i, t in zip(ids, texts):
            if t is None:
                continue
            for w in set(tokenize(t, stem=stem)):
                seen.add((w, i))
        terms = sorted({w for w, _ in seen})
        cnt = {w: 0 for w in terms}
        for w, _ in seen:
            cnt[w] += 1
        return pa.table({
            "term": pa.array(terms, type=pa.string()),
            "df_p": pa.array([cnt[w] for w in terms], type=pa.int64()),
        })

    df = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("term").aggregate(Sum("df_p", alias_name="df"))
    n_docs = ds.map_batches(
        lambda b: pa.table({"n": pa.array(
            [sum(1 for t in b.column("text").to_pylist()
                 if t is not None)], type=pa.int64())}),
        batch_format="pyarrow").sum("n")

    def finish(batch: pa.Table) -> pa.Table:
        d = batch.column("df").to_numpy()
        r = d / float(n_docs)
        keep = r >= ratio
        return pa.table({
            "term": batch.column("term").filter(pa.array(keep)),
            "df": pa.array(d[keep], type=pa.int64()),
            "df_ratio": pa.array(np.round(r[keep], 6),
                                 type=pa.float64()),
        })

    return df.map_batches(finish, batch_format="pyarrow")


def sentence_split(ds, *, id_col: str = "doc_id",
                   text_col: str = "text"):
    """Sentence segmentation under a pinned RE2-safe contract (no
    lookbehind in RE2, so the rule is 'a sentence is a maximal run of
    non-terminators followed by >=1 terminator', trailing fragment
    included): sentences = regexp matches of [^.!?]+[.!?]* with
    whitespace trimmed, empties dropped. -> (doc_id, sent_idx,
    sentence). Map-only explode; both engines run the SAME pattern."""
    import re

    rx = re.compile(r"[^.!?]+[.!?]*")

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        o_id, o_idx, o_s = [], [], []
        for i, t in zip(ids, texts):
            if t is None:
                continue
            j = 0
            for m in rx.finditer(t):
                s = m.group(0).strip()
                if not s:
                    continue
                o_id.append(i)
                o_idx.append(j)
                o_s.append(s)
                j += 1
        return pa.table({
            id_col: pa.array(o_id, type=pa.int64()),
            "sent_idx": pa.array(o_idx, type=pa.int64()),
            "sentence": pa.array(o_s, type=pa.string()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def significant_terms(ds, *, fg_lang: str = "en", stem: bool = False):
    """Elasticsearch-style significant-terms aggregation: terms that
    are over-represented in a foreground subset (here: docs with
    lang == ``fg_lang``) relative to the whole corpus, scored with the
    JLH heuristic score = (fg_pct - bg_pct) * (fg_pct / bg_pct) where
    fg_pct = df_fg / n_fg and bg_pct = df_all / n_all (the background
    is the SUPERSET, the ES convention). -> (term, df_fg, df_all,
    score) for terms with df_fg > 0, score rounded to 6 places.

    Scale shape: one counting pass emits per-batch (term, df_fg
    partial, df_all partial) rows (distinct doc per term inside the
    batch; doc_ids never repeat across batches so partials sum
    exactly); ONE groupby(term) shuffle; the two corpus sizes are tiny
    scalar aggregates broadcast into the finish map."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        langs = batch.column("lang").to_pylist()
        fg: Counter = Counter()
        allc: Counter = Counter()
        for _i, t, lg in zip(ids, texts, langs):
            if t is None:
                continue
            terms = set(_tok(t, stem))
            allc.update(terms)
            if lg == fg_lang:
                fg.update(terms)
        keys = sorted(allc)
        return pa.table({
            "term": pa.array(keys, type=pa.string()),
            "f_p": pa.array([fg.get(k, 0) for k in keys],
                            type=pa.int64()),
            "a_p": pa.array([allc[k] for k in keys], type=pa.int64()),
        })

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("term").aggregate(Sum("f_p", alias_name="df_fg"),
                                   Sum("a_p", alias_name="df_all"))

    def sizes(batch: pa.Table) -> pa.Table:
        texts = batch.column("text")
        langs = batch.column("lang")
        ok = pc.is_valid(texts)
        n_all = int(pc.sum(ok.cast(pa.int64())).as_py() or 0)
        isfg = pc.and_(ok, pc.equal(langs, fg_lang))
        n_fg = int(pc.sum(isfg.cast(pa.int64())).as_py() or 0)
        return pa.table({"n_all": pa.array([n_all], type=pa.int64()),
                         "n_fg": pa.array([n_fg], type=pa.int64())})

    tot = ds.map_batches(sizes, batch_format="pyarrow")
    n_all = float(tot.sum("n_all"))
    n_fg = float(tot.sum("n_fg"))

    def finish(batch: pa.Table) -> pa.Table:
        if "term" not in batch.column_names or batch.num_rows == 0:
            return pa.table({"term": pa.array([], type=pa.string()),
                             "df_fg": pa.array([], type=pa.int64()),
                             "df_all": pa.array([], type=pa.int64()),
                             "score": pa.array([], type=pa.float64())})
        dfg = batch.column("df_fg").to_numpy().astype(np.float64)
        dall = batch.column("df_all").to_numpy().astype(np.float64)
        keep = dfg > 0
        fg_pct = dfg[keep] / n_fg
        bg_pct = dall[keep] / n_all
        score = (fg_pct - bg_pct) * (fg_pct / bg_pct)
        k = pa.array(keep)
        return pa.table({
            "term": batch.column("term").filter(k),
            "df_fg": batch.column("df_fg").filter(k),
            "df_all": batch.column("df_all").filter(k),
            "score": pa.array(np.round(score, 6), type=pa.float64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def llr_bigrams(ds, *, min_count: int = 5, top_n: int = 50,
                stem: bool = False):
    """Top-N collocations by Dunning's log-likelihood ratio (Dunning
    1993, the statistic Mahout/ES used for collocation mining; unlike
    PMI it does not over-reward rare pairs). For bigram (a b) with
    contingency k11 = c(a b), k12 = c(a *) - k11, k21 = c(* b) - k11,
    k22 = N - k11 - k12 - k21:

        llr = 2 * sum_ij [ k_ij * ln(k_ij / e_ij) ]   (0 ln 0 := 0)

    with e_ij the independence expectation row_i * col_j / N. Output
    (bigram, n, llr), llr rounded to 6 places BEFORE ranking, ordered
    (llr DESC, bigram ASC), bigrams with n >= min_count.

    Scale shape: identical to pmi_topk — one counting pass, ONE
    groupby((w1, w2)) shuffle producing the bigram-vocabulary-sized
    aggregate; the positional marginals c(a *) / c(* b) are derived
    FROM that aggregate by two vocab-sized groupby sums, collected and
    broadcast (vocab << corpus); scoring + block-local head run
    distributed over the aggregated blocks, so at most blocks x N rows
    reach the driver."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch.column("text").to_pylist():
            if not t:
                continue
            toks = _tok(t, stem)
            c.update(zip(toks, toks[1:]))
        keys = sorted(c)
        return pa.table({
            "w1": pa.array([k[0] for k in keys], type=pa.string()),
            "w2": pa.array([k[1] for k in keys], type=pa.string()),
            "c_p": pa.array([c[k] for k in keys], type=pa.int64()),
        })

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(["w1", "w2"]).aggregate(Sum("c_p", alias_name="n")) \
        .materialize()

    # positional marginals from the aggregate itself: vocab-sized
    r_df = agg.groupby("w1").aggregate(Sum("n", alias_name="r")) \
        .to_pandas()
    c_df = agg.groupby("w2").aggregate(Sum("n", alias_name="c")) \
        .to_pandas()
    row_of = dict(zip(r_df["w1"], r_df["r"].astype(np.float64)))
    col_of = dict(zip(c_df["w2"], c_df["c"].astype(np.float64)))
    n_tot = float(r_df["r"].sum())

    def score(batch: pa.Table) -> pa.Table:
        if "w1" not in batch.column_names or batch.num_rows == 0:
            return pa.table({"bigram": pa.array([], type=pa.string()),
                             "n": pa.array([], type=pa.int64()),
                             "llr": pa.array([], type=pa.float64())})
        w1 = batch.column("w1").to_pylist()
        w2 = batch.column("w2").to_pylist()
        n = batch.column("n").to_numpy().astype(np.float64)
        keep = n >= min_count
        if not keep.any():
            return pa.table({"bigram": pa.array([], type=pa.string()),
                             "n": pa.array([], type=pa.int64()),
                             "llr": pa.array([], type=pa.float64())})
        k11 = n[keep]
        r1 = np.array([row_of[w] for w, k in zip(w1, keep) if k])
        c1 = np.array([col_of[w] for w, k in zip(w2, keep) if k])
        k12 = r1 - k11
        k21 = c1 - k11
        k22 = n_tot - r1 - c1 + k11

        def term(k: np.ndarray, e: np.ndarray) -> np.ndarray:
            out = np.zeros_like(k)
            pos = k > 0
            out[pos] = k[pos] * np.log(k[pos] / e[pos])
            return out

        e11 = r1 * c1 / n_tot
        e12 = r1 * (n_tot - c1) / n_tot
        e21 = (n_tot - r1) * c1 / n_tot
        e22 = (n_tot - r1) * (n_tot - c1) / n_tot
        llr = 2.0 * (term(k11, e11) + term(k12, e12)
                     + term(k21, e21) + term(k22, e22))
        grams = [f"{a} {b}" for a, b, k in zip(w1, w2, keep) if k]
        return pa.table({
            "bigram": pa.array(grams, type=pa.string()),
            "n": pa.array(k11.astype(np.int64), type=pa.int64()),
            "llr": pa.array(np.round(llr, 6), type=pa.float64()),
        })

    def block_head(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        return pa.Table.from_pandas(
            df.sort_values(["llr", "bigram"], ascending=[False, True])
              .head(top_n), preserve_index=False)

    out = agg.map_batches(score, batch_format="pyarrow") \
        .map_batches(block_head, batch_size=None,
                     batch_format="pyarrow").to_pandas()
    return out.sort_values(["llr", "bigram"],
                           ascending=[False, True]) \
        .head(top_n).reset_index(drop=True)


def bool_query_match(ds, query: str, *, stem: bool = False):
    """Boolean retrieval under the functions.queryparse DSL
    (TERM / AND / OR / NOT / parens, NOT > AND > OR): docs whose
    token SET satisfies the expression. -> (doc_id) of matches; docs
    with null text never match (they have no token set to test).

    Scale shape: embarrassingly parallel — the expression is compiled
    once on the driver; each batch builds one boolean presence array
    per distinct query term (vectorized set membership) and evaluates
    the tree ONCE over arrays with & | ~, so cost is O(tokens +
    q_terms * docs) per batch with no shuffle at all. (An index-backed
    variant for selective conjunctions is bm25_conjunctive — this is
    the scan path a query planner falls back to.)"""
    from rse_ray.functions.queryparse import parse, query_terms

    ast = parse(query, stem=stem)
    qterms = sorted(query_terms(ast))

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        n = len(texts)
        pres = {t: np.zeros(n, dtype=bool) for t in qterms}
        valid = np.zeros(n, dtype=bool)
        for i, t in enumerate(texts):
            if t is None:
                continue
            valid[i] = True
            toks = set(_tok(t, stem))
            for q in qterms:
                if q in toks:
                    pres[q][i] = True

        def ev(node) -> np.ndarray:
            kind = node[0]
            if kind == "term":
                return pres[node[1]]
            if kind == "not":
                return ~ev(node[1])
            if kind == "and":
                out = ev(node[1][0])
                for child in node[1][1:]:
                    out = out & ev(child)
                return out
            out = ev(node[1][0])
            for child in node[1][1:]:
                out = out | ev(child)
            return out

        keep = ev(ast) & valid
        return pa.table({"doc_id": batch.column("doc_id")
                         .filter(pa.array(keep))})

    return ds.map_batches(fn, batch_format="pyarrow")


def percolate(ds, queries: list[str], *, stem: bool = False):
    """Reverse search (the Elasticsearch percolator): a BANK of
    boolean DSL queries is registered up front; each incoming doc is
    matched against every query. -> (doc_id, query_id) for each
    (doc, query) match, query_id = position in ``queries``.

    Scale shape: the bank is compiled ONCE on the driver and shipped
    in the task closure; per batch, each doc's token set is built
    once and one presence array per DISTINCT term across the whole
    bank is shared by all query evaluations (the percolator's
    amortization: q queries cost O(tokens + distinct_terms * docs +
    q * nodes), not q tokenizations). Map-only — no shuffle. A bank
    too big for a closure becomes the actor-pool variant (bank in
    __init__), same math."""
    from rse_ray.functions.queryparse import parse, query_terms

    asts = [parse(q, stem=stem) for q in queries]
    all_terms = sorted(set().union(*(query_terms(a) for a in asts)))

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        texts = batch.column("text").to_pylist()
        n = len(texts)
        pres = {t: np.zeros(n, dtype=bool) for t in all_terms}
        valid = np.zeros(n, dtype=bool)
        for i, t in enumerate(texts):
            if t is None:
                continue
            valid[i] = True
            toks = set(_tok(t, stem))
            for q in all_terms:
                if q in toks:
                    pres[q][i] = True

        def ev(node) -> np.ndarray:
            kind = node[0]
            if kind == "term":
                return pres[node[1]]
            if kind == "not":
                return ~ev(node[1])
            if kind == "and":
                out = ev(node[1][0])
                for child in node[1][1:]:
                    out = out & ev(child)
                return out
            out = ev(node[1][0])
            for child in node[1][1:]:
                out = out | ev(child)
            return out

        out_doc, out_q = [], []
        for qi, ast in enumerate(asts):
            hit = ev(ast) & valid
            matched = ids[hit]
            out_doc.append(matched)
            out_q.append(np.full(len(matched), qi, dtype=np.int64))
        return pa.table({
            "doc_id": pa.array(np.concatenate(out_doc)
                               if out_doc else [], type=pa.int64()),
            "query_id": pa.array(np.concatenate(out_q)
                                 if out_q else [], type=pa.int64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def lsa_power_iteration(ds, *, iters: int = 3, stem: bool = False):
    """Dominant latent-semantic direction of the corpus: power
    iteration on the Gram matrix of the tf-idf doc-term matrix A
    (w = tf * ln(1 + N/df)), x_k = A^T (A x_{k-1}) from x_0 = all
    ones, WITHOUT intermediate normalization (both engines then share
    one float contract; magnitudes stay < ~1e13 for realistic shapes
    and doubles carry that exactly enough for the 6dp output pin).
    -> (term, loading) with loading = x_iters / ||x_iters||, the
    corpus's first right singular direction — the LSA topic axis.

    Scale shape: per iteration ONE distributed pass over documents —
    each batch tokenizes its docs once, computes y_d = sum_t w_dt x_t
    with the broadcast vocab vector, immediately accumulates the
    per-batch partial x'_t = sum_d w_dt y_d, and ships (term, partial)
    rows through a vocab-sized groupby(term); the driver only ever
    holds vocab-sized vectors (the same contract as pmi's unigram
    broadcast). df/N come from one prior counting pass."""
    import ray
    from ray.data.aggregate import Sum

    # pass 0: document frequencies + corpus size
    def dfp(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        n = 0
        for t in batch.column("text").to_pylist():
            if t is None:
                continue
            n += 1
            c.update(set(_tok(t, stem)))
        keys = sorted(c)
        return pa.table({
            "term": pa.array(keys + ["\x00N"], type=pa.string()),
            "c_p": pa.array([c[k] for k in keys] + [n],
                            type=pa.int64()),
        })

    dfa = ds.map_batches(dfp, batch_format="pyarrow") \
        .groupby("term").aggregate(Sum("c_p", alias_name="c")) \
        .to_pandas()
    n_docs = float(dfa.loc[dfa["term"] == "\x00N", "c"].iloc[0])
    dfm = dfa[dfa["term"] != "\x00N"]
    idf = {t: math.log(1.0 + n_docs / float(d))
           for t, d in zip(dfm["term"], dfm["c"])}
    x = {t: 1.0 for t in idf}

    for _ in range(iters):
        # one object-store broadcast per iteration (vocab-sized);
        # tasks read it zero-copy instead of re-shipping per closure
        x_ref = ray.put((idf, x))

        def it(batch: pa.Table, _xr=x_ref) -> pa.Table:
            idf_v, xv = ray.get(_xr)
            acc: dict[str, float] = {}
            for t in batch.column("text").to_pylist():
                if t is None:
                    continue
                tfc = Counter(_tok(t, stem))
                y = 0.0
                for term, tf in tfc.items():
                    y += tf * idf_v[term] * xv[term]
                for term, tf in tfc.items():
                    acc[term] = acc.get(term, 0.0) \
                        + tf * idf_v[term] * y
            keys = sorted(acc)
            return pa.table({
                "term": pa.array(keys, type=pa.string()),
                "v_p": pa.array([acc[k] for k in keys],
                                type=pa.float64()),
            })

        nx = ds.map_batches(it, batch_format="pyarrow") \
            .groupby("term").aggregate(Sum("v_p", alias_name="v")) \
            .to_pandas()
        x = dict(zip(nx["term"], nx["v"].astype(float)))
        # terms absent from x (df == 0 impossible; but keep total map)
        for t in idf:
            x.setdefault(t, 0.0)

    keys = sorted(x)
    vec = np.array([x[k] for k in keys], dtype=np.float64)
    nrm = math.sqrt(float(np.sum(vec * vec)))
    return pa.table({
        "term": pa.array(keys, type=pa.string()),
        "loading": pa.array(np.round(vec / nrm, 6),
                            type=pa.float64()),
    })


def rag_chunk_search(ds, query_id: int = 0, *, dim: int = 64,
                     chunk: int = 8, overlap: int = 2, k: int = 10,
                     stem: bool = False):
    """End-to-end RAG retrieval composition: chunk every doc with the
    doc_chunks token-window rule (windows of ``chunk`` tokens every
    ``chunk - overlap``), embed each chunk AND the query doc's full
    text with the exact feature-hashing vectorizer (sign-weighted
    integer counts — no vocabulary state), and return the top-k
    chunks by cosine. Dot products and squared norms stay INTEGERS,
    so ranking ties are exact and broken by (doc_id, chunk_id); cos =
    dot / (sqrt(qq) * sqrt(cc)) rounded to 6 places. The query doc's
    own chunks are excluded. -> (doc_id, chunk_id, cos).

    Scale shape: query vector via the distributed is_in fetch; one
    map-only pass chunks + embeds + scores each batch against the
    broadcast dim-sized query vector and keeps a block-local top-k;
    the driver reduces blocks x k rows (the brute_force_knn shape —
    an IVF-bucketed variant drops in when chunk count outgrows the
    scan)."""
    from rse_ray.pipelines.sketch import _md5_u64

    if overlap >= chunk:
        raise ValueError("overlap must be < chunk")
    stride = chunk - overlap

    def hash_vec(tokens: list[str]) -> np.ndarray:
        vec = np.zeros(dim, dtype=np.int64)
        if not tokens:
            return vec
        c = Counter(tokens)
        terms = sorted(c)
        h = _md5_u64([f"fh:{w}" for w in terms])
        bucket = (h % np.uint64(dim)).astype(np.int64)
        sign = np.where(((h // np.uint64(dim))
                         % np.uint64(2)) == 1, 1, -1)
        tf = np.fromiter((c[w] for w in terms), dtype=np.int64,
                         count=len(terms))
        np.add.at(vec, bucket, sign * tf)
        return vec

    # query vector: distributed point fetch of the query doc's text
    def pick(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.equal(batch.column("doc_id"),
                                     pa.scalar(query_id, pa.int64())))

    qt = ds.map_batches(pick, batch_format="pyarrow").take_all()
    if not qt or qt[0]["text"] is None:
        raise ValueError(f"query doc {query_id} not found / null")
    qv = hash_vec(_tok(qt[0]["text"], stem))
    qq = float(np.sqrt(float(np.dot(qv, qv))))

    def score(batch: pa.Table) -> pa.Table:
        o_doc, o_chunk, o_cos = [], [], []
        rows = []
        for did, txt in zip(batch.column("doc_id").to_pylist(),
                            batch.column("text").to_pylist()):
            if txt is None or did == query_id:
                continue
            toks = _tok(txt, stem)
            n = len(toks)
            if n == 0:
                continue
            n_chunks = max(1, -(-max(n - overlap, 1) // stride))
            for c in range(n_chunks):
                s = c * stride
                cv = hash_vec(toks[s:s + chunk])
                cc = float(np.dot(cv, cv))
                if cc == 0.0:
                    continue
                dot = float(np.dot(qv, cv))
                cos = dot / (qq * np.sqrt(cc))
                rows.append((cos, did, c))
        rows.sort(key=lambda r: (-r[0], r[1], r[2]))
        for cos, did, c in rows[:k]:
            o_doc.append(did)
            o_chunk.append(c)
            o_cos.append(cos)
        return pa.table({
            "doc_id": pa.array(o_doc, type=pa.int64()),
            "chunk_id": pa.array(o_chunk, type=pa.int64()),
            "cos": pa.array(o_cos, type=pa.float64()),
        })

    local = ds.map_batches(score, batch_format="pyarrow").to_pandas()
    out = local.sort_values(["cos", "doc_id", "chunk_id"],
                            ascending=[False, True, True]) \
        .head(k).reset_index(drop=True)
    out["cos"] = out["cos"].round(6)
    return out


def did_you_mean(ds, queries: list[str], *, stem: bool = False):
    """Search-box spell correction (the ES term suggester contract):
    for each query word, the best vocabulary term within Levenshtein
    distance 1, ranked (distance ASC, document frequency DESC, term
    ASC) — an exact correctly-spelled hit always wins, otherwise the
    most attested near-miss. -> (query, suggestion, dist, df); a
    query with NO candidate within distance 1 emits no row.

    Scale shape: the vocabulary (term, df) aggregate is computed with
    the usual pre-deduped partials + ONE groupby(term); the tiny query
    list rides the task closure and every vocab block scores its own
    terms against all queries (O(vocab x queries) distance checks,
    distributed over blocks); each block keeps at most one candidate
    per query, so the driver reduces blocks x queries rows."""
    from ray.data.aggregate import Sum

    from rse_ray.pipelines.dedup import _edit_distance_le1

    def partial(batch: pa.Table) -> pa.Table:
        seen: dict[str, int] = {}
        for i, t in zip(batch.column("doc_id").to_pylist(),
                        batch.column("text").to_pylist()):
            if t is None:
                continue
            for w in set(_tok(t, stem)):
                seen[w] = seen.get(w, 0) + 1
        keys = sorted(seen)
        return pa.table({
            "term": pa.array(keys, type=pa.string()),
            "df_p": pa.array([seen[k] for k in keys],
                             type=pa.int64()),
        })

    vocab = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("term").aggregate(Sum("df_p", alias_name="df"))

    def score(batch: pa.Table) -> pa.Table:
        empty = pa.table({"query": pa.array([], type=pa.string()),
                          "suggestion": pa.array([], type=pa.string()),
                          "dist": pa.array([], type=pa.int64()),
                          "df": pa.array([], type=pa.int64())})
        if "term" not in batch.column_names or batch.num_rows == 0:
            return empty
        terms = batch.column("term").to_pylist()
        dfs = batch.column("df").to_pylist()
        o_q, o_s, o_d, o_f = [], [], [], []
        for q in queries:
            best = None
            for t, f in zip(terms, dfs):
                if not _edit_distance_le1(q, t):
                    continue
                d = 0 if q == t else 1
                key = (d, -f, t)
                if best is None or key < best[0]:
                    best = (key, t, d, f)
            if best is not None:
                o_q.append(q)
                o_s.append(best[1])
                o_d.append(best[2])
                o_f.append(best[3])
        return pa.table({
            "query": pa.array(o_q, type=pa.string()),
            "suggestion": pa.array(o_s, type=pa.string()),
            "dist": pa.array(o_d, type=pa.int64()),
            "df": pa.array(o_f, type=pa.int64()),
        })

    local = vocab.map_batches(score, batch_format="pyarrow") \
        .to_pandas()
    if local.empty:
        return local
    local = local.sort_values(["query", "dist", "df", "suggestion"],
                              ascending=[True, True, False, True])
    return local.groupby("query", as_index=False).head(1) \
        .reset_index(drop=True)


def hill_tail_index(ds, *, k: int = 20, stem: bool = False):
    """Hill estimator of the term-frequency power-law tail (the
    quantitative companion to zipf_slope): over the corpus term
    counts' top ``k`` order statistics n_1 >= ... >= n_k with
    reference n_{k+1},

        hill = (1/k) * sum_i ln(n_i / n_{k+1}),  alpha = 1 / hill

    Count ties make the top-k VALUE multiset unique even when the
    term order isn't, so the statistic is deterministic. -> one row
    (k, hill, alpha), rounded to 6 places.

    Scale shape: term counts pre-aggregate per batch through ONE
    groupby(term); each aggregated block keeps a local top-(k+1)
    head, so the driver reduces blocks x (k+1) rows — the
    bigram_counts cut."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch.column("text").to_pylist():
            if t:
                c.update(_tok(t, stem))
        keys = sorted(c)
        return pa.table({
            "term": pa.array(keys, type=pa.string()),
            "c_p": pa.array([c[w] for w in keys], type=pa.int64()),
        })

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("term").aggregate(Sum("c_p", alias_name="n"))

    def block_head(batch: pa.Table) -> pa.Table:
        if "n" not in batch.column_names or batch.num_rows == 0:
            return pa.table({"n": pa.array([], type=pa.int64())})
        df = batch.to_pandas().nlargest(k + 1, "n")
        return pa.table({"n": pa.array(df["n"].to_numpy(),
                                       type=pa.int64())})

    top = agg.map_batches(block_head, batch_size=None,
                          batch_format="pyarrow").to_pandas()
    ns = np.sort(top["n"].to_numpy())[::-1]
    if len(ns) < k + 1:
        raise ValueError(f"vocabulary smaller than k+1={k + 1}")
    ref = float(ns[k])
    hill = float(np.sum(np.log(ns[:k] / ref))) / float(k)
    return pa.table({
        "k": pa.array([k], type=pa.int64()),
        "hill": pa.array([np.round(hill, 6)], type=pa.float64()),
        "alpha": pa.array([np.round(1.0 / hill, 6)],
                          type=pa.float64()),
    })


def textrank_keywords(ds, *, iters: int = 3, damping: float = 0.85,
                      top_n: int = 20, stem: bool = False):
    """TextRank keyword extraction (Mihalcea & Tarau 2004): PageRank
    over the UNDIRECTED word co-occurrence graph (window 1 — adjacent
    token pairs; self-loops dropped; edge weight = total adjacency
    count in either direction):

        r_{k+1}(v) = (1-d)/N + d * sum_u w(u,v)/outw(u) * r_k(u)

    from the uniform r_0 = 1/N over N = terms that appear in at least
    one edge. -> top ``top_n`` keywords by (score DESC, term ASC),
    score rounded to 6 places BEFORE ranking (the pmi convention).

    Scale shape: edge weights are bigram partials through ONE
    groupby((u, v)); the rank vector is vocab-sized and broadcast per
    iteration (the lsa_power_iteration contract); each iteration is
    one distributed pass over the aggregated edge blocks emitting
    (v, partial) rows into a vocab-sized groupby."""
    import ray
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch.column("text").to_pylist():
            if not t:
                continue
            toks = _tok(t, stem)
            for a, b in zip(toks, toks[1:]):
                if a == b:
                    continue
                # undirected: store each adjacency under sorted key
                key = (a, b) if a < b else (b, a)
                c[key] += 1
        keys = sorted(c)
        return pa.table({
            "u": pa.array([k[0] for k in keys], type=pa.string()),
            "v": pa.array([k[1] for k in keys], type=pa.string()),
            "w_p": pa.array([c[k] for k in keys], type=pa.int64()),
        })

    edges = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(["u", "v"]).aggregate(Sum("w_p", alias_name="w")) \
        .materialize()

    # out-weights per node (vocab-sized): sum over both endpoints
    def both(batch: pa.Table) -> pa.Table:
        if "u" not in batch.column_names or batch.num_rows == 0:
            return pa.table({"t": pa.array([], type=pa.string()),
                             "ow_p": pa.array([], type=pa.int64())})
        return pa.table({
            "t": pa.concat_arrays([
                batch.column("u").combine_chunks(),
                batch.column("v").combine_chunks()]),
            "ow_p": pa.concat_arrays([
                batch.column("w").combine_chunks(),
                batch.column("w").combine_chunks()]),
        })

    ow = edges.map_batches(both, batch_format="pyarrow") \
        .groupby("t").aggregate(Sum("ow_p", alias_name="ow")) \
        .to_pandas()
    outw = dict(zip(ow["t"], ow["ow"].astype(np.float64)))
    n_nodes = float(len(outw))
    rank = {t: 1.0 / n_nodes for t in outw}

    for _ in range(iters):
        r_ref = ray.put((outw, rank))

        def it(batch: pa.Table, _rr=r_ref) -> pa.Table:
            ow_v, rk = ray.get(_rr)
            acc: dict[str, float] = {}
            if "u" in batch.column_names:
                us = batch.column("u").to_pylist()
                vs = batch.column("v").to_pylist()
                ws = batch.column("w").to_numpy()
                for u, v, w in zip(us, vs, ws):
                    w = float(w)
                    acc[v] = acc.get(v, 0.0) + w / ow_v[u] * rk[u]
                    acc[u] = acc.get(u, 0.0) + w / ow_v[v] * rk[v]
            keys = sorted(acc)
            return pa.table({
                "t": pa.array(keys, type=pa.string()),
                "p": pa.array([acc[k] for k in keys],
                              type=pa.float64()),
            })

        nx = edges.map_batches(it, batch_format="pyarrow") \
            .groupby("t").aggregate(Sum("p", alias_name="p")) \
            .to_pandas()
        flow = dict(zip(nx["t"], nx["p"].astype(np.float64)))
        rank = {t: (1.0 - damping) / n_nodes
                + damping * flow.get(t, 0.0) for t in outw}

    out = pd.DataFrame({"term": sorted(rank)})
    out["score"] = np.round([rank[t] for t in out["term"]], 6)
    return out.sort_values(["score", "term"],
                           ascending=[False, True]) \
        .head(top_n).reset_index(drop=True)


RAKE_STOPWORDS = ("the", "a")


def rake_phrases(ds, *, stopwords: tuple = RAKE_STOPWORDS,
                 top_n: int = 15, stem: bool = False):
    """RAKE keyphrase extraction (Rose et al. 2010): candidate
    phrases are maximal stopword-free token runs; each word scores
    degree/frequency where frequency = occurrences of the word in
    candidate phrases and degree = sum of the lengths of the phrases
    it occurs in (co-occurrence degree including itself); a phrase
    scores the sum of its words' scores. -> top ``top_n`` DISTINCT
    phrases by (score DESC, phrase ASC), score rounded to 6 places
    before ranking.

    Scale shape: pass 1 emits per-batch (word, freq, degree) partials
    (phrases never leave the batch) through ONE groupby(word); the
    vocab-sized stats broadcast into pass 2, which scores each
    batch's phrases, dedups them through a groupby(phrase) keep-first
    (same text => same score, so 'first' is value-stable), and keeps
    a block-local head — the driver reduces blocks x N rows."""
    import ray
    from ray.data.aggregate import Sum

    stop = set(stopwords)

    def doc_phrases(text: str) -> list[list[str]]:
        out, cur = [], []
        for w in _tok(text, stem):
            if w in stop:
                if cur:
                    out.append(cur)
                cur = []
            else:
                cur.append(w)
        if cur:
            out.append(cur)
        return out

    def pass1(batch: pa.Table) -> pa.Table:
        freq: Counter = Counter()
        deg: Counter = Counter()
        for t in batch.column("text").to_pylist():
            if not t:
                continue
            for ph in doc_phrases(t):
                ln = len(ph)
                for w in ph:
                    freq[w] += 1
                    deg[w] += ln
        keys = sorted(freq)
        return pa.table({
            "word": pa.array(keys, type=pa.string()),
            "f_p": pa.array([freq[k] for k in keys], type=pa.int64()),
            "d_p": pa.array([deg[k] for k in keys], type=pa.int64()),
        })

    ws = ds.map_batches(pass1, batch_format="pyarrow") \
        .groupby("word").aggregate(Sum("f_p", alias_name="f"),
                                   Sum("d_p", alias_name="d")) \
        .to_pandas()
    wscore = {w: float(d) / float(f)
              for w, f, d in zip(ws["word"], ws["f"], ws["d"])}
    ws_ref = ray.put(wscore)

    def pass2(batch: pa.Table, _wr=ws_ref) -> pa.Table:
        sc = ray.get(_wr)
        phrases: dict[str, float] = {}
        for t in batch.column("text").to_pylist():
            if not t:
                continue
            for ph in doc_phrases(t):
                key = " ".join(ph)
                if key not in phrases:
                    phrases[key] = sum(sc[w] for w in ph)
        keys = sorted(phrases)
        return pa.table({
            "phrase": pa.array(keys, type=pa.string()),
            "score": pa.array(
                np.round([phrases[k] for k in keys], 6),
                type=pa.float64()),
        })

    def first_row(g: pa.Table) -> pa.Table:
        return g.slice(0, 1)

    def block_head(batch: pa.Table) -> pa.Table:
        if "phrase" not in batch.column_names or batch.num_rows == 0:
            return pa.table({"phrase": pa.array([], type=pa.string()),
                             "score": pa.array([], type=pa.float64())})
        df = batch.to_pandas()
        return pa.Table.from_pandas(
            df.sort_values(["score", "phrase"],
                           ascending=[False, True]).head(top_n),
            preserve_index=False)

    out = ds.map_batches(pass2, batch_format="pyarrow") \
        .groupby("phrase").map_groups(first_row,
                                      batch_format="pyarrow") \
        .map_batches(block_head, batch_size=None,
                     batch_format="pyarrow").to_pandas()
    return out.sort_values(["score", "phrase"],
                           ascending=[False, True]) \
        .head(top_n).reset_index(drop=True)


def bm25_explain(ds, query: str, doc_ids: list[int], *,
                 k1: float = 1.2, b: float = 0.75,
                 stem: bool = False):
    """Lucene-style score EXPLAIN: for each requested doc and each
    distinct query term, the full BM25 evidence — tf, df, idf =
    ln(1 + (N - df + 0.5)/(df + 0.5)), and the term's score
    contribution qtf * idf * tf(k1+1)/(tf + k1(1-b+b*dl/avgdl)) —
    exactly the per-term breakdown the bm25_scores sum is made of.
    -> (doc_id, term, qtf, tf, df, idf, term_score), floats rounded
    to 6 places; (doc, term) pairs with tf = 0 emit no row.

    Scale shape: query-term dfs come from a distributed partial count
    restricted to the query terms (a handful of (term, partial)
    rows); corpus N/avgdl are two scalar aggregates; the target docs
    fetch via the distributed is_in point lookup. The driver only
    ever assembles |docs| x |terms| rows."""
    import ray
    from ray.data.aggregate import Sum

    from rse_ray.functions.tokenizer import tokenize

    qtoks = tokenize(query, stem=stem)
    qtf = Counter(qtoks)
    qterms = sorted(qtf)
    wanted = sorted({int(d) for d in doc_ids})

    def stats(batch: pa.Table) -> pa.Table:
        n_docs = 0
        n_toks = 0
        dfs = Counter()
        for t in batch.column("text").to_pylist():
            if t is None:
                continue
            toks = _tok(t, stem)
            if not toks:
                continue
            n_docs += 1
            n_toks += len(toks)
            for w in set(toks) & set(qterms):
                dfs[w] += 1
        keys = ["\x00N", "\x00T"] + qterms
        vals = [n_docs, n_toks] + [dfs.get(w, 0) for w in qterms]
        return pa.table({"key": pa.array(keys, type=pa.string()),
                         "v_p": pa.array(vals, type=pa.int64())})

    st = ds.map_batches(stats, batch_format="pyarrow") \
        .groupby("key").aggregate(Sum("v_p", alias_name="v")) \
        .to_pandas().set_index("key")["v"]
    n = float(st["\x00N"])
    avgdl = float(st["\x00T"]) / n
    df_of = {w: float(st.get(w, 0)) for w in qterms}

    def pick(batch: pa.Table) -> pa.Table:
        vs = pa.array(wanted, type=batch.column("doc_id").type)
        return batch.filter(pc.is_in(batch.column("doc_id"),
                                     value_set=vs))

    rows = {"doc_id": [], "term": [], "qtf": [], "tf": [], "df": [],
            "idf": [], "term_score": []}
    for bt in ds.map_batches(pick, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow"):
        for did, txt in zip(bt.column("doc_id").to_pylist(),
                            bt.column("text").to_pylist()):
            if txt is None:
                continue
            toks = _tok(txt, stem)
            dl = float(len(toks))
            tfs = Counter(toks)
            for w in qterms:
                tf = float(tfs.get(w, 0))
                if tf == 0 or df_of[w] == 0:
                    continue
                idf = math.log(1 + (n - df_of[w] + 0.5)
                               / (df_of[w] + 0.5))
                score = qtf[w] * idf * (tf * (k1 + 1)) \
                    / (tf + k1 * (1 - b + b * dl / avgdl))
                rows["doc_id"].append(did)
                rows["term"].append(w)
                rows["qtf"].append(qtf[w])
                rows["tf"].append(int(tf))
                rows["df"].append(int(df_of[w]))
                rows["idf"].append(round(idf, 6))
                rows["term_score"].append(round(score, 6))
    return pa.table({
        "doc_id": pa.array(rows["doc_id"], type=pa.int64()),
        "term": pa.array(rows["term"], type=pa.string()),
        "qtf": pa.array(rows["qtf"], type=pa.int64()),
        "tf": pa.array(rows["tf"], type=pa.int64()),
        "df": pa.array(rows["df"], type=pa.int64()),
        "idf": pa.array(rows["idf"], type=pa.float64()),
        "term_score": pa.array(rows["term_score"],
                               type=pa.float64()),
    })


def readability_scores(ds):
    """Flesch reading-ease per doc from three vectorized RE2 counts
    (the shared RE2-contract with the DuckDB twin — both engines run
    the SAME patterns): words = '[A-Za-z]+' matches, syllables =
    '[aeiouyAEIOUY]+' vowel-group matches (the classic cheap syllable
    estimator — a whitespace or consonant boundary ends a group, so
    the corpus-wide count equals the per-word sum), sentences =
    '[.!?]+' runs floored at 1. flesch = 206.835 - 1.015*(words /
    sentences) - 84.6*(syllables/words), 0 when wordless. ->
    (doc_id, n_words, n_syllables, n_sentences, flesch) rounded 4.

    Scale shape: three pc.count_substring_regex kernels per batch —
    zero-copy Arrow, no Python loop, no shuffle."""

    def fn(batch: pa.Table) -> pa.Table:
        t = batch.column("text")
        w = pc.count_substring_regex(t, "[A-Za-z]+").to_numpy(
            zero_copy_only=False).astype(np.float64)
        s = pc.count_substring_regex(t, "[aeiouyAEIOUY]+").to_numpy(
            zero_copy_only=False).astype(np.float64)
        sent = pc.count_substring_regex(t, "[.!?]+").to_numpy(
            zero_copy_only=False).astype(np.float64)
        sent = np.maximum(sent, 1.0)
        with np.errstate(divide="ignore", invalid="ignore"):
            fl = 206.835 - 1.015 * (w / sent) - 84.6 * (s / w)
        fl = np.where(w > 0, fl, 0.0)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_words": pa.array(w.astype(np.int64)),
            "n_syllables": pa.array(s.astype(np.int64)),
            "n_sentences": pa.array(sent.astype(np.int64)),
            # half-AWAY (sign-aware): integer-ratio scores land on
            # exact half boundaries at 4 dp
            "flesch": pa.array(
                np.copysign(np.floor(np.abs(fl) * 1e4 + 0.5), fl)
                / 1e4),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def boilerplate_ngrams(ds, *, n: int = 2, min_docs: int = 3,
                       group_col: str = "source"):
    """Per-source boilerplate screen: whitespace ``n``-gram shingles
    of lower(text) that appear in >= ``min_docs`` DISTINCT docs of
    the SAME source — the template/navigation chrome a webtext
    cleaner strips before training. -> (source, shingle, n_docs).

    Scale shape: each batch explodes docs into per-doc-DEDUPED
    (source, shingle) rows (a shingle repeated inside one doc ships
    once), then ONE groupby(source, shingle) count with the >= cut
    applied in the reduce output. At fleet scale the shuffle carries
    each distinct (doc, shingle) pair exactly once — the same order
    of bytes as the corpus itself, unavoidable because surviving
    shingle TEXT is the output."""
    from ray.data.aggregate import Sum

    def explode(batch: pa.Table) -> pa.Table:
        srcs = batch.column(group_col).to_pylist()
        texts = batch.column("text").to_pylist()
        o_s, o_g = [], []
        for s, t in zip(srcs, texts):
            if t is None:
                continue
            toks = t.lower().split()
            if len(toks) < n:
                continue
            seen = {" ".join(toks[i:i + n])
                    for i in range(len(toks) - n + 1)}
            o_s.extend([s] * len(seen))
            o_g.extend(sorted(seen))
        return pa.table({group_col: pa.array(o_s, type=pa.string()),
                         "shingle": pa.array(o_g, type=pa.string()),
                         "d_p": pa.array(np.ones(len(o_s),
                                                 dtype=np.int64))})

    agg = ds.map_batches(explode, batch_format="pyarrow") \
        .groupby([group_col, "shingle"]) \
        .aggregate(Sum("d_p", alias_name="n_docs"))
    return agg.map_batches(
        lambda b: (lambda t: t.filter(
            pc.greater_equal(pc.cast(t.column("n_docs"), pa.int64()),
                             pa.scalar(min_docs))))(
            pa.table({group_col: b.column(group_col),
                      "shingle": b.column("shingle"),
                      "n_docs": pc.cast(b.column("n_docs"),
                                        pa.int64())})),
        batch_format="pyarrow")


def tokenizer_fertility(ds):
    """Per-language tokenizer-fertility audit: how many BPE-ish
    pretokens the tokenizer spends per whitespace word in each lang —
    the number a multilingual-mix designer watches because a
    high-fertility language burns training budget. Counts reuse the
    regex_token_counts contract (BPE_PATTERN pretokens; whitespace
    words of trim(text)). -> (lang, n_docs, n_ws_tokens,
    n_bpe_tokens, fertility) with fertility = bpe/ws rounded 6.

    Scale shape: ONE vectorized-regex pass, per-batch partial sums,
    |langs|-sized groupby."""
    import re

    from ray.data.aggregate import Sum

    pat = re.compile(BPE_PATTERN)

    def partial(batch: pa.Table) -> pa.Table:
        langs = batch.column("lang").to_pylist()
        texts = batch.column("text").to_pylist()
        ws = np.empty(len(texts), dtype=np.int64)
        bpe = np.empty(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            ws[i] = len(t.split()) if t else 0
            bpe[i] = len(pat.findall(t)) if t else 0
        g = pa.table({
            "lang": pa.array(langs, type=pa.string()),
            "d": pa.array(np.ones(len(texts), dtype=np.int64)),
            "w": pa.array(ws), "b": pa.array(bpe),
        }).group_by(["lang"]).aggregate(
            [("d", "sum"), ("w", "sum"), ("b", "sum")])
        return pa.table({"lang": g.column("lang"),
                         "d_p": g.column("d_sum"),
                         "w_p": g.column("w_sum"),
                         "b_p": g.column("b_sum")})

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("lang").aggregate(
            Sum("d_p", alias_name="n_docs"),
            Sum("w_p", alias_name="n_ws_tokens"),
            Sum("b_p", alias_name="n_bpe_tokens"))

    def finish(b: pa.Table) -> pa.Table:
        w = b.column("n_ws_tokens").to_numpy().astype(np.float64)
        bp = b.column("n_bpe_tokens").to_numpy().astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            f = np.where(w > 0, np.round(bp / w, 6), 0.0)
        return pa.table({
            "lang": b.column("lang"),
            "n_docs": pc.cast(b.column("n_docs"), pa.int64()),
            "n_ws_tokens": pc.cast(b.column("n_ws_tokens"),
                                   pa.int64()),
            "n_bpe_tokens": pc.cast(b.column("n_bpe_tokens"),
                                    pa.int64()),
            "fertility": pa.array(f),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def source_overlap_matrix(ds, *, n: int = 3):
    """Cross-source contamination matrix: for every ordered source
    pair (a, b), how many of a's DISTINCT whitespace ``n``-grams of
    lower(text) also occur in b — the decontamination screen run
    between corpus slices rather than train/test. Diagonal rows carry
    each source's own distinct-shingle count, so containment ratios
    are computable from the output. -> (source_a, source_b,
    n_shared).

    Scale shape: docs explode to (shingle, source) rows deduped per
    doc; ONE groupby dedupes them per source; the pair expansion is a
    single hash(shingle)-partition pass with a vectorized pandas
    self-merge INSIDE each partition (round 5 — the previous
    hash-self-join shape exchanged the same shingle table twice, once
    per join side), emitting <= |sources|^2 rows per shingle; the
    final |sources|^2 groupby sums. No stage ever holds more than a
    partition of the shingle table."""
    import pandas as pd
    from ray.data.aggregate import Sum

    from rse_ray.util import parts_for, plan_rows

    def explode(batch: pa.Table) -> pa.Table:
        srcs = batch.column("source").to_pylist()
        texts = batch.column("text").to_pylist()
        o_g, o_s = [], []
        for s, t in zip(srcs, texts):
            if t is None:
                continue
            toks = t.lower().split()
            grams = {" ".join(toks[i:i + n])
                     for i in range(len(toks) - n + 1)}
            o_g.extend(grams)
            o_s.extend([s] * len(grams))
        return pa.table({"shingle": pa.array(o_g, type=pa.string()),
                         "source": pa.array(o_s, type=pa.string())})

    exploded = ds.map_batches(explode, batch_format="pyarrow")
    dist = exploded.groupby(["shingle", "source"]).count() \
        .drop_columns(["count()"]).materialize()
    P = parts_for(plan_rows(dist), rows_per_part=500_000)

    def parted(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 \
                or "shingle" not in batch.column_names:
            return pa.table({
                "shingle": pa.array([], type=pa.string()),
                "source": pa.array([], type=pa.string()),
                "part": pa.array([], type=pa.int64())})
        h = pd.util.hash_array(
            batch.column("shingle").to_numpy(zero_copy_only=False)
            .astype(object))
        return batch.append_column(
            "part", pa.array((h % P).astype(np.int64)))

    def pair_counts(g: pd.DataFrame) -> pd.DataFrame:
        # all occurrences of a shingle land in this partition: the
        # in-partition self-merge IS the pair expansion
        m = g[["shingle", "source"]].merge(
            g[["shingle", "source"]], on="shingle",
            suffixes=("_a", "_b"))
        out = m.groupby(["source_a", "source_b"]) \
            .size().reset_index(name="c_p")
        out["c_p"] = out["c_p"].astype(np.int64)
        return out

    agg = dist.map_batches(parted, batch_format="pyarrow") \
        .groupby("part") \
        .map_groups(pair_counts, batch_format="pandas") \
        .groupby(["source_a", "source_b"]) \
        .aggregate(Sum("c_p", alias_name="n_shared"))
    return agg.map_batches(
        lambda b: pa.table({
            "source_a": b.column("source_a"),
            "source_b": b.column("source_b"),
            "n_shared": pc.cast(b.column("n_shared"), pa.int64()),
        }), batch_format="pyarrow")


def dsir_weights(ds, *, target_source: str = "books",
                 dim: int = 1024, stem: bool = False,
                 round_to: int = 6):
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every document
    by how much more likely its hashed-unigram features are under the
    TARGET distribution (docs from ``target_source``) than under the
    source distribution (all other docs) —
    log w(d) = sum_f n_f(d) * (ln p_tgt(f) - ln p_src(f)), features
    hashed to ``dim`` buckets (md5 'dsir:'||term % dim, the repo's
    md5_number_lower convention), both distributions add-1 smoothed
    over the bucket space. Output (doc_id, log_weight); resampling is
    then weighted_sample with exp(log_weight) — this operator is the
    scoring pass. Docs with no tokens emit no row (no features, no
    evidence).

    Scale shape: ONE tokenize pass explodes to (doc_id, bucket, n,
    is_target) rows, materialized once and consumed twice: (a)
    per-batch bucket partials -> a dim-row groupby -> the two count
    vectors (dim doubles to the driver, data never); (b) the same
    exploded rows re-scored against the BROADCAST lambda vector
    (ray.put once) with per-batch per-doc partials before the
    groupby(doc_id) sum. The vocabulary never ships; everything
    downstream of tokenize is O(tokens) -> O(dim) -> O(docs)."""
    import ray
    from collections import Counter

    from ray.data.aggregate import Sum

    from rse_ray.functions.tokenizer import tokenize
    from rse_ray.pipelines.sketch import _md5_u64

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        srcs = batch.column("source").to_pylist()
        o_id, o_b, o_n, o_t = [], [], [], []
        for i, t, s in zip(ids, texts, srcs):
            if t is None:
                continue
            c = Counter(tokenize(t, stem=stem))
            if not c:
                continue
            terms = sorted(c)
            b = (_md5_u64([f"dsir:{w}" for w in terms])
                 % np.uint64(dim)).astype(np.int64)
            tf = np.fromiter((c[w] for w in terms), dtype=np.int64,
                             count=len(terms))
            vec = np.zeros(dim, dtype=np.int64)
            np.add.at(vec, b, tf)
            nz = np.flatnonzero(vec)
            o_id.extend([i] * len(nz))
            o_b.extend(int(x) for x in nz)
            o_n.extend(int(v) for v in vec[nz])
            o_t.extend([s == target_source] * len(nz))
        return pa.table({
            "doc_id": pa.array(o_id, type=pa.int64()),
            "bucket": pa.array(o_b, type=pa.int64()),
            "n": pa.array(o_n, type=pa.int64()),
            "is_tgt": pa.array(o_t, type=pa.bool_())})

    feats = ds.map_batches(explode, batch_format="pyarrow") \
        .materialize()

    def bucket_partial(batch: pa.Table) -> pa.Table:
        tgt = pc.if_else(batch.column("is_tgt"), batch.column("n"),
                         pa.scalar(0, type=pa.int64()))
        src = pc.if_else(batch.column("is_tgt"),
                         pa.scalar(0, type=pa.int64()),
                         batch.column("n"))
        g = pa.table({"bucket": batch.column("bucket"),
                      "ct": tgt, "cs": src}) \
            .group_by(["bucket"]) \
            .aggregate([("ct", "sum"), ("cs", "sum")])
        return pa.table({"bucket": g.column("bucket"),
                         "ct_p": g.column("ct_sum"),
                         "cs_p": g.column("cs_sum")})

    counts = feats.map_batches(bucket_partial,
                               batch_format="pyarrow") \
        .groupby("bucket").aggregate(Sum("ct_p", alias_name="ct"),
                                     Sum("cs_p", alias_name="cs")) \
        .to_pandas()
    ct = np.zeros(dim, dtype=np.float64)
    cs = np.zeros(dim, dtype=np.float64)
    if len(counts):
        bk = counts["bucket"].to_numpy(dtype=np.int64)
        ct[bk] = counts["ct"].to_numpy(dtype=np.float64)
        cs[bk] = counts["cs"].to_numpy(dtype=np.float64)
    st, ss = float(ct.sum()), float(cs.sum())
    lam = (np.log((ct + 1.0) / (st + float(dim)))
           - np.log((cs + 1.0) / (ss + float(dim))))
    lam_ref = ray.put(lam)

    def weight_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({
                "doc_id": pa.array([], type=pa.int64()),
                "w_p": pa.array([], type=pa.float64())})
        lv = ray.get(lam_ref)
        n = batch.column("n").to_numpy().astype(np.float64)
        b = batch.column("bucket").to_numpy()
        g = pa.table({"doc_id": batch.column("doc_id"),
                      "w": n * lv[b]}) \
            .group_by(["doc_id"]).aggregate([("w", "sum")])
        return pa.table({"doc_id": g.column("doc_id"),
                         "w_p": g.column("w_sum")})

    out = feats.map_batches(weight_partial, batch_format="pyarrow") \
        .groupby("doc_id").aggregate(Sum("w_p",
                                         alias_name="log_weight"))
    scale = 10.0 ** round_to
    return out.map_batches(
        lambda b: pa.table({
            "doc_id": pc.cast(b.column("doc_id"), pa.int64()),
            "log_weight": pa.array(np.floor(
                b.column("log_weight").to_numpy() * scale + 0.5)
                / scale)}),
        batch_format="pyarrow")


def nb_classify(ds, *, alpha: float = 1.0, stem: bool = False,
                id_col: str = "doc_id", text_col: str = "text",
                label_col: str = "source"):
    """Multinomial Naive Bayes self-classification — the classic
    large-scale text categorizer (McCallum & Nigam 1998): train
    add-``alpha``-smoothed per-class token statistics on the corpus's
    own labels, then score every document,

        score(d, c) = ln(N_c / N)
                    + sum_w tf(w, d) * ln((cnt(w, c) + alpha)
                                          / (tok_c + alpha * V)),

    where V is the corpus distinct-vocabulary size, and emit the
    argmax class (ties broken by label asc). Documents with zero
    tokens are skipped (no evidence). -> (doc_id, predicted, score),
    score rounded to 6 places.

    Scale shape: pass 1 is a per-batch (label, term) Counter partial
    collapsed by ONE groupby — the aggregated model table is
    O(classes x vocab), the standard NB model budget (same contract
    as doc_lm_score's bigram LM), collected once and broadcast via
    ``ray.put`` as a term -> per-class log-prob matrix; pass 2 is an
    embarrassingly-parallel map over batches (Counter per doc,
    vectorized class-score accumulation, one argmax per doc). No
    per-doc shuffle anywhere."""
    import ray
    from ray.data.aggregate import Sum

    proj = ds.select_columns([id_col, text_col, label_col])

    def train_partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        docs: Counter = Counter()
        for lab, t in zip(batch.column(label_col).to_pylist(),
                          batch.column(text_col).to_pylist()):
            docs[lab] += 1
            if not t:
                continue
            for w in _tok(t, stem):
                c[(lab, w)] += 1
        keys = sorted(c)
        # doc-count rows ride the same shuffle under term = "" (tokens
        # are never empty post-filter)
        return pa.table({
            "lab": pa.array([k[0] for k in keys]
                            + sorted(docs), type=pa.string()),
            "term": pa.array([k[1] for k in keys]
                             + [""] * len(docs), type=pa.string()),
            "c_p": pa.array([c[k] for k in keys]
                            + [docs[k] for k in sorted(docs)],
                            type=pa.int64()),
        })

    model = proj.map_batches(train_partial, batch_format="pyarrow") \
        .groupby(["lab", "term"]).aggregate(Sum("c_p", alias_name="n")) \
        .to_pandas()
    is_doc = model["term"] == ""
    doc_counts = dict(zip(model.loc[is_doc, "lab"],
                          model.loc[is_doc, "n"].astype(int)))
    tc = model[~is_doc]
    labels = sorted(doc_counts)
    lab_ix = {c: i for i, c in enumerate(labels)}
    C = len(labels)
    n_docs = sum(doc_counts.values())
    vocab = sorted(tc["term"].unique())
    term_ix = {w: i for i, w in enumerate(vocab)}
    V = len(vocab)
    tok_c = np.zeros(C, dtype=np.float64)
    cnt = np.zeros((len(vocab), C), dtype=np.float64)
    li = tc["lab"].map(lab_ix).to_numpy(dtype=np.int64)
    ti = tc["term"].map(term_ix).to_numpy(dtype=np.int64)
    nn = tc["n"].to_numpy(dtype=np.float64)
    np.add.at(tok_c, li, nn)
    cnt[ti, li] = nn
    # per-term per-class log P(w|c); row for unseen-in-class handled
    # by the alpha in the numerator (cnt 0)
    logp = np.log((cnt + alpha) / (tok_c + alpha * V))
    prior = np.log(np.array([doc_counts[c] for c in labels],
                            dtype=np.float64) / float(n_docs))
    mref = ray.put((term_ix, logp, prior, labels))

    def predict(batch: pa.Table) -> pa.Table:
        tix, lp, pr, labs = ray.get(mref)
        ids, preds, scores = [], [], []
        for did, t in zip(batch.column(id_col).to_pylist(),
                          batch.column(text_col).to_pylist()):
            if not t:
                continue
            toks = _tok(t, stem)
            if not toks:
                continue
            c = Counter(toks)
            terms = sorted(c)
            rows = np.fromiter((tix[w] for w in terms),
                               dtype=np.int64, count=len(terms))
            tf = np.fromiter((c[w] for w in terms),
                             dtype=np.float64, count=len(terms))
            s = pr + tf @ lp[rows]
            best = int(np.argmax(s))  # first max = label-asc tie-break
            ids.append(int(did))
            preds.append(labs[best])
            scores.append(float(s[best]))
        return pa.table({
            id_col: pa.array(ids, type=pa.int64()),
            "predicted": pa.array(preds, type=pa.string()),
            "score": pa.array(np.round(np.array(scores,
                                                dtype=np.float64), 6)),
        })

    return proj.map_batches(predict, batch_format="pyarrow")


def bm25_pruned(ds, query: str, *, keep_pct: int = 50, k: int = 20,
                stem: bool = False):
    """Static index pruning (Carmel et al., SIGIR 2001): per query
    term keep only the ceil(keep_pct% x df) highest-impact postings
    (tf desc, doc_id asc — the static top-fraction an impact-ordered
    index would store), then score BM25 with the FULL collection
    statistics (N, avgdl, unpruned df), top-k (raw desc, doc_id). ->
    (doc_id, score), score rounded to 6.

    The kept-count is exact integer arithmetic
    ((df * keep_pct + 99) // 100), so both engines prune the
    identical posting set. In production the truncation happens at
    INDEX BUILD time (impact-ordered posting lists, one sort per term
    inside the segment writer); this query-time form exists to make
    the recall/latency trade measurable against the exact scorer on
    the same corpus.

    Scale shape: one stats pass (per-batch partials -> driver
    scalars: N, avgdl, per-query-term df); one postings pass
    RESTRICTED to query terms (term, doc_id, tf, dl); per-term
    truncation via groupby(term).map_groups (bounded by |query terms|
    groups); scoring is vectorized per batch with broadcast stats and
    the final top-k is a driver reduce of per-batch heads."""
    import math as _math

    import ray
    from ray.data.aggregate import Sum

    q_counts = Counter(_tok(query, stem))
    q_terms = sorted(q_counts)
    if not q_terms:
        return pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                             "score": pd.Series([], dtype=np.float64)})
    qref = ray.put(set(q_terms))

    def stats_partial(batch: pa.Table) -> pa.Table:
        qs = ray.get(qref)
        texts = batch.column("text").to_pylist()
        n, dl_sum = 0, 0
        df_c: Counter = Counter()
        for t in texts:
            toks = _tok(t, stem)
            n += 1
            dl_sum += len(toks)
            df_c.update(set(toks) & qs)
        terms = sorted(df_c)
        return pa.table({
            "term": pa.array(terms + [""], type=pa.string()),
            "df_p": pa.array([df_c[t] for t in terms] + [n],
                             type=pa.int64()),
            "dl_p": pa.array([0] * len(terms) + [dl_sum],
                             type=pa.int64())})

    st = ds.map_batches(stats_partial, batch_format="pyarrow") \
        .groupby("term").aggregate(Sum("df_p", alias_name="df"),
                                   Sum("dl_p", alias_name="dl")) \
        .to_pandas()
    N = int(st.loc[st["term"] == "", "df"].iloc[0])
    avgdl = int(st.loc[st["term"] == "", "dl"].iloc[0]) / N
    df_of = {t: int(v) for t, v in zip(st["term"], st["df"])
             if t != ""}

    def post_partial(batch: pa.Table) -> pa.Table:
        qs = ray.get(qref)
        ids = batch.column("doc_id").to_numpy()
        texts = batch.column("text").to_pylist()
        terms, dids, tfs, dls = [], [], [], []
        for did, t in zip(ids, texts):
            toks = _tok(t, stem)
            c = Counter(toks)
            for term in qs.intersection(c):
                terms.append(term)
                dids.append(int(did))
                tfs.append(c[term])
                dls.append(len(toks))
        return pa.table({
            "term": pa.array(terms, type=pa.string()),
            "doc_id": pa.array(dids, type=pa.int64()),
            "tf": pa.array(tfs, type=pa.int64()),
            "dl": pa.array(dls, type=pa.int64())})

    def truncate(g: pd.DataFrame) -> pd.DataFrame:
        df = df_of.get(str(g["term"].iloc[0]), 0)
        keep = (df * keep_pct + 99) // 100
        return g.sort_values(["tf", "doc_id"],
                             ascending=[False, True]).head(keep)

    pruned = ds.map_batches(post_partial, batch_format="pyarrow") \
        .groupby("term").map_groups(truncate, batch_format="pandas")

    idf = {t: _math.log(1.0 + (N - df_of[t] + 0.5)
                        / (df_of[t] + 0.5))
           for t in q_terms if t in df_of}
    iref = ray.put((idf, dict(q_counts), float(avgdl)))

    def score_partial(batch: pa.Table) -> pa.Table:
        idf_l, qtf_l, avg = ray.get(iref)
        if batch.num_rows == 0:
            return pa.table({
                "doc_id": pa.array([], type=pa.int64()),
                "s_p": pa.array([], type=pa.float64())})
        terms = batch.column("term").to_pylist()
        tf = batch.column("tf").to_numpy().astype(np.float64)
        dl = batch.column("dl").to_numpy().astype(np.float64)
        w = np.fromiter((idf_l[t] * qtf_l[t] for t in terms),
                        dtype=np.float64, count=len(terms))
        s = w * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avg))
        g = pa.table({
            "doc_id": pc.cast(batch.column("doc_id"), pa.int64()),
            "s": pa.array(s)}).group_by(["doc_id"]) \
            .aggregate([("s", "sum")])
        return g.rename_columns(["doc_id", "s_p"])

    agg = pruned.map_batches(score_partial, batch_format="pyarrow") \
        .groupby("doc_id").aggregate(Sum("s_p", alias_name="raw")) \
        .to_pandas()
    agg = agg.sort_values(["raw", "doc_id"],
                          ascending=[False, True]).head(k)
    return pd.DataFrame({
        "doc_id": agg["doc_id"].astype(np.int64).to_numpy(),
        "score": np.round(agg["raw"].to_numpy(dtype=np.float64), 6),
    }).reset_index(drop=True)


def source_gini(ds, *, group_col: str = "source"):
    """Gini coefficient of the corpus's per-source document-count
    distribution — the one-number concentration audit (0 = every
    source contributes equally, ->1 = one source dominates), computed
    with the exact sorted-cumulative formula
    G = sum_i (2i - n - 1) * c_i / (n * sum(c)) over counts sorted
    ascending (ties by source name, pinned). -> one row
    (n_groups, total, gini).

    Scale shape: ONE tiny groupby collapses the corpus to per-source
    counts (thousands of rows at any corpus size); the closed form
    runs on the driver over exact int64 counts — the float division
    happens once, identically in both engines."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by([group_col]).aggregate([([], "count_all")])
        return pa.table({
            group_col: g.column(group_col),
            "c_p": pc.cast(g.column("count_all"), pa.int64())})

    counts = ds.select_columns([group_col]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(group_col).aggregate(Sum("c_p", alias_name="c")) \
        .to_pandas()
    if counts.empty:
        return pd.DataFrame({
            "n_groups": pd.Series([0], dtype=np.int64),
            "total": pd.Series([0], dtype=np.int64),
            "gini": pd.Series([0.0])})
    counts = counts.sort_values(["c", group_col]).reset_index(drop=True)
    c = counts["c"].to_numpy(dtype=np.int64)
    n = len(c)
    tot = int(c.sum())
    # integer numerator, single float division (order-free, exact)
    num = int(((2 * np.arange(1, n + 1, dtype=np.int64) - n - 1)
               * c).sum())
    gini = num / (n * tot) if tot else 0.0
    return pd.DataFrame({
        "n_groups": pd.Series([n], dtype=np.int64),
        "total": pd.Series([tot], dtype=np.int64),
        "gini": pd.Series([round(gini, 6)])})


def info_gain_terms(ds, *, label_col: str = "source", k: int = 20,
                    stem: bool = False):
    """Information-gain feature selection (the decision-tree split
    criterion applied to corpus vocabulary): for each term,

        IG(t) = H(label) - [P(t) H(label | t present)
                            + (1 - P(t)) H(label | t absent)],

    where presence is document-level and entropies use natural log.
    Top-``k`` by (IG desc, term asc) -> (term, df, info_gain). High
    IG = the term's presence predicts the document's source — the
    exact signal a contamination/provenance probe wants.

    Scale shape: one pass builds per-(term, label) document
    frequencies (per-batch set-of-terms Counters, ONE groupby); the
    per-label doc totals ride the same shuffle under term = "". The
    IG computation is vectorized over the aggregated (term, label)
    table — O(vocab x labels), independent of corpus row count; the
    final top-k is a driver head over the per-term reduction."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for lab, t in zip(batch.column(label_col).to_pylist(),
                          batch.column("text").to_pylist()):
            c[("", lab)] += 1
            if not t:
                continue
            for w in set(_tok(t, stem)):
                c[(w, lab)] += 1
        keys = sorted(c)
        return pa.table({
            "term": pa.array([k_[0] for k_ in keys],
                             type=pa.string()),
            "lab": pa.array([k_[1] for k_ in keys],
                            type=pa.string()),
            "c_p": pa.array([c[k_] for k_ in keys],
                            type=pa.int64())})

    agg = ds.select_columns([label_col, "text"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(["term", "lab"]) \
        .aggregate(Sum("c_p", alias_name="n")).to_pandas()
    base = agg[agg["term"] == ""]
    n_lab = dict(zip(base["lab"], base["n"].astype(int)))
    labels = sorted(n_lab)
    N = sum(n_lab.values())
    p_lab = np.array([n_lab[c] / N for c in labels])
    h_base = float(-(p_lab * np.log(p_lab)).sum())

    tl = agg[agg["term"] != ""]
    piv = tl.pivot_table(index="term", columns="lab", values="n",
                         fill_value=0, aggfunc="sum") \
        .reindex(columns=labels, fill_value=0)
    M = piv.to_numpy(dtype=np.float64)          # (vocab, labels)
    df = M.sum(axis=1)                          # docs containing term
    absent = np.array([n_lab[c] for c in labels],
                      dtype=np.float64)[None, :] - M
    n_abs = N - df

    def cond_h(counts: np.ndarray, totals: np.ndarray) -> np.ndarray:
        with np.errstate(divide="ignore", invalid="ignore"):
            p = counts / totals[:, None]
            t = np.where(p > 0, p * np.log(p), 0.0)
        return -t.sum(axis=1)

    hp = cond_h(M, df)
    ha = np.where(n_abs > 0, cond_h(absent, np.maximum(n_abs, 1)),
                  0.0)
    ig = h_base - (df / N) * hp - (n_abs / N) * ha
    out = pd.DataFrame({
        "term": piv.index, "df": df.astype(np.int64),
        "info_gain": np.round(ig, 6)})
    return out.sort_values(["info_gain", "term"],
                           ascending=[False, True]).head(k) \
        .reset_index(drop=True)


def rbo_source_drift(ds, *, source_a: str = "src0",
                     source_b: str = "src1", depth: int = 50,
                     p: float = 0.9, stem: bool = False):
    """Rank-biased overlap (Webber, Moffat & Zobel, TOIS 2010)
    between two sources' top-``depth`` term lists (ranked tf desc,
    term asc — integer tf, so the cut is deterministic):

        RBO = sum_{d=1..depth} p^(d-1) * |A_d ∩ B_d| / d
              / sum_{d=1..depth} p^(d-1)

    (the depth-truncated RBO_min normalized by its achievable
    maximum, so identical lists score exactly 1 at any depth).
    The one-number vocabulary-drift monitor between two corpus
    slices or releases: 1 = identical head vocabulary, ~0 = disjoint.
    -> one row (depth, overlap_at_depth, rbo).

    Scale shape: per-batch (source, term, tf) Counter partials, ONE
    groupby; only the two top-``depth`` lists (driver head over the
    per-source reduction) leave the cluster; the geometric sum runs
    on exact integer overlap counts."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for src, t in zip(batch.column("source").to_pylist(),
                          batch.column("text").to_pylist()):
            if src not in (source_a, source_b) or not t:
                continue
            for w, n in Counter(_tok(t, stem)).items():
                c[(src, w)] += n
        keys = sorted(c)
        return pa.table({
            "src": pa.array([k[0] for k in keys], type=pa.string()),
            "term": pa.array([k[1] for k in keys],
                             type=pa.string()),
            "c_p": pa.array([c[k] for k in keys], type=pa.int64())})

    agg = ds.select_columns(["source", "text"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(["src", "term"]) \
        .aggregate(Sum("c_p", alias_name="tf")).to_pandas()

    def top_list(src: str) -> list[str]:
        g = agg[agg["src"] == src].sort_values(
            ["tf", "term"], ascending=[False, True]).head(depth)
        return g["term"].tolist()

    A, B = top_list(source_a), top_list(source_b)
    ra = {t: i + 1 for i, t in enumerate(A)}
    rb = {t: i + 1 for i, t in enumerate(B)}
    common = set(ra) & set(rb)
    rbo = 0.0
    norm = 0.0
    ov_final = 0
    for d in range(1, depth + 1):
        ov = sum(1 for t in common if ra[t] <= d and rb[t] <= d)
        rbo += (p ** (d - 1)) * ov / d
        norm += p ** (d - 1)
        if d == depth:
            ov_final = ov
    rbo = rbo / norm if norm > 0 else 0.0
    return pd.DataFrame({
        "depth": pd.Series([depth], dtype=np.int64),
        "overlap_at_depth": pd.Series([ov_final], dtype=np.int64),
        "rbo": pd.Series([round(rbo, 6)])})


def langid_kappa(ds, *, concurrency: int | None = 4):
    """Cohen's kappa for the LangId model against the stored labels —
    chance-corrected agreement over langid_confusion's matrix:

        po = trace / N,  pe = sum_c row_c * col_c / N^2,
        kappa = (po - pe) / (1 - pe).

    The single-number model-quality gate (kappa ~ 0 = no better than
    the label prior, 1 = perfect). -> one row (n, po, pe, kappa).

    Scale shape: one actor-pool scoring pass collapses to the
    |langs|^2 confusion histogram (langid_confusion); all arithmetic
    runs on exact integer marginals driver-side, with one float
    division per statistic — identical in both engines."""
    cm = langid_confusion(ds, concurrency=concurrency).to_pandas()
    if cm.empty:
        return pd.DataFrame({
            "n": pd.Series([0], dtype=np.int64),
            "po": pd.Series([0.0]), "pe": pd.Series([0.0]),
            "kappa": pd.Series([0.0])})
    N = int(cm["n"].sum())
    diag = int(cm.loc[cm["lang_true"] == cm["lang_pred"], "n"].sum())
    rows = cm.groupby("lang_true")["n"].sum()
    cols = cm.groupby("lang_pred")["n"].sum()
    pe_num = sum(int(rows.get(k, 0)) * int(cols.get(k, 0))
                 for k in set(rows.index) | set(cols.index))
    po = diag / N
    pe = pe_num / (N * N)
    kappa = (po - pe) / (1 - pe) if pe < 1 else 0.0
    return pd.DataFrame({
        "n": pd.Series([N], dtype=np.int64),
        "po": pd.Series([round(po, 6)]),
        "pe": pd.Series([round(pe, 6)]),
        "kappa": pd.Series([round(kappa, 6)])})


def burrows_delta(ds, *, top_m: int = 30, stem: bool = False):
    """Burrows' Delta (Burrows 2002) — the classic stylometric
    distance between corpus slices: over the ``top_m``
    highest-frequency terms corpus-wide (tf desc, term asc),
    each source's RELATIVE term frequency is z-scored across sources
    (population std), and

        delta(a, b) = mean_t | z_{a,t} - z_{b,t} |.

    Output every unordered source pair (source_a < source_b, delta
    rounded to 6) — the provenance / style-drift matrix that flags a
    source whose writing style shifted between crawls.

    Scale shape: one pass of per-batch (source, term, tf) partials
    with per-source token totals riding under term = ""; ONE groupby
    collapses to the (sources x vocab) model, and the z-score /
    distance algebra runs on the top_m x sources matrix driver-side
    — bounded by dimensions, not corpus rows."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for src, t in zip(batch.column("source").to_pylist(),
                          batch.column("text").to_pylist()):
            if not t:
                continue
            toks = _tok(t, stem)
            c[(src, "")] += len(toks)
            for w, n in Counter(toks).items():
                c[(src, w)] += n
        keys = sorted(c)
        return pa.table({
            "src": pa.array([k[0] for k in keys], type=pa.string()),
            "term": pa.array([k[1] for k in keys],
                             type=pa.string()),
            "c_p": pa.array([c[k] for k in keys], type=pa.int64())})

    agg = ds.select_columns(["source", "text"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(["src", "term"]) \
        .aggregate(Sum("c_p", alias_name="tf")).to_pandas()
    totals = agg[agg["term"] == ""].set_index("src")["tf"].astype(int)
    tl = agg[agg["term"] != ""]
    top = tl.groupby("term")["tf"].sum().reset_index() \
        .sort_values(["tf", "term"], ascending=[False, True]) \
        .head(top_m)["term"].tolist()
    sources = sorted(totals.index)
    piv = tl[tl["term"].isin(top)].pivot_table(
        index="term", columns="src", values="tf", fill_value=0,
        aggfunc="sum").reindex(index=sorted(top), columns=sources,
                               fill_value=0)
    F = piv.to_numpy(dtype=np.float64) \
        / totals[sources].to_numpy(dtype=np.float64)[None, :]
    mu = F.mean(axis=1, keepdims=True)
    sd = F.std(axis=1, keepdims=True)          # population std
    with np.errstate(divide="ignore", invalid="ignore"):
        Z = np.where(sd > 0, (F - mu) / sd, 0.0)
    out_a, out_b, out_d = [], [], []
    for i, a in enumerate(sources):
        for j in range(i + 1, len(sources)):
            d = float(np.abs(Z[:, i] - Z[:, j]).mean())
            out_a.append(a)
            out_b.append(sources[j])
            out_d.append(round(d, 6))
    return pd.DataFrame({"source_a": out_a, "source_b": out_b,
                         "delta": out_d})


def heaps_fit(ds, *, stem: bool = False):
    """Heaps'-law fit V(n) = K * n^beta over the vocabulary growth
    curve: OLS of ln(cum_vocab) on ln(cum_tokens) across the per-doc
    checkpoints with cum_tokens > 0 and cum_vocab > 0. -> one row
    (n_points, k, beta), k = exp(intercept), both rounded to 6 — the
    capacity-planning constant pair (how big will the term dictionary
    be at 10^12 tokens?).

    Scale shape: rides vocab_growth's distributed prefix pipeline;
    the OLS moments collapse per batch (four float partials), so the
    driver sees scalars. Float summation order differs between
    engines by design; the 6-dp rounding is the contract (the
    zipf_slope convention)."""
    from ray.data.aggregate import Sum

    curve = vocab_growth(ds, stem=stem)

    def moments(batch: pa.Table) -> pa.Table:
        ct = batch.column("cum_tokens").to_numpy().astype(np.float64)
        cv = batch.column("cum_vocab").to_numpy().astype(np.float64)
        keep = (ct > 0) & (cv > 0)
        x = np.log(ct[keep])
        y = np.log(cv[keep])
        return pa.table({
            "n": pa.array([int(keep.sum())], type=pa.int64()),
            "sx": pa.array([float(x.sum())]),
            "sy": pa.array([float(y.sum())]),
            "sxx": pa.array([float((x * x).sum())]),
            "sxy": pa.array([float((x * y).sum())])})

    m = curve.map_batches(moments, batch_format="pyarrow").aggregate(
        Sum("n", alias_name="n"), Sum("sx", alias_name="sx"),
        Sum("sy", alias_name="sy"), Sum("sxx", alias_name="sxx"),
        Sum("sxy", alias_name="sxy"))
    n = int(m["n"] or 0)
    if n < 2:
        return pd.DataFrame({
            "n_points": pd.Series([n], dtype=np.int64),
            "k": pd.Series([0.0]), "beta": pd.Series([0.0])})
    sx, sy, sxx, sxy = (float(m["sx"]), float(m["sy"]),
                        float(m["sxx"]), float(m["sxy"]))
    beta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    k = math.exp((sy - beta * sx) / n)
    return pd.DataFrame({
        "n_points": pd.Series([n], dtype=np.int64),
        "k": pd.Series([round(k, 6)]),
        "beta": pd.Series([round(beta, 6)])})


def otsu_threshold(ds, *, stem: bool = False):
    """Otsu's method (Otsu 1979) applied to corpus curation: the
    automatic binary split of the per-document TOKEN-COUNT
    distribution that maximizes between-class variance

        sigma_b^2(t) = w0 * w1 * (mu0 - mu1)^2

    over candidate thresholds t = each distinct doc length (class 0 =
    docs with n_tokens <= t). The data-driven "short doc" cutoff that
    replaces a hand-picked length filter. -> one row
    (threshold, n_short, n_long, between_var), var rounded to 6.

    Scale shape: per-batch per-doc token counts collapse to the
    distinct-length histogram (ONE tiny groupby); cumulative sums +
    the argmax sweep run on that histogram — O(distinct lengths),
    corpus-size-independent. All moments are exact int64 sums; the
    variance is float-identical in both engines, and ties break
    toward the smaller threshold."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        n = np.fromiter((len(_tok(t, stem)) if t else 0
                         for t in texts), dtype=np.int64,
                        count=len(texts))
        u, c = np.unique(n, return_counts=True)
        return pa.table({"v": pa.array(u),
                         "c_p": pa.array(c.astype(np.int64))})

    h = ds.select_columns(["text"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("v").aggregate(Sum("c_p", alias_name="c")) \
        .to_pandas().sort_values("v").reset_index(drop=True)
    v = h["v"].to_numpy(dtype=np.int64)
    c = h["c"].to_numpy(dtype=np.int64)
    N = int(c.sum())
    cw = np.cumsum(c)                   # w0 per threshold (int)
    cs = np.cumsum(v * c)               # sum of values <= t (int)
    tot = int((v * c).sum())
    best = (-1.0, None)
    for i in range(len(v)):
        w0, w1 = int(cw[i]), N - int(cw[i])
        if w0 == 0 or w1 == 0:
            continue
        mu0 = int(cs[i]) / w0
        mu1 = (tot - int(cs[i])) / w1
        var = w0 * w1 * (mu0 - mu1) ** 2
        if var > best[0]:
            best = (var, i)
    if best[1] is None:
        return pd.DataFrame({
            "threshold": pd.Series([0], dtype=np.int64),
            "n_short": pd.Series([N], dtype=np.int64),
            "n_long": pd.Series([0], dtype=np.int64),
            "between_var": pd.Series([0.0])})
    i = best[1]
    return pd.DataFrame({
        "threshold": pd.Series([int(v[i])], dtype=np.int64),
        "n_short": pd.Series([int(cw[i])], dtype=np.int64),
        "n_long": pd.Series([N - int(cw[i])], dtype=np.int64),
        "between_var": pd.Series([round(best[0], 6)])})


def fightin_words(ds, *, source_a: str = "src0",
                  source_b: str = "src1", a0: float = 10.0,
                  k: int = 20, stem: bool = False):
    """Monroe, Colaresi & Quinn's "Fightin' Words" (2008): log-odds
    ratio of term use between two corpus slices with an INFORMATIVE
    Dirichlet prior drawn from the pooled corpus,

        alpha_t = a0 * y_all(t) / n_all,
        delta_t = ln((y_a + alpha_t) / (n_a + a0 - y_a - alpha_t))
                - ln((y_b + alpha_t) / (n_b + a0 - y_b - alpha_t)),
        z_t     = delta_t / sqrt(1/(y_a + alpha_t)
                                 + 1/(y_b + alpha_t)),

    the statistically-grounded replacement for raw tf-ratio "keyness"
    lists (rare terms stop dominating). Top-``k`` by (|z| desc, term
    asc), keeping the sign. -> (term, count_a, count_b, z).

    Scale shape: one (source, term, tf) partial pass + ONE groupby
    (the pooled counts derive from the same table); the z algebra
    runs vectorized over the two-source vocabulary driver-side —
    bounded by vocab, not corpus rows."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for src, t in zip(batch.column("source").to_pylist(),
                          batch.column("text").to_pylist()):
            if src not in (source_a, source_b) or not t:
                continue
            for w, n in Counter(_tok(t, stem)).items():
                c[(src, w)] += n
        keys = sorted(c)
        return pa.table({
            "src": pa.array([x[0] for x in keys], type=pa.string()),
            "term": pa.array([x[1] for x in keys],
                             type=pa.string()),
            "c_p": pa.array([c[x] for x in keys], type=pa.int64())})

    agg = ds.select_columns(["source", "text"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(["src", "term"]) \
        .aggregate(Sum("c_p", alias_name="tf")).to_pandas()
    terms = sorted(agg["term"].unique())
    ya = agg[agg["src"] == source_a].set_index("term")["tf"] \
        .reindex(terms, fill_value=0).to_numpy(dtype=np.int64)
    yb = agg[agg["src"] == source_b].set_index("term")["tf"] \
        .reindex(terms, fill_value=0).to_numpy(dtype=np.int64)
    na, nb = int(ya.sum()), int(yb.sum())
    yall = ya + yb
    nall = na + nb
    alpha = a0 * yall / nall
    da = np.log((ya + alpha) / (na + a0 - ya - alpha))
    db = np.log((yb + alpha) / (nb + a0 - yb - alpha))
    z = (da - db) / np.sqrt(1.0 / (ya + alpha)
                            + 1.0 / (yb + alpha))
    out = pd.DataFrame({"term": terms,
                        "count_a": pd.array(ya, dtype="int64"),
                        "count_b": pd.array(yb, dtype="int64"),
                        "z_raw": z})
    out["az"] = np.abs(out["z_raw"])
    out = out.sort_values(["az", "term"],
                          ascending=[False, True]).head(k)
    return pd.DataFrame({
        "term": out["term"].to_numpy(),
        "count_a": out["count_a"].to_numpy(),
        "count_b": out["count_b"].to_numpy(),
        "z": np.round(out["z_raw"].to_numpy(dtype=np.float64), 6)})


def lead_terms(ds, *, k: int = 20, min_df: int = 10,
               stem: bool = False):
    """Lead-position bias per term: the mean over documents containing
    the term of first_position / doc_length (1-based tokens) — terms
    that systematically open documents (headline / lead-paragraph
    vocabulary) score near 0, body-only vocabulary near 1. The
    position prior several rankers (and snippet pickers) exploit.
    Top-``k`` lowest mean positions among terms with df >=
    ``min_df``, ties by term asc. -> (term, df, mean_first_pos).

    Scale shape: per-batch per-doc first-occurrence scan collapses to
    (term, ratio-sum, df) partials; ONE vocab-bounded groupby; the
    top-k is a driver head. The per-doc ratio division happens
    identically in both engines before the order-insensitive sum
    (6-dp rounding is the contract for the float mean)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        s: Counter = Counter()
        d: Counter = Counter()
        for t in batch.column("text").to_pylist():
            if not t:
                continue
            toks = _tok(t, stem)
            L = len(toks)
            if not L:
                continue
            seen: dict = {}
            for i, w in enumerate(toks):
                if w not in seen:
                    seen[w] = i + 1
            for w, fp in seen.items():
                s[w] += fp / L
                d[w] += 1
        keys = sorted(d)
        return pa.table({
            "term": pa.array(keys, type=pa.string()),
            "s_p": pa.array([s[w] for w in keys],
                            type=pa.float64()),
            "d_p": pa.array([d[w] for w in keys], type=pa.int64())})

    agg = ds.select_columns(["text"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("term").aggregate(Sum("s_p", alias_name="s"),
                                   Sum("d_p", alias_name="df")) \
        .to_pandas()
    agg = agg[agg["df"] >= min_df].copy()
    agg["mean_first_pos"] = (agg["s"] / agg["df"]).round(6)
    agg = agg.sort_values(["mean_first_pos", "term"]).head(k)
    return pd.DataFrame({
        "term": agg["term"].to_numpy(),
        "df": agg["df"].astype(np.int64).to_numpy(),
        "mean_first_pos": agg["mean_first_pos"].to_numpy()})


class _AhoCorasick:
    """Pure-python Aho-Corasick automaton (Aho & Corasick 1975):
    goto/fail/output links built once (per actor), then every
    document scans in ONE pass regardless of pattern count — the
    multi-pattern replacement for N independent regex scans."""

    def __init__(self, patterns: list[str]):
        self.patterns = list(patterns)
        self.goto: list[dict] = [{}]
        self.out: list[list] = [[]]
        self.fail = [0]
        for pi, p in enumerate(self.patterns):
            s = 0
            for ch in p:
                nxt = self.goto[s].get(ch)
                if nxt is None:
                    self.goto.append({})
                    self.out.append([])
                    self.fail.append(0)
                    nxt = len(self.goto) - 1
                    self.goto[s][ch] = nxt
                s = nxt
            self.out[s].append(pi)
        from collections import deque

        q = deque()
        for s in self.goto[0].values():
            q.append(s)
        while q:
            r = q.popleft()
            for ch, s in self.goto[r].items():
                q.append(s)
                f = self.fail[r]
                while f and ch not in self.goto[f]:
                    f = self.fail[f]
                self.fail[s] = self.goto[f].get(ch, 0) \
                    if self.goto[f].get(ch, 0) != s else 0
                self.out[s] = self.out[s] + self.out[self.fail[s]]

    def count(self, text: str) -> list:
        """Occurrences per pattern (every match end-position)."""
        hits = [0] * len(self.patterns)
        s = 0
        for ch in text:
            while s and ch not in self.goto[s]:
                s = self.fail[s]
            s = self.goto[s].get(ch, 0)
            for pi in self.out[s]:
                hits[pi] += 1
        return hits


class _MultiPatternScanner:
    """Actor-pool stage: the automaton builds ONCE per actor
    (__init__), every batch scans with it (__call__) — the ST3
    expensive-init contract."""

    def __init__(self, patterns: list[str]):
        self.ac = _AhoCorasick(patterns)
        self.n = len(patterns)

    def __call__(self, batch: pa.Table) -> pa.Table:
        docs = np.zeros(self.n, dtype=np.int64)
        hits = np.zeros(self.n, dtype=np.int64)
        for t in batch.column("text").to_pylist():
            if not t:
                continue
            h = self.ac.count(t)
            for i, c in enumerate(h):
                if c:
                    docs[i] += 1
                    hits[i] += c
        return pa.table({
            "pattern": pa.array(self.ac.patterns,
                                type=pa.string()),
            "d_p": pa.array(docs), "h_p": pa.array(hits)})


def multi_pattern_scan(ds, patterns: list[str], *,
                       concurrency: int | None = 4):
    """Single-pass multi-pattern corpus scan (blocklist / policy
    filtering at 100 TB): all ``patterns`` are compiled into one
    Aho-Corasick automaton per actor and every document is scanned
    once — O(text + matches) regardless of pattern count, where the
    naive approach pays one regex pass PER pattern. ->
    (pattern, n_docs, n_hits) with overlapping matches counted at
    every end position (for border-free patterns this equals
    non-overlapping substring counting, which is what the SQL twin
    computes).

    Scale shape: stateful actor pool (automaton built once per
    actor), per-batch (pattern, count) partials, ONE
    |patterns|-bounded groupby."""
    from ray.data.aggregate import Sum

    from rse_ray.util import clamp_pool

    return ds.select_columns(["text"]) \
        .map_batches(_MultiPatternScanner,
                     fn_constructor_args=[list(patterns)],
                     batch_format="pyarrow",
                     concurrency=clamp_pool(concurrency)) \
        .groupby("pattern") \
        .aggregate(Sum("d_p", alias_name="n_docs"),
                   Sum("h_p", alias_name="n_hits"))


def mrf_sd_scores(ds, query: str, *, mu: float = 2000.0,
                  lam_t: float = 0.8, lam_o: float = 0.1,
                  lam_u: float = 0.1, window: int = 8, k: int = 20,
                  stem: bool = False):
    """Sequential Dependence ranking (Metzler & Croft, SIGIR 2005) —
    the Markov-random-field model that beat bag-of-words across TREC:
    Dirichlet-smoothed log features for single terms, ORDERED
    adjacent bigrams (#1) and UNORDERED window-``window`` pairs
    (#uwN) of consecutive query terms,

        f(x, d) = ln((tf_x(d) + mu * cf_x / C_tok) / (dl + mu))
        score   = lam_t * sum_qi f + lam_o * sum_bigram f_#1
                + lam_u * sum_bigram f_uw,

    over documents containing >= 1 query term; top-``k``
    (raw desc, doc_id). -> (doc_id, score), rounded to 6.

    Occurrence semantics, pinned for the SQL twin: #1 counts
    positions i with (w_i, w_i+1) = the bigram in order; #uwN counts
    unordered position pairs i < j, j - i < N, with {w_i, w_j} = the
    bigram's two terms (both orders). Collection frequencies use the
    same counters corpus-wide; C_tok is the corpus token total for
    all three feature kinds (the Indri convention).

    Scale shape: pass 1 aggregates the collection stats for EXACTLY
    the query's terms/bigrams (broadcast sets, per-batch partials,
    driver scalars); pass 2 emits per-doc feature rows for matching
    docs only; scoring is one vectorized map over those rows with
    broadcast stats; the top-k is a driver head."""
    import math as _math

    import ray
    from ray.data.aggregate import Sum

    q_toks = _tok(query, stem)
    terms = sorted(set(q_toks))
    bigrams = sorted(set(zip(q_toks, q_toks[1:])))
    if not terms:
        return pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                             "score": pd.Series([], dtype=np.float64)})
    qref = ray.put((set(terms), bigrams, window))

    def doc_counts(toks: list, tset: set, bgs: list, W: int):
        tf = Counter(w for w in toks if w in tset)
        o1: Counter = Counter()
        uw: Counter = Counter()
        pos: dict = {}
        for i, w in enumerate(toks):
            if w in tset:
                pos.setdefault(w, []).append(i)
        for a, b in zip(toks, toks[1:]):
            if (a, b) in bgs:
                o1[(a, b)] += 1
        for bg in bgs:
            a, b = bg
            pa_ = pos.get(a, ())
            pb = pos.get(b, ())
            if not pa_ or not pb:
                continue
            n = 0
            if a == b:
                arr = np.asarray(pa_, dtype=np.int64)
                d = arr[None, :] - arr[:, None]
                n = int(((d > 0) & (d < W)).sum())
            else:
                xa = np.asarray(pa_, dtype=np.int64)
                xb = np.asarray(pb, dtype=np.int64)
                d = np.abs(xa[:, None] - xb[None, :])
                n = int((d < W).sum())
            uw[bg] = n
        return tf, o1, uw

    def stats_partial(batch: pa.Table) -> pa.Table:
        tset, bgs, W = ray.get(qref)
        rows: Counter = Counter()
        ctok = 0
        for t in batch.column("text").to_pylist():
            toks = _tok(t, stem) if t else []
            ctok += len(toks)
            tf, o1, uw = doc_counts(toks, tset, bgs, W)
            for w, c in tf.items():
                rows[("t", w)] += c
            for bg, c in o1.items():
                rows[("o", " ".join(bg))] += c
            for bg, c in uw.items():
                rows[("u", " ".join(bg))] += c
        rows[("c", "")] = ctok
        keys = sorted(rows)
        return pa.table({
            "kind": pa.array([x[0] for x in keys],
                             type=pa.string()),
            "key": pa.array([x[1] for x in keys],
                            type=pa.string()),
            "c_p": pa.array([rows[x] for x in keys],
                            type=pa.int64())})

    st = ds.select_columns(["text"]) \
        .map_batches(stats_partial, batch_format="pyarrow") \
        .groupby(["kind", "key"]) \
        .aggregate(Sum("c_p", alias_name="n")).to_pandas()
    C_tok = int(st.loc[st["kind"] == "c", "n"].sum())
    cf = {(r["kind"], r["key"]): int(r["n"])
          for _, r in st.iterrows()}

    def feature_partial(batch: pa.Table) -> pa.Table:
        tset, bgs, W = ray.get(qref)
        ids, kinds, keys_, tfs, dls = [], [], [], [], []
        for did, t in zip(batch.column("doc_id").to_pylist(),
                          batch.column("text").to_pylist()):
            toks = _tok(t, stem) if t else []
            if not toks:
                continue
            tf, o1, uw = doc_counts(toks, tset, bgs, W)
            if not tf:
                continue  # no query term -> not a candidate
            dl = len(toks)
            for w in tset:
                ids.append(int(did))
                kinds.append("t")
                keys_.append(w)
                tfs.append(tf.get(w, 0))
                dls.append(dl)
            for bg in bgs:
                key = " ".join(bg)
                for kind, src in (("o", o1), ("u", uw)):
                    ids.append(int(did))
                    kinds.append(kind)
                    keys_.append(key)
                    tfs.append(src.get(bg, 0))
                    dls.append(dl)
        return pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "kind": pa.array(kinds, type=pa.string()),
            "key": pa.array(keys_, type=pa.string()),
            "tf": pa.array(tfs, type=pa.int64()),
            "dl": pa.array(dls, type=pa.int64())})

    lam = {"t": lam_t, "o": lam_o, "u": lam_u}
    cref = ray.put((cf, float(C_tok), lam, float(mu)))

    def score_partial(batch: pa.Table) -> pa.Table:
        cf_l, C, lam_l, mu_l = ray.get(cref)
        if batch.num_rows == 0:
            return pa.table({
                "doc_id": pa.array([], type=pa.int64()),
                "s_p": pa.array([], type=pa.float64())})
        kinds = batch.column("kind").to_pylist()
        keys_ = batch.column("key").to_pylist()
        tf = batch.column("tf").to_numpy().astype(np.float64)
        dl = batch.column("dl").to_numpy().astype(np.float64)
        cfv = np.fromiter(
            (cf_l.get((kd, ky), 0) for kd, ky in zip(kinds, keys_)),
            dtype=np.float64, count=len(kinds))
        w = np.fromiter((lam_l[kd] for kd in kinds),
                        dtype=np.float64, count=len(kinds))
        # a feature absent from the whole corpus (cf = 0) smooths to
        # ln(0): drop it — in BOTH engines — rather than poison every
        # candidate with -inf
        keep = cfv > 0
        tf, dl, cfv, w = tf[keep], dl[keep], cfv[keep], w[keep]
        batch = batch.filter(pa.array(keep))
        f = w * np.log((tf + mu_l * cfv / C) / (dl + mu_l))
        g = pa.table({
            "doc_id": pc.cast(batch.column("doc_id"), pa.int64()),
            "s": pa.array(f)}).group_by(["doc_id"]) \
            .aggregate([("s", "sum")])
        return g.rename_columns(["doc_id", "s_p"])

    agg = ds.select_columns(["doc_id", "text"]) \
        .map_batches(feature_partial, batch_format="pyarrow") \
        .map_batches(score_partial, batch_format="pyarrow") \
        .groupby("doc_id").aggregate(Sum("s_p", alias_name="raw")) \
        .to_pandas()
    agg = agg.sort_values(["raw", "doc_id"],
                          ascending=[False, True]).head(k)
    return pd.DataFrame({
        "doc_id": agg["doc_id"].astype(np.int64).to_numpy(),
        "score": np.round(agg["raw"].to_numpy(dtype=np.float64), 6)})


class _MainContentExtractor:
    """Actor-pool stage: parse each page's html into text blocks and
    keep the content ones (functions/maincontent.py — block
    segmentation at block-tag boundaries, jusText-lite word-count +
    link-density classification). Parser class binds once per actor;
    per-page work is one html.parser pass."""

    def __init__(self, min_words: int = 10,
                 max_link_density: float = 0.4) -> None:
        from rse_ray.functions.maincontent import extract_main

        self._extract = extract_main
        self.min_words = min_words
        self.max_link_density = max_link_density

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        htmls = batch.column("html").to_pylist()
        texts, kept, total = [], [], []
        for h in htmls:
            t, k, n = self._extract(
                h, min_words=self.min_words,
                max_link_density=self.max_link_density)
            texts.append(t)
            kept.append(k)
            total.append(n)
        return pa.table({
            "url": pa.array(urls, type=pa.string()),
            "main_text": pa.array(texts, type=pa.string()),
            "n_kept": pa.array(kept, type=pa.int64()),
            "n_blocks": pa.array(total, type=pa.int64()),
        })


def main_content(ds, *, min_words: int = 10,
                 max_link_density: float = 0.4,
                 concurrency: int | None = 4, batch_size: int = 64):
    """(url, html) pages -> (url, main_text, n_kept, n_blocks):
    boilerplate removal — the CCNet/jusText step between raw crawl
    text and a training corpus. The reference extracts the FULL DOM
    text (crawler.go:262-292); this drops nav/sidebar/footer/link-farm
    blocks by the published word-count + link-density rules, so the
    planted-fixture golden oracles it exactly."""
    from rse_ray.util import clamp_pool

    return ds.map_batches(
        _MainContentExtractor,
        fn_constructor_kwargs={"min_words": min_words,
                               "max_link_density": max_link_density},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=clamp_pool(concurrency))


def webtext_clean(pages_ds, *, min_words: int = 10,
                  max_link_density: float = 0.4,
                  min_tokens: int = 60):
    """The composed web-to-training-corpus cleaning chain in one
    pipeline: (url, html) -> main-content extraction (boilerplate
    removal) -> token-length gate -> EXACT content dedup keeping the
    min url per text -> (url, n_tokens).

    Order matters and the planted fixture proves it: its syndicated
    pages re-publish another page's article under fresh boilerplate,
    so every RAW html is unique — dedup on the raw bytes finds
    nothing, dedup after boilerplate removal collapses each
    syndicate to one survivor. Scale shape: per-page parse in an
    actor pool, the gate is a per-batch filter, and the only shuffle
    moves (md5(text), url, n_tokens) rows — never the text."""
    import hashlib

    cleaned = main_content(pages_ds, min_words=min_words,
                           max_link_density=max_link_density,
                           batch_size=64)

    def gate(b: pa.Table) -> pa.Table:
        texts = b.column("main_text").to_pylist()
        n_tok = np.fromiter((len(t.split()) for t in texts),
                            dtype=np.int64, count=len(texts))
        keep = n_tok >= min_tokens
        hs = [hashlib.md5(t.encode("utf-8")).hexdigest()
              for t, k in zip(texts, keep) if k]
        return pa.table({
            "h": pa.array(hs, type=pa.string()),
            "url": pc.cast(b.column("url").filter(pa.array(keep)),
                           pa.string()),
            "n_tokens": pa.array(n_tok[keep]),
        })

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        r = g.sort_values("url").head(1)
        return r[["url", "n_tokens"]]

    return cleaned.map_batches(gate, batch_format="pyarrow") \
        .groupby("h").map_groups(keep_first, batch_format="pandas")
