"""Driver contract for the graft builder (Ray Data target).

entry()      — flagship: the full inverted-index build + BM25 top-k
               pipeline (html extract -> dedup -> segments -> merge ->
               search) over pages derived from sf0.001 documents.
queries()    — one callable per implemented operator/pipeline
               (SURVEY.md §2 + the training-data operator set):
               70 entries, 68 DuckDB-oracled (the two approximate ANN
               paths carry pytest recall oracles instead;
               knn_cosine_ivf_exact runs IVF at nprobe=nlist, which is
               provably exact and shares the brute-force SQL oracle).
oracle_sql() — DuckDB-equivalent SQL for every SQL-expressible entry;
               column names and rounding match the Ray results exactly.

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in rse_ray) calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

import pyarrow as pa

# ---------------------------------------------------------------------------
# shared constants (mirrored literally inside the oracle SQL strings)
# ---------------------------------------------------------------------------

BM25_QUERY = "spark window merge window"          # qtf: window=2
BM25_QUERY_SQL_TERMS = "('merge', 1), ('spark', 1), ('window', 2)"
PHRASE_QUERY = "hash join"                        # positional queries
# conjunctive (AND) query: rare terms, so the all-terms doc set is a
# STRICT subset of the top-20 OR result and the intersection path is
# genuinely exercised (12-18 qualifying docs at sf0.001/0.01)
CONJ_QUERY = "dup key line"
CONJ_QUERY_SQL_TERMS = "('dup', 1), ('key', 1), ('line', 1)"
# boolean-NOT retrieval: the OR query above, minus any doc containing
# an excluded term ("hash" is frequent, so the top-20 genuinely shifts)
NOT_TERMS = ["hash"]
NOT_TERMS_SQL = "('hash')"
PREFIX_QUERY = "s"  # expands to {scan, slow, small, sort, spark, stream}
# synonym-expanded retrieval: "merge scan" expands through SYN_MAP into
# five OR terms; "seek" is absent from the corpus and must drop out of
# both sides (scorer skips unknown terms, the oracle's df join prunes)
SYN_QUERY = "merge scan"
SYN_MAP = {"merge": ["join"], "scan": ["sort", "seek"]}
SYN_SQL_TERMS = "('join', 1), ('merge', 1), ('scan', 1), ('seek', 1), ('sort', 1)"
SUGGEST_K = 5   # 6 's'-terms exist, so the df-rank cut is genuine
# wildcard dictionary probe: s?a* -> {scan, spark} on the fixture vocab
WILDCARD_PATTERN = "s?a*"
CHAMP_M = 16    # champion-list length; head terms have df >> 16
WILDCARD_LIKE = "s_a%"
# query-log replay through the actor-pool batch scorer; the last query
# matches nothing and must contribute zero rows on both sides
BATCH_QUERIES = ["spark window", "hash join", "dup key",
                 "merge sort fast", "zzz nothing"]
BATCH_QUERIES_SQL_TERMS = (
    "(0, 'spark', 1), (0, 'window', 1), (1, 'hash', 1), (1, 'join', 1), "
    "(2, 'dup', 1), (2, 'key', 1), (3, 'fast', 1), (3, 'merge', 1), "
    "(3, 'sort', 1), (4, 'nothing', 1), (4, 'zzz', 1)")
BATCH_K = 10
# BM25F field split: title = first 8 tokens at weight 2, body = rest
BM25F_TITLE_LEN = 8
BM25F_W_TITLE = 2.0
# typo probes for fuzzy dictionary lookup: one deletion, one insertion,
# one substitution, one exact hit, one no-match
FUZZY_PROBES = ["joinn", "hask", "qery", "sort", "zzz"]
FUZZY_PROBES_SQL = "('joinn'), ('hask'), ('qery'), ('sort'), ('zzz')"
DELETE_DOC_IDS = [1, 2, 3]      # tombstoned docs (Lucene delete semantics)
# Rocchio pseudo-relevance feedback: top-10 hits assumed relevant,
# 5 expansion terms re-enter the query at weight 0.5 (exact in fp)
PRF_FB_DOCS, PRF_FB_TERMS, PRF_BETA = 10, 5, 0.5
SNIPPET_WIDTH = 12              # best-window snippet width in tokens
FILTER_LANG = "en"              # attribute-filtered retrieval
MLT_DOC_ID = 0                  # more-like-this source document
KNN_QUERY_IDS = [0, 1, 2, 3, 4]
JACCARD_THRESHOLD = 0.1
# 0.3, not 0.5: the synthetic embeddings' global max pairwise cosine is
# ~0.479, so 0.5 made cosine_neardup_pairs/semdedup vacuous 0-row/-drop
# oracles; at 0.3 the closest pair to the boundary is >=5.8e-7 away at
# every sf, so numpy-vs-DuckDB last-ulp summation differences can't
# flip membership
COS_NEARDUP_THRESHOLD = 0.3

# PII patterns are shared verbatim with the Ray operators (both engines
# are RE2, so the literal string IS the cross-engine contract); the
# plant CTE mirrors _pii_plant()'s doc_id formulas exactly
from rse_ray.pipelines.text import (PII_EMAIL as _PII_EMAIL,  # noqa: E402
                                    PII_IPV4 as _PII_IPV4,
                                    PII_PHONE as _PII_PHONE)

_PII_PLANT_CTE = """
WITH planted AS (
  SELECT doc_id, CASE
    WHEN doc_id % 3 = 1 THEN
      'Reach user' || doc_id || '@example.com or 10.' || (doc_id % 200)
      || '.' || ((doc_id * 7) % 200) || '.' || ((doc_id * 13) % 200)
      || ' now. ' || text
    WHEN doc_id % 3 = 2 THEN
      'Call +1 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
      || ' and mail admin' || doc_id || '@test.org; ' || text
    ELSE text END AS text
  FROM documents)
"""

# exact n-gram Jaccard pairs >= 0.5 over case-preserved whitespace
# tokens — the verified-pair contract shared by the minhash / cluster /
# keep-representative oracles
_JACCARD_PAIRS_CTE = """dd AS (SELECT doc_id,
            list_filter(regexp_split_to_array(text, '\\s+'),
                        x -> x <> '') AS arr FROM documents),
sh AS (SELECT doc_id, arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2] AS shingle
       FROM dd, unnest(range(1, len(arr) - 1)) AS t(i)
       UNION ALL  -- <3-token docs: one whole-doc shingle (hashing.shingles)
       SELECT doc_id, array_to_string(arr, ' ') FROM dd
       WHERE len(arr) BETWEEN 1 AND 2),
p AS (SELECT DISTINCT doc_id, shingle FROM sh),
sz AS (SELECT doc_id, count(*)::BIGINT AS n FROM p GROUP BY 1),
inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS c
          FROM p a JOIN p b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
vpairs AS (SELECT doc_a, doc_b,
                  round(c::DOUBLE / (sa.n + sb.n - c), 6) AS jaccard
           FROM inter JOIN sz sa ON doc_a = sa.doc_id
                JOIN sz sb ON doc_b = sb.doc_id
           WHERE c::DOUBLE / (sa.n + sb.n - c) >= 0.5)"""

# the tokenize CTE shared by every text oracle (matches
# rse_ray tokenize(stem=False): lower -> whitespace split -> drop empty)
_TOKS = """
WITH toks0 AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\\s+')) AS term
  FROM documents
), toks AS (SELECT doc_id, term FROM toks0 WHERE term <> '')
"""

_BM25_CTES_TMPL = (
    _TOKS
    + """,
p AS (SELECT term, doc_id, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks GROUP BY 1),
s AS (SELECT count(*)::DOUBLE AS n, sum(dl)::DOUBLE / count(*) AS avgdl FROM dl),
q(term, qtf) AS (VALUES {terms}),
d AS (SELECT term, count(*)::DOUBLE AS df FROM p GROUP BY 1),
scores AS (
  SELECT p.doc_id,
         sum(q.qtf * ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5)) *
             (p.tf * (1.2 + 1)) /
             (p.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl))) AS raw
  FROM p JOIN q USING (term) JOIN d USING (term)
       JOIN dl ON p.doc_id = dl.doc_id CROSS JOIN s
  GROUP BY p.doc_id)
"""
)
_BM25_CTES = _BM25_CTES_TMPL.format(terms=BM25_QUERY_SQL_TERMS)
_BM25_CTES_CONJ = _BM25_CTES_TMPL.format(terms=CONJ_QUERY_SQL_TERMS)


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def _read(sf_dir: str, table: str, columns=None):
    import ray.data

    return ray.data.read_parquet(
        os.path.join(sf_dir, f"{table}.parquet"), columns=columns
    )


def _finalize(result) -> Any:
    """Dataset/DataFrame -> pyarrow table with ns-timestamps cast to us
    (pandas round-trips inflate us -> ns; DuckDB speaks us)."""
    import pandas as pd

    if isinstance(result, pd.DataFrame):
        t = pa.Table.from_pandas(result, preserve_index=False)
    elif isinstance(result, pa.Table):
        t = result
    else:  # ray Dataset
        df = result.to_pandas()
        if df.empty and not len(df.columns):
            # an empty Dataset loses its columns through to_pandas —
            # rebuild the empty table from the Dataset's own schema so
            # the driver's schema comparison still sees the contract
            base = getattr(result.schema(), "base_schema", None)
            if isinstance(base, pa.Schema):
                return base.empty_table()
        t = pa.Table.from_pandas(df, preserve_index=False)
    fields = []
    changed = False
    for f in t.schema:
        if pa.types.is_timestamp(f.type) and f.type.unit != "us":
            fields.append(pa.field(f.name, pa.timestamp("us")))
            changed = True
        else:
            fields.append(f)
    return t.cast(pa.schema(fields)) if changed else t


# ---------------------------------------------------------------------------
# query implementations
# ---------------------------------------------------------------------------

def _q_doc_token_stats(sf_dir: str):
    from rse_ray.pipelines.text import doc_token_stats

    return _finalize(doc_token_stats(_read(sf_dir, "documents",
                                           ["doc_id", "text"])))


def _q_postings(sf_dir: str):
    from rse_ray.pipelines.text import postings

    return _finalize(postings(_read(sf_dir, "documents", ["doc_id", "text"])))


def _q_term_df(sf_dir: str):
    from rse_ray.pipelines.text import term_df

    return _finalize(term_df(_read(sf_dir, "documents", ["doc_id", "text"])))


def _q_corpus_stats(sf_dir: str):
    from rse_ray.pipelines.text import corpus_stats

    return _finalize(corpus_stats(_read(sf_dir, "documents", ["doc_id", "text"])))


def _q_langid_confusion(sf_dir: str):
    from rse_ray.pipelines.text import langid_confusion

    return _finalize(langid_confusion(
        _read(sf_dir, "documents", ["doc_id", "text", "lang"])))


def _q_zipf_slope(sf_dir: str):
    from rse_ray.pipelines.text import zipf_slope

    return _finalize(zipf_slope(
        _read(sf_dir, "documents", ["doc_id", "text"])))


def _q_negative_sampling_table(sf_dir: str):
    from rse_ray.pipelines.text import negative_sampling_table

    return _finalize(negative_sampling_table(
        _read(sf_dir, "documents", ["doc_id", "text"])))


def _q_vocab_growth(sf_dir: str):
    from rse_ray.pipelines.text import vocab_growth

    return _finalize(vocab_growth(
        _read(sf_dir, "documents", ["doc_id", "text"])))


def _q_bm25_scores(sf_dir: str):
    from rse_ray.pipelines.docsearch import bm25_documents

    return _finalize(bm25_documents(sf_dir, BM25_QUERY, k=None))


def _q_bm25_topk(sf_dir: str):
    from rse_ray.pipelines.docsearch import bm25_documents

    return _finalize(bm25_documents(sf_dir, BM25_QUERY, k=20))


def _q_bm25_page2(sf_dir: str):
    from rse_ray.pipelines.docsearch import bm25_documents_page

    return _finalize(bm25_documents_page(sf_dir, BM25_QUERY, k=20, page=2))


def _q_bm25_total_hits(sf_dir: str):
    from rse_ray.pipelines.docsearch import bm25_documents_total

    return _finalize(bm25_documents_total(sf_dir, BM25_QUERY))


def _q_bm25_prf(sf_dir: str):
    from rse_ray.pipelines.docsearch import bm25_documents_prf

    return _finalize(bm25_documents_prf(
        sf_dir, BM25_QUERY, k=20, fb_docs=PRF_FB_DOCS,
        fb_terms=PRF_FB_TERMS, beta=PRF_BETA))


def _q_index_stats(sf_dir: str):
    """Manifest-carried index metrics vs corpus ground truth: the
    engine side reads ONLY stats.json + shard term directories; the
    twin recounts everything from the documents table."""
    import pandas as pd

    from rse_ray.pipelines.docsearch import documents_index
    from rse_ray.pipelines.search import index_stats

    return _finalize(pd.DataFrame([index_stats(
        documents_index(sf_dir, stem=False))]))


def _q_bm25_snippets(sf_dir: str):
    from rse_ray.pipelines.docsearch import snippet_documents

    return _finalize(snippet_documents(sf_dir, BM25_QUERY, k=10,
                                       width=SNIPPET_WIDTH))


def _q_bm25_topk_distributed(sf_dir: str):
    from rse_ray.pipelines.docsearch import bm25_documents_distributed

    return _finalize(bm25_documents_distributed(sf_dir, BM25_QUERY, k=20))


def _q_retrieval_metrics(sf_dir: str):
    from rse_ray.pipelines.docsearch import retrieval_metrics

    return _finalize(retrieval_metrics(sf_dir, BATCH_QUERIES,
                                       k=BATCH_K))


# cumulative binary-relevance ideal DCG, injected into the SQL twin so
# both engines divide by the SAME constants (see retrieval_metrics)
def _idcg_values_sql(k: int) -> str:
    import math

    vals, acc = [(0, 0.0)], 0.0
    for i in range(1, k + 1):
        acc += 1.0 / math.log2(i + 1)
        vals.append((i, acc))
    return ", ".join(f"({m}, {v!r})" for m, v in vals)


LM_MU = 2000.0
LM_JM_LAMBDA = 0.1


def _q_lm_dirichlet_scores(sf_dir: str):
    from rse_ray.pipelines.docsearch import lm_dirichlet_documents

    return _finalize(lm_dirichlet_documents(
        sf_dir, BM25_QUERY, k=None, mu=LM_MU))


def _q_dfr_pl2_scores(sf_dir: str):
    from rse_ray.pipelines.docsearch import dfr_pl2_documents

    return _finalize(dfr_pl2_documents(sf_dir, BM25_QUERY, k=None,
                                       c=1.0))


def _q_lm_jm_scores(sf_dir: str):
    from rse_ray.pipelines.docsearch import lm_jm_documents

    return _finalize(lm_jm_documents(
        sf_dir, BM25_QUERY, k=None, lam=LM_JM_LAMBDA))


def _q_ltr_features(sf_dir: str):
    from rse_ray.pipelines.docsearch import ltr_features_documents

    return _finalize(ltr_features_documents(sf_dir, BM25_QUERY))


SPAN_SLOP = 3


def _q_span_near(sf_dir: str):
    from rse_ray.pipelines.docsearch import span_near_documents

    a, b = PHRASE_QUERY.split()
    return _finalize(span_near_documents(sf_dir, a, b, slop=SPAN_SLOP))


PHRASE_GAP = 1


def _q_phrase_gap(sf_dir: str):
    from rse_ray.pipelines.docsearch import phrase_gap_documents

    a, b = PHRASE_QUERY.split()
    return _finalize(phrase_gap_documents(sf_dir, a, b,
                                          gap=PHRASE_GAP))


def _q_bm25_maxscore(sf_dir: str):
    from rse_ray.pipelines.docsearch import bm25_maxscore_documents

    return _finalize(bm25_maxscore_documents(sf_dir, BM25_QUERY, k=20))


def _q_bm25_plus(sf_dir: str):
    from rse_ray.pipelines.docsearch import bm25_plus_documents

    return _finalize(bm25_plus_documents(sf_dir, BM25_QUERY, k=None))


def _q_bm25_champions(sf_dir: str):
    from rse_ray.pipelines.docsearch import bm25_champions_documents

    return _finalize(bm25_champions_documents(
        sf_dir, BM25_QUERY, k=20, m=CHAMP_M))


def _q_knn_cosine_sq_rerank(sf_dir: str):
    import os

    import ray.data

    from rse_ray.pipelines.ann import sq_rerank_knn

    emb = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"])
    return _finalize(sq_rerank_knn(emb, KNN_QUERY_IDS, k=10,
                                   shortlist=40))


def _q_hybrid_rrf(sf_dir: str):
    from rse_ray.pipelines.docsearch import hybrid_rrf_documents

    return _finalize(hybrid_rrf_documents(sf_dir, BM25_QUERY,
                                          KNN_QUERY_IDS[0]))


def _q_hybrid_combsum(sf_dir: str):
    from rse_ray.pipelines.docsearch import hybrid_combsum_documents

    return _finalize(hybrid_combsum_documents(sf_dir, BM25_QUERY,
                                              KNN_QUERY_IDS[0]))


def _q_bm25_proximity(sf_dir: str):
    from rse_ray.pipelines.docsearch import bm25_proximity

    return _finalize(bm25_proximity(sf_dir, BM25_QUERY))


def _q_bm25_topk_diverse(sf_dir: str):
    from rse_ray.pipelines.docsearch import bm25_topk_diverse

    return _finalize(bm25_topk_diverse(sf_dir, BM25_QUERY))


def _q_query_clarity(sf_dir: str):
    from rse_ray.pipelines.docsearch import query_clarity

    return _finalize(query_clarity(sf_dir, BM25_QUERY))


def _q_wildcard_terms(sf_dir: str):
    from rse_ray.pipelines.docsearch import wildcard_terms

    return _finalize(wildcard_terms(sf_dir, WILDCARD_PATTERN, k=SUGGEST_K))


def _q_bm25_synonyms(sf_dir: str):
    from rse_ray.pipelines.docsearch import bm25_documents_synonyms

    return _finalize(bm25_documents_synonyms(sf_dir, SYN_QUERY, SYN_MAP,
                                             k=20))


def _q_suggest_terms(sf_dir: str):
    from rse_ray.pipelines.docsearch import suggest_terms

    return _finalize(suggest_terms(sf_dir, PREFIX_QUERY, k=SUGGEST_K))


def _q_bm25f_scores(sf_dir: str):
    from rse_ray.pipelines.text import bm25f_scores

    return _finalize(bm25f_scores(
        _read(sf_dir, "documents", ["doc_id", "text"]), BM25_QUERY,
        title_len=BM25F_TITLE_LEN, w_title=BM25F_W_TITLE))


def _q_batch_bm25_topk(sf_dir: str):
    from rse_ray.pipelines.docsearch import batch_bm25_topk

    return _finalize(batch_bm25_topk(sf_dir, BATCH_QUERIES, k=BATCH_K))


def _q_normalize_text(sf_dir: str):
    """Unicode normalization over a deterministically-accented corpus:
    the fixture text is ASCII, so accents + messy whitespace are
    PLANTED (same construction in the SQL twin) to make the oracle
    check real normalization work, not an identity map."""
    from rse_ray.pipelines.text import normalize_text

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def plant(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_pylist()
        texts = b.column("text").to_pylist()
        planted = [None if t is None else f"Café-{i}  RÉSUMÉ naïve\t{t}"
                   for i, t in zip(ids, texts)]
        return pa.table({"doc_id": b.column("doc_id"),
                         "text": pa.array(planted, type=pa.string())})

    return _finalize(normalize_text(
        docs.map_batches(plant, batch_format="pyarrow")))


def _q_quality(sf_dir: str):
    from rse_ray.pipelines.text import quality_scores

    return _finalize(quality_scores(_read(sf_dir, "documents",
                                          ["doc_id", "text"])))


def _q_fingerprint(sf_dir: str):
    from rse_ray.pipelines.text import fingerprints

    return _finalize(fingerprints(_read(sf_dir, "documents", ["doc_id", "text"])))


def _pii_plant(ds):
    """Deterministically plant PII into ~2/3 of the docs (the fixture
    corpus has none): doc_id%3==1 gets an e-mail + IPv4, %3==2 a phone
    + e-mail, %3==0 stays clean so the zero path is exercised. Pure
    doc_id formulas — the SQL twin rebuilds the identical strings."""

    def plant(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_pylist()
        texts = b.column("text").to_pylist()
        out = []
        for i, t in zip(ids, texts):
            if t is None:
                out.append(None)
            elif i % 3 == 1:
                out.append(f"Reach user{i}@example.com or 10.{i % 200}."
                           f"{(i * 7) % 200}.{(i * 13) % 200} now. {t}")
            elif i % 3 == 2:
                out.append(f"Call +1 555-{i % 10000:04d} and mail "
                           f"admin{i}@test.org; {t}")
            else:
                out.append(t)
        return pa.table({"doc_id": b.column("doc_id"),
                         "text": pa.array(out, type=pa.string())})

    return ds.map_batches(plant, batch_format="pyarrow")


def _para_plant(ds):
    """Give each doc a 3-paragraph structure (the fixture is
    single-line): a head paragraph shared across the doc_id%7 class, a
    mostly-unique middle (first 80 chars), and a tail shared across
    doc_id%3 — so cross-doc AND cross-position duplicates both occur.
    Pure doc_id/text formulas, mirrored by _PARA_PLANT_CTE."""

    def plant(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_pylist()
        texts = b.column("text").to_pylist()
        out = [None if t is None else
               f"common paragraph {i % 7}\n{t[:80]}\ncommon paragraph {i % 3}"
               for i, t in zip(ids, texts)]
        return pa.table({"doc_id": b.column("doc_id"),
                         "text": pa.array(out, type=pa.string())})

    return ds.map_batches(plant, batch_format="pyarrow")


def _q_paragraph_dedup(sf_dir: str):
    from rse_ray.pipelines.dedup import paragraph_dedup

    return _finalize(paragraph_dedup(_para_plant(
        _read(sf_dir, "documents", ["doc_id", "text"]))))


BLOCK_PHRASES = ["merge join", "hash table", "fast scan", "dup key",
                 "window merge"]
CMS_PROBES = ["spark", "window", "hash", "the", "zzznope"]
PSL_RULES = ["com", "uk", "co.uk", "io", "github.io", "*.ck", "!www.ck"]
PSL_HOSTS = "/tmp/rse_ray_cache/psl_v1/hosts.parquet"


def _q_phrase_scan(sf_dir: str):
    from rse_ray.pipelines.text import phrase_scan

    return _finalize(phrase_scan(
        _read(sf_dir, "documents", ["doc_id", "text"]), BLOCK_PHRASES))


CONTAIN_THRESHOLD = 0.7


def _q_containment_pairs(sf_dir: str):
    from rse_ray.pipelines.dedup import ngram_jaccard_pairs

    return _finalize(ngram_jaccard_pairs(
        _read(sf_dir, "documents", ["doc_id", "text"]),
        threshold=CONTAIN_THRESHOLD, measure="containment"))


def _q_corpus_release(sf_dir: str):
    from rse_ray.pipelines.text import corpus_release

    return _finalize(corpus_release(
        _read(sf_dir, "documents",
              ["doc_id", "text", "lang", "source"])))


def _q_feature_hashing(sf_dir: str):
    from rse_ray.pipelines.text import feature_hashing

    return _finalize(feature_hashing(
        _read(sf_dir, "documents", ["doc_id", "text"])))


def _q_auto_stopwords(sf_dir: str):
    from rse_ray.pipelines.text import auto_stopwords

    return _finalize(auto_stopwords(
        _read(sf_dir, "documents", ["doc_id", "text"])))


def _q_sentence_split(sf_dir: str):
    from rse_ray.pipelines.text import sentence_split

    # plant sentence terminators (the fixture is punctuation-free):
    # pure substring formulas, mirrored in the SQL twin
    def plant(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_pylist()
        texts = b.column("text").to_pylist()
        out = [None if t is None else
               f"{t[:40]}. {t[40:80]}! What now? {t[80:100]}"
               for t in texts]
        return pa.table({"doc_id": b.column("doc_id"),
                         "text": pa.array(out, type=pa.string())})

    from rse_ray.pipelines.text import sentence_split as _ss

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return _finalize(_ss(docs.map_batches(plant,
                                          batch_format="pyarrow")))


def _q_freq_spectrum(sf_dir: str):
    from rse_ray.pipelines.text import freq_spectrum

    return _finalize(freq_spectrum(
        _read(sf_dir, "documents", ["doc_id", "text"])))


def _q_mix_plan(sf_dir: str):
    from rse_ray.pipelines.text import mix_plan

    return _finalize(mix_plan(
        _read(sf_dir, "documents", ["doc_id", "text", "source"])))


def _q_mix_epochs(sf_dir: str):
    from rse_ray.pipelines.text import mix_epochs

    return _finalize(mix_epochs(
        _read(sf_dir, "documents", ["doc_id", "text", "source"])))


def _q_content_chunks(sf_dir: str):
    from rse_ray.pipelines.text import content_chunks

    return _finalize(content_chunks(
        _read(sf_dir, "documents", ["doc_id", "text"])))


def _q_dup_chunks(sf_dir: str):
    from rse_ray.pipelines.text import dup_chunks

    return _finalize(dup_chunks(
        _read(sf_dir, "documents", ["doc_id", "text"])))


def _q_canonical_dedup(sf_dir: str):
    import ray.data

    from rse_ray.pipelines.linkgraph import canonical_dedup
    from rse_ray.sources.fixtures import generate_canonical_fixture

    generate_canonical_fixture(CANON_URLS)
    return _finalize(canonical_dedup(ray.data.read_parquet(CANON_URLS)))


def _q_registrable_domains(sf_dir: str):
    import ray.data

    from rse_ray.pipelines.linkgraph import registrable_domains
    from rse_ray.sources.fixtures import generate_psl_fixture

    generate_psl_fixture(PSL_HOSTS)
    return _finalize(registrable_domains(
        ray.data.read_parquet(PSL_HOSTS), PSL_RULES))


def _q_cms_term_counts(sf_dir: str):
    from rse_ray.pipelines.sketch import cms_term_counts

    return _finalize(cms_term_counts(
        _read(sf_dir, "documents", ["doc_id", "text"]), CMS_PROBES))


def _q_codec_size_report(sf_dir: str):
    from rse_ray.pipelines.text import codec_size_report

    return _finalize(codec_size_report(
        _read(sf_dir, "documents", ["doc_id", "text"])))


def _q_mlm_mask_plan(sf_dir: str):
    from rse_ray.pipelines.text import mlm_mask_plan

    return _finalize(mlm_mask_plan(
        _read(sf_dir, "documents", ["doc_id", "text"])))


def _q_gopher_rules(sf_dir: str):
    from rse_ray.pipelines.text import gopher_rules

    # plant junk into the doc_id%11 class so the alpha/symbol rules
    # discriminate (the clean fixture is all-alphabetic)
    def plant(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_pylist()
        texts = b.column("text").to_pylist()
        out = [None if t is None else
               (f"{t} 123 456 ### wait... no..." if i % 11 == 0 else t)
               for i, t in zip(ids, texts)]
        return pa.table({"doc_id": b.column("doc_id"),
                         "text": pa.array(out, type=pa.string())})

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return _finalize(gopher_rules(
        docs.map_batches(plant, batch_format="pyarrow")))


def _q_zorder_key(sf_dir: str):
    from rse_ray.pipelines.relational import zorder_key

    return _finalize(zorder_key(
        _read(sf_dir, "events", ["event_id", "user_id"]),
        x_col="user_id", y_col="event_id",
        keep_cols=["event_id", "user_id"]))


def _q_warc_source_docs(sf_dir: str):
    from rse_ray.sources.formats import documents_warc

    return _finalize(documents_warc(sf_dir))


def _q_pushdown_scan(sf_dir: str):
    from rse_ray.sources.formats import pushdown_scan

    return _finalize(pushdown_scan(sf_dir))


def _q_grouping_sets(sf_dir: str):
    from rse_ray.pipelines.relational import grouping_sets_counts

    return _finalize(grouping_sets_counts(
        _read(sf_dir, "documents", ["lang", "source", "n_chars"])))


def _q_ttl_dedup(sf_dir: str):
    from rse_ray.pipelines.relational import ttl_dedup

    return _finalize(ttl_dedup(
        _read(sf_dir, "events",
              ["user_id", "event_type", "ts", "event_id"])))


def _q_skew_report(sf_dir: str):
    from rse_ray.pipelines.relational import skew_report

    return _finalize(skew_report(
        _read(sf_dir, "events", ["event_type"]), key="event_type"))


def _q_lineitem_corr(sf_dir: str):
    from rse_ray.pipelines.relational import group_corr

    return _finalize(group_corr(
        _read(sf_dir, "lineitem",
              ["l_returnflag", "l_quantity", "l_extendedprice"]),
        group="l_returnflag", x="l_quantity", y="l_extendedprice",
        out_col="corr_qty_price"))


def _q_pii_counts(sf_dir: str):
    from rse_ray.pipelines.text import pii_counts

    return _finalize(pii_counts(_pii_plant(
        _read(sf_dir, "documents", ["doc_id", "text"]))))


def _q_pii_redact(sf_dir: str):
    from rse_ray.pipelines.text import pii_redact

    return _finalize(pii_redact(_pii_plant(
        _read(sf_dir, "documents", ["doc_id", "text"]))))


def _q_regex_token_counts(sf_dir: str):
    from rse_ray.pipelines.text import regex_token_counts

    return _finalize(regex_token_counts(_read(sf_dir, "documents",
                                              ["doc_id", "text"])))


def _q_winnow_fingerprints(sf_dir: str):
    from rse_ray.pipelines.text import winnow_fingerprints

    return _finalize(winnow_fingerprints(_read(sf_dir, "documents",
                                               ["doc_id", "text"])))


def _q_lang_id(sf_dir: str):
    from rse_ray.pipelines.text import lang_id

    return _finalize(lang_id(_read(sf_dir, "documents", ["doc_id", "text"])))


def _q_exact_dedup(sf_dir: str):
    from rse_ray.pipelines.dedup import exact_dedup

    return _finalize(exact_dedup(_read(sf_dir, "documents", ["doc_id", "text"])))


def _q_last_writer(sf_dir: str):
    from rse_ray.pipelines.dedup import last_writer_dedup

    keep = ["user_id", "event_id", "ts", "event_type", "value"]
    return _finalize(
        last_writer_dedup(_read(sf_dir, "events", keep), "user_id", "ts",
                          "event_id", keep)
    )


def _q_ngram_jaccard(sf_dir: str):
    from rse_ray.pipelines.dedup import ngram_jaccard_pairs

    return _finalize(
        ngram_jaccard_pairs(_read(sf_dir, "documents", ["doc_id", "text"]),
                            threshold=JACCARD_THRESHOLD, max_bucket=10**9)
    )


_MINHASH_PAIRS_MEMO: dict[str, Any] = {}


def _minhash_pairs_df(sf_dir: str):
    """The verified near-dup pair list feeds three queries
    (minhash_dedup_pairs, dup_clusters, dedup_keep_representative);
    memoize it per sf_dir so the MinHash pipeline runs once."""
    if sf_dir not in _MINHASH_PAIRS_MEMO:
        from rse_ray.pipelines.dedup import minhash_dedup_pairs

        _MINHASH_PAIRS_MEMO[sf_dir] = minhash_dedup_pairs(
            _read(sf_dir, "documents", ["doc_id", "text"]), threshold=0.5
        )
    return _MINHASH_PAIRS_MEMO[sf_dir]


def _q_minhash_pairs(sf_dir: str):
    return _finalize(_minhash_pairs_df(sf_dir))


def _q_dup_clusters(sf_dir: str):
    from rse_ray.pipelines.dedup import dup_clusters

    return _finalize(dup_clusters(pairs=_minhash_pairs_df(sf_dir)))


def _q_dup_graph_stats(sf_dir: str):
    from rse_ray.pipelines.dedup import dup_graph_stats

    return _finalize(dup_graph_stats(pairs=_minhash_pairs_df(sf_dir)))


def _q_keep_representative(sf_dir: str):
    from rse_ray.pipelines.dedup import dedup_keep_representative

    return _finalize(
        dedup_keep_representative(
            _read(sf_dir, "documents", ["doc_id", "text"]),
            pairs=_minhash_pairs_df(sf_dir),
        )
    )


def _q_simhash_pairs(sf_dir: str):
    from rse_ray.pipelines.dedup import simhash_dup_pairs

    return _finalize(
        simhash_dup_pairs(_read(sf_dir, "documents", ["doc_id", "text"]),
                          max_hamming=3)
    )


def _q_knn(sf_dir: str):
    from rse_ray.pipelines.ann import brute_force_knn

    return _finalize(
        brute_force_knn(_read(sf_dir, "embeddings", ["vec_id", "embedding"]),
                        KNN_QUERY_IDS, k=10)
    )


def _q_knn_sq(sf_dir: str):
    from rse_ray.pipelines.ann import sq_knn

    return _finalize(
        sq_knn(_read(sf_dir, "embeddings", ["vec_id", "embedding"]),
               KNN_QUERY_IDS, k=10)
    )


def _q_knn_pq(sf_dir: str):
    """PQ is k-means-trained (lossy, sample-dependent) — recall-tested
    in pytest like LSH/IVF, deliberately not SQL-oracled."""
    from rse_ray.pipelines.ann import pq_knn

    return _finalize(
        pq_knn(_read(sf_dir, "embeddings", ["vec_id", "embedding"]),
               KNN_QUERY_IDS, k=10)
    )


def _q_lsh_knn(sf_dir: str):
    from rse_ray.pipelines.ann import lsh_knn

    return _finalize(
        lsh_knn(_read(sf_dir, "embeddings", ["vec_id", "embedding"]),
                KNN_QUERY_IDS, k=10)
    )


def _q_hnsw_knn(sf_dir: str):
    """Sharded-HNSW approximate kNN (recall-oracled in pytest like
    LSH/IVF/PQ; the driver records a rows-only check)."""
    from rse_ray.pipelines.ann import hnsw_knn

    return _finalize(
        hnsw_knn(_read(sf_dir, "embeddings", ["vec_id", "embedding"]),
                 KNN_QUERY_IDS, k=10, n_shards=4, ef_search=128)
    )


def _q_ivf_knn(sf_dir: str):
    from rse_ray.pipelines.ann import ivf_knn

    return _finalize(
        ivf_knn(_read(sf_dir, "embeddings", ["vec_id", "embedding"]),
                KNN_QUERY_IDS, k=10, nlist=16, nprobe=4)
    )


def _q_ivf_knn_exact(sf_dir: str):
    # nprobe = nlist probes EVERY inverted list, so the IVF machinery
    # (sampled quantizer, assign matmul, per-list knn, driver reduce)
    # is exercised end-to-end while the result is provably exact —
    # the same SQL oracle as knn_cosine applies (round-2 VERDICT #3)
    from rse_ray.pipelines.ann import ivf_knn

    return _finalize(
        ivf_knn(_read(sf_dir, "embeddings", ["vec_id", "embedding"]),
                KNN_QUERY_IDS, k=10, nlist=8, nprobe=8)
    )


def _q_centroids(sf_dir: str):
    from rse_ray.pipelines.ann import label_centroids

    return _finalize(label_centroids(_read(sf_dir, "embeddings",
                                           ["vec_id", "embedding", "label"])))


KMEANS_K, KMEANS_ITERS = 4, 3


def _q_kmeans_clusters(sf_dir: str):
    from rse_ray.pipelines.ann import kmeans_fit_predict

    return _finalize(kmeans_fit_predict(
        _read(sf_dir, "embeddings", ["vec_id", "embedding"]),
        k=KMEANS_K, iters=KMEANS_ITERS))


def _q_semdedup(sf_dir: str):
    from rse_ray.pipelines.ann import semdedup

    return _finalize(semdedup(
        _read(sf_dir, "embeddings", ["vec_id", "embedding"]),
        k=KMEANS_K, iters=KMEANS_ITERS,
        threshold=COS_NEARDUP_THRESHOLD))


def _q_webdataset_shards(sf_dir: str):
    import hashlib
    import os

    from rse_ray.sinks import write_webdataset

    out = os.path.join(
        "/tmp/rse_ray_cache",
        "wds_" + hashlib.md5(os.path.abspath(sf_dir).encode())
        .hexdigest()[:12])
    return _finalize(write_webdataset(
        _read(sf_dir, "documents", ["doc_id", "text"]),
        out, num_shards=8))


AC_PATTERNS = ["spark", "window merge", "hash join",
               "batch stream", "dup", "key order"]


def _q_mrf_sd_scores(sf_dir: str):
    from rse_ray.pipelines.text import mrf_sd_scores

    return _finalize(mrf_sd_scores(
        _read(sf_dir, "documents", ["doc_id", "text"]),
        BM25_QUERY, mu=2000.0, k=20))


def _q_multi_pattern_scan(sf_dir: str):
    from rse_ray.pipelines.text import multi_pattern_scan

    return _finalize(multi_pattern_scan(
        _read(sf_dir, "documents", ["doc_id", "text"]),
        AC_PATTERNS))


def _q_lead_terms(sf_dir: str):
    from rse_ray.pipelines.text import lead_terms

    return _finalize(lead_terms(
        _read(sf_dir, "documents", ["doc_id", "text"]),
        k=20, min_df=10))


def _q_fightin_words(sf_dir: str):
    from rse_ray.pipelines.text import fightin_words

    return _finalize(fightin_words(
        _read(sf_dir, "documents", ["doc_id", "text", "source"]),
        source_a="src0", source_b="src1", a0=10.0, k=20))


def _q_otsu_threshold(sf_dir: str):
    from rse_ray.pipelines.text import otsu_threshold

    return _finalize(otsu_threshold(
        _read(sf_dir, "documents", ["doc_id", "text"])))


def _q_heaps_fit(sf_dir: str):
    from rse_ray.pipelines.text import heaps_fit

    return _finalize(heaps_fit(
        _read(sf_dir, "documents", ["doc_id", "text"])))


def _q_burrows_delta(sf_dir: str):
    from rse_ray.pipelines.text import burrows_delta

    return _finalize(burrows_delta(
        _read(sf_dir, "documents", ["doc_id", "text", "source"]),
        top_m=30))


def _q_langid_kappa(sf_dir: str):
    from rse_ray.pipelines.text import langid_kappa

    return _finalize(langid_kappa(
        _read(sf_dir, "documents", ["doc_id", "text", "lang"])))


def _q_rbo_source_drift(sf_dir: str):
    from rse_ray.pipelines.text import rbo_source_drift

    return _finalize(rbo_source_drift(
        _read(sf_dir, "documents", ["doc_id", "text", "source"]),
        source_a="src0", source_b="src1", depth=50))


def _q_source_gini(sf_dir: str):
    from rse_ray.pipelines.text import source_gini

    return _finalize(source_gini(
        _read(sf_dir, "documents", ["doc_id", "source"])))


def _q_info_gain_terms(sf_dir: str):
    from rse_ray.pipelines.text import info_gain_terms

    return _finalize(info_gain_terms(
        _read(sf_dir, "documents", ["doc_id", "text", "source"]),
        k=20))


def _q_nb_classify(sf_dir: str):
    from rse_ray.pipelines.text import nb_classify

    return _finalize(nb_classify(
        _read(sf_dir, "documents", ["doc_id", "text", "source"])))


def _q_cos_neardup(sf_dir: str):
    from rse_ray.pipelines.ann import cosine_neardup_pairs

    return _finalize(
        cosine_neardup_pairs(
            _read(sf_dir, "embeddings", ["vec_id", "embedding", "label"]),
            threshold=COS_NEARDUP_THRESHOLD,
        )
    )


def _q_pricing(sf_dir: str):
    from rse_ray.pipelines.relational import pricing_summary

    cols = ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
            "l_discount", "l_shipdate"]
    return _finalize(pricing_summary(_read(sf_dir, "lineitem", cols)))


def _q_top_orders(sf_dir: str):
    from rse_ray.pipelines.relational import top_orders

    return _finalize(top_orders(_read(sf_dir, "orders",
                                      ["o_orderkey", "o_totalprice"])))


def _q_revenue(sf_dir: str):
    from rse_ray.pipelines.relational import revenue_filter

    return _finalize(
        revenue_filter(
            _read(sf_dir, "lineitem",
                  ["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"]),
            date_lo="1996-01-01", date_hi="1997-01-01",
        )
    )


def _q_semi_join(sf_dir: str):
    from rse_ray.pipelines.relational import semi_join_customers_with_orders

    return _finalize(
        semi_join_customers_with_orders(
            _read(sf_dir, "customer", ["c_custkey", "c_name"]),
            _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]),
            min_total=400.0,
        )
    )


def _q_orders_by_segment(sf_dir: str):
    from rse_ray.pipelines.relational import orders_by_segment

    return _finalize(
        orders_by_segment(
            _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"]),
            _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]),
        )
    )


def _q_window_agg(sf_dir: str):
    from rse_ray.pipelines.relational import window_agg

    return _finalize(window_agg(_read(sf_dir, "events",
                                      ["event_id", "ts", "event_type", "value"])))


LATE_WINDOW, LATE_ALLOWED = "h", "5d"


def _q_window_agg_late(sf_dir: str):
    from rse_ray.pipelines.relational import window_agg_late

    return _finalize(window_agg_late(
        _read(sf_dir, "events", ["event_id", "ts", "event_type", "value"]),
        window=LATE_WINDOW, lateness=LATE_ALLOWED))


def _q_hopping_window_agg(sf_dir: str):
    from rse_ray.pipelines.relational import hopping_window_agg

    return _finalize(hopping_window_agg(
        _read(sf_dir, "events", ["ts", "event_type", "value"]),
        window="3h", hop="h",
    ))


def _asof_inputs(sf_dir: str):
    import pyarrow.compute as pc

    left = _read(sf_dir, "events",
                 ["event_id", "ts", "user_id", "event_type", "value"])
    right = _read(sf_dir, "events", ["ts", "user_id", "event_type", "value"])\
        .map_batches(
            lambda t: t.filter(pc.equal(t.column("event_type"), "purchase"))
                       .select(["user_id", "ts", "value"]),
            batch_format="pyarrow",
        )
    return left, right


def _q_asof_last_purchase(sf_dir: str):
    from rse_ray.pipelines.relational import asof_join

    left, right = _asof_inputs(sf_dir)
    out = asof_join(left, right, on="ts", by="user_id", value_col="value",
                    out_col="last_purchase_value", strategy="broadcast")
    return _finalize(out.select_columns(
        ["event_id", "user_id", "event_type", "value",
         "last_purchase_value"]))


def _q_asof_last_purchase_partitioned(sf_dir: str):
    from rse_ray.pipelines.relational import asof_join

    left, right = _asof_inputs(sf_dir)
    out = asof_join(left, right, on="ts", by="user_id", value_col="value",
                    out_col="last_purchase_value", strategy="partitioned")
    return _finalize(out.select_columns(
        ["event_id", "user_id", "event_type", "value",
         "last_purchase_value"]))


def _q_orders_customer_join(sf_dir: str):
    from rse_ray.pipelines.relational import hash_join

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_totalprice"])
    customer = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    return _finalize(hash_join(
        orders, customer, left_on="o_custkey", right_on="c_custkey",
        right_cols=["c_mktsegment"],
    ).select_columns(["o_orderkey", "o_custkey", "o_totalprice",
                      "c_mktsegment"]))


def _q_orders_customer_left_join(sf_dir: str):
    """LEFT OUTER: only BUILDING-segment customers on the right, so a
    large fraction of orders come back null-padded."""
    import pyarrow.compute as pc

    from rse_ray.pipelines.relational import hash_join

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    customer = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]) \
        .map_batches(
            lambda t: t.filter(pc.equal(t.column("c_mktsegment"),
                                        "BUILDING")),
            batch_format="pyarrow")
    return _finalize(hash_join(
        orders, customer, left_on="o_custkey", right_on="c_custkey",
        right_cols=["c_mktsegment"], how="left",
    ).select_columns(["o_orderkey", "o_custkey", "c_mktsegment"]))


def _q_train_val_split(sf_dir: str):
    from rse_ray.pipelines.relational import train_val_split

    return _finalize(train_val_split(
        _read(sf_dir, "documents", ["doc_id", "lang"]),
        key="doc_id", val_pct=10,
    ))


def _q_top_docs_per_lang(sf_dir: str):
    from rse_ray.pipelines.relational import top_k_per_group

    return _finalize(top_k_per_group(
        _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"]),
        group="lang", order="n_chars", k=2, tie="doc_id",
    ))


def _q_sessions(sf_dir: str):
    from rse_ray.pipelines.relational import sessionize

    return _finalize(sessionize(
        _read(sf_dir, "events", ["user_id", "ts", "value"]),
        gap_minutes=1440,  # 24h: the fixture's users act daily
    ))


def _q_session_attribution(sf_dir: str):
    """Interval (containment) join: every event gains the
    session_start of the session that contains it — sessions come from
    the SAME gap-sessionization the `sessions` query gates, so the
    oracle reuses that CTE plus a BETWEEN join."""
    from rse_ray.pipelines.relational import interval_join, sessionize

    spans = sessionize(
        _read(sf_dir, "events", ["user_id", "ts", "value"]),
        gap_minutes=1440)
    return _finalize(interval_join(
        _read(sf_dir, "events", ["event_id", "user_id", "ts"]),
        spans, key="user_id", ts_col="ts",
        lo_col="session_start", hi_col="session_end",
        id_col="event_id"))


def _q_group_quantiles(sf_dir: str):
    from rse_ray.pipelines.relational import group_quantiles

    return _finalize(group_quantiles(
        _read(sf_dir, "lineitem", ["l_returnflag", "l_extendedprice"]),
        group="l_returnflag", col="l_extendedprice",
    ))


BIG_ORDER_THRESHOLD = 300_000


def _q_customers_without_orders(sf_dir: str):
    """Customers with no order above the threshold — the co-partitioned
    ANTI join (NOT EXISTS). The threshold filter runs inside the
    orders read's batches (only keys ship into the exchange)."""
    import pyarrow.compute as pc

    from rse_ray.pipelines.relational import hash_join

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]) \
        .map_batches(
            lambda t: t.filter(pc.greater(t.column("o_totalprice"),
                                          BIG_ORDER_THRESHOLD))
                       .select(["o_custkey"]),
            batch_format="pyarrow",
        )
    return _finalize(hash_join(cust, orders, left_on="c_custkey",
                               right_on="o_custkey", right_cols=[],
                               how="anti"))


def _q_tfidf_topk(sf_dir: str):
    from rse_ray.pipelines.text import tfidf_topk

    return _finalize(tfidf_topk(
        _read(sf_dir, "documents", ["doc_id", "text"]), k=3))


def _q_pack_sequences(sf_dir: str):
    from rse_ray.pipelines.text import pack_sequences

    return _finalize(pack_sequences(
        _read(sf_dir, "documents", ["doc_id", "text"]), budget=512))


def _q_bigram_counts(sf_dir: str):
    from rse_ray.pipelines.text import bigram_counts

    return _finalize(bigram_counts(
        _read(sf_dir, "documents", ["doc_id", "text"]), top_n=50))


def _q_significant_terms(sf_dir: str):
    from rse_ray.pipelines.text import significant_terms

    return _finalize(significant_terms(
        _read(sf_dir, "documents", ["doc_id", "text", "lang"]),
        fg_lang="en"))


def _q_llr_bigrams(sf_dir: str):
    from rse_ray.pipelines.text import llr_bigrams

    return _finalize(llr_bigrams(
        _read(sf_dir, "documents", ["doc_id", "text"]),
        min_count=5, top_n=50))


def _q_group_ols(sf_dir: str):
    from rse_ray.pipelines.relational import group_ols

    return _finalize(group_ols(
        _read(sf_dir, "lineitem",
              ["l_returnflag", "l_quantity", "l_extendedprice"]),
        group="l_returnflag", x="l_quantity", y="l_extendedprice"))


def _q_fuzzy_pairs(sf_dir: str):
    from rse_ray.pipelines.dedup import fuzzy_pairs

    return _finalize(fuzzy_pairs(
        _read(sf_dir, "customer", ["c_name"]), col="c_name"))


def _q_market_basket(sf_dir: str):
    from rse_ray.pipelines.relational import market_basket

    return _finalize(market_basket(
        _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"]),
        min_pair=2))


def _q_trending_event_types(sf_dir: str):
    from rse_ray.pipelines.relational import trending_event_types

    return _finalize(trending_event_types(
        _read(sf_dir, "events", ["ts", "event_type"]), window_days=7))


def _q_ab_test_welch(sf_dir: str):
    from rse_ray.pipelines.relational import ab_test_welch

    return _finalize(ab_test_welch(
        _read(sf_dir, "events", ["event_type", "value"]),
        group_a="click", group_b="purchase"))


def _q_mmr_rerank(sf_dir: str):
    from rse_ray.pipelines.ann import mmr_rerank

    return _finalize(mmr_rerank(
        _read(sf_dir, "embeddings", ["vec_id", "embedding"]),
        KNN_QUERY_IDS[0], pool=20, k=5, lam=0.7))


BOOL_QUERY = "(key AND table) OR (fast AND NOT slow)"

# the registered percolator bank (fixture-vocab terms), shared by the
# Ray pipeline and the generated SQL twin
PERC_QUERIES = [
    "key AND table",
    "fast AND NOT slow",
    "(big OR small) AND vector",
    "dup",
    "NOT the",
    "stream AND window AND NOT batch",
    "(join AND hash) OR (sort AND merge)",
    "query AND NOT (slow OR fast)",
]


def _bool_expr_sql(node) -> str:
    """Compile a queryparse AST to a SQL boolean over t_<term> flags
    (same tree the Ray evaluator runs — one shared contract)."""
    kind = node[0]
    if kind == "term":
        return f"t_{node[1]}"
    if kind == "not":
        return f"(NOT {_bool_expr_sql(node[1])})"
    op = " AND " if kind == "and" else " OR "
    return "(" + op.join(_bool_expr_sql(c) for c in node[1]) + ")"


def _percolate_sql() -> str:
    from rse_ray.functions.queryparse import parse, query_terms

    asts = [parse(q) for q in PERC_QUERIES]
    terms = sorted(set().union(*(query_terms(a) for a in asts)))
    flags = ",\n        ".join(
        f"bool_or(term = '{t}') AS t_{t}" for t in terms)
    coal = ", ".join(f"coalesce(d.t_{t}, FALSE) AS t_{t}" for t in terms)
    arms = "\nUNION ALL ".join(
        f"SELECT doc_id, {qi}::BIGINT AS query_id FROM f "
        f"WHERE {_bool_expr_sql(a)}"
        for qi, a in enumerate(asts))
    return (_TOKS + f""",
d AS (SELECT doc_id,
        {flags}
      FROM toks GROUP BY 1),
u AS (SELECT doc_id FROM documents WHERE text IS NOT NULL),
f AS (SELECT u.doc_id, {coal} FROM u LEFT JOIN d USING (doc_id))
{arms}""")


def _q_shipping_priority(sf_dir: str):
    from rse_ray.pipelines.relational import shipping_priority

    return _finalize(shipping_priority(
        _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]),
        _read(sf_dir, "orders",
              ["o_orderkey", "o_custkey", "o_orderdate"]),
        _read(sf_dir, "lineitem",
              ["l_orderkey", "l_extendedprice", "l_discount",
               "l_shipdate"])))


def _q_winsorized_mean(sf_dir: str):
    from rse_ray.pipelines.relational import winsorized_mean

    return _finalize(winsorized_mean(
        _read(sf_dir, "events", ["event_type", "value"])))


def _q_consistent_hash_moves(sf_dir: str):
    from rse_ray.pipelines.relational import consistent_hash_moves

    return _finalize(consistent_hash_moves(
        _read(sf_dir, "documents", ["doc_id"])))


def _q_rag_chunk_search(sf_dir: str):
    from rse_ray.pipelines.text import rag_chunk_search

    return _finalize(rag_chunk_search(
        _read(sf_dir, "documents", ["doc_id", "text"]), 0,
        dim=64, chunk=8, overlap=2, k=10))


DYM_QUERIES = ["tablz", "quer", "streamm", "vector", "zzzzz"]


def _q_did_you_mean(sf_dir: str):
    from rse_ray.pipelines.text import did_you_mean

    return _finalize(did_you_mean(
        _read(sf_dir, "documents", ["doc_id", "text"]), DYM_QUERIES))


def _q_condensation_layers(sf_dir: str):
    import ray.data

    from rse_ray.pipelines.linkgraph import condensation_layers

    return _finalize(condensation_layers(
        ray.data.read_parquet(_scc_graph_links_path())))


SPEC_DIR = "/tmp/rse_ray_cache/media_spec_v1"


def _q_group_moments(sf_dir: str):
    from rse_ray.pipelines.relational import group_moments

    return _finalize(group_moments(
        _read(sf_dir, "events", ["event_type", "value"])))


def _q_hill_tail_index(sf_dir: str):
    from rse_ray.pipelines.text import hill_tail_index

    return _finalize(hill_tail_index(
        _read(sf_dir, "documents", ["doc_id", "text"]), k=20))


def _q_arrow_ipc_counts(sf_dir: str):
    """Arrow IPC (Feather v2) source: shard documents into .arrow
    files, read back via read_binary_files + per-file IPC decode, and
    aggregate — proves the interchange-format path end to end."""
    import pyarrow.compute as _pc

    from ray.data.aggregate import Sum

    from rse_ray.sources.formats import documents_arrow_ipc

    ds = documents_arrow_ipc(sf_dir)

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["lang", "source"]).aggregate(
            [("n_chars", "sum"), ([], "count_all")])
        return pa.table({"lang": g.column("lang"),
                         "source": g.column("source"),
                         "nc_p": g.column("n_chars_sum"),
                         "n_p": g.column("count_all")})

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(["lang", "source"]).aggregate(
            Sum("nc_p", alias_name="sum_chars"),
            Sum("n_p", alias_name="n_docs"))
    return _finalize(agg.map_batches(
        lambda b: pa.table({
            "lang": b.column("lang"), "source": b.column("source"),
            "sum_chars": _pc.cast(b.column("sum_chars"), pa.int64()),
            "n_docs": _pc.cast(b.column("n_docs"), pa.int64()),
        }), batch_format="pyarrow"))


def _q_audio_spectrogram(sf_dir: str):
    """Framewise banded spectrogram over the real WAV decode —
    golden-oracled pre-encode like audio_rms_windows."""
    import ray.data

    from rse_ray.pipelines.multimodal import (audio_spectrogram,
                                              write_spectrogram_fixture)

    write_spectrogram_fixture(SPEC_DIR)
    ds = ray.data.read_parquet(os.path.join(SPEC_DIR, "media.parquet"))
    return _finalize(audio_spectrogram(ds))


def _q_fk_violations(sf_dir: str):
    from rse_ray.pipelines.relational import fk_violations

    return _finalize(fk_violations(
        _read(sf_dir, "customer", ["c_custkey"]),
        _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]),
        _read(sf_dir, "lineitem", ["l_orderkey"])))


def _q_conversion_latency(sf_dir: str):
    from rse_ray.pipelines.relational import conversion_latency

    return _finalize(conversion_latency(
        _read(sf_dir, "events",
              ["user_id", "ts", "event_id", "event_type"])))


def _q_user_growth_curve(sf_dir: str):
    from rse_ray.pipelines.relational import user_growth_curve

    return _finalize(user_growth_curve(
        _read(sf_dir, "events", ["user_id", "ts"])))


def _q_local_supplier_volume(sf_dir: str):
    from rse_ray.pipelines.relational import local_supplier_volume

    return _finalize(local_supplier_volume(
        _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]),
        _read(sf_dir, "orders",
              ["o_orderkey", "o_custkey", "o_orderdate"]),
        _read(sf_dir, "lineitem",
              ["l_orderkey", "l_suppkey", "l_extendedprice",
               "l_discount"]),
        _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]),
        _read(sf_dir, "nation",
              ["n_nationkey", "n_name", "n_regionkey"]),
        _read(sf_dir, "region", ["r_regionkey", "r_name"]),
        region="ASIA"))


def _q_quality_threshold_sweep(sf_dir: str):
    from rse_ray.pipelines.relational import quality_threshold_sweep

    return _finalize(quality_threshold_sweep(
        _read(sf_dir, "documents", ["doc_id", "text"])))


SCENE_DIR = "/tmp/rse_ray_cache/video_cuts_v1"


def _q_video_scene_cuts(sf_dir: str):
    """Shot-boundary detection over the real RVID decode —
    golden-oracled pre-encode like the other media kernels."""
    import ray.data

    from rse_ray.pipelines.multimodal import (video_scene_cuts,
                                              write_scene_video_fixture)

    write_scene_video_fixture(SCENE_DIR)
    ds = ray.data.read_parquet(os.path.join(SCENE_DIR,
                                            "media.parquet"))
    return _finalize(video_scene_cuts(ds))


def _q_small_quantity_revenue(sf_dir: str):
    from rse_ray.pipelines.relational import small_quantity_revenue

    return _finalize(small_quantity_revenue(
        _read(sf_dir, "lineitem",
              ["l_partkey", "l_quantity", "l_extendedprice"])))


def _q_daily_anomalies(sf_dir: str):
    from rse_ray.pipelines.relational import daily_anomalies

    return _finalize(daily_anomalies(
        _read(sf_dir, "events", ["event_type", "ts"])))


def _q_hard_negatives(sf_dir: str):
    from rse_ray.pipelines.ann import hard_negative_mining

    return _finalize(hard_negative_mining(
        _read(sf_dir, "embeddings",
              ["vec_id", "embedding", "label"]),
        KNN_QUERY_IDS, k=5))


def _q_deterministic_walks(sf_dir: str):
    from rse_ray.pipelines.linkgraph import deterministic_walks

    return _finalize(deterministic_walks(_extracted_links(), steps=3))


EXPLAIN_DOC_IDS = [0, 1, 2, 3, 4]


def _q_time_rollup_counts(sf_dir: str):
    from rse_ray.pipelines.relational import time_rollup_counts

    return _finalize(time_rollup_counts(
        _read(sf_dir, "events", ["ts", "value"])))


def _q_benford_prices(sf_dir: str):
    from rse_ray.pipelines.relational import benford_prices

    return _finalize(benford_prices(
        _read(sf_dir, "orders", ["o_totalprice"])))


def _q_returned_item_revenue(sf_dir: str):
    from rse_ray.pipelines.relational import returned_item_revenue

    return _finalize(returned_item_revenue(
        _read(sf_dir, "customer",
              ["c_custkey", "c_name", "c_acctbal", "c_nationkey"]),
        _read(sf_dir, "orders",
              ["o_orderkey", "o_custkey", "o_orderdate"]),
        _read(sf_dir, "lineitem",
              ["l_orderkey", "l_extendedprice", "l_discount",
               "l_returnflag"]),
        _read(sf_dir, "nation", ["n_nationkey", "n_name"])))


def _q_promo_revenue(sf_dir: str):
    from rse_ray.pipelines.relational import promo_revenue

    return _finalize(promo_revenue(
        _read(sf_dir, "lineitem",
              ["l_partkey", "l_extendedprice", "l_discount",
               "l_shipdate"]),
        _read(sf_dir, "part", ["p_partkey", "p_type"])))


def _q_discounted_revenue(sf_dir: str):
    from rse_ray.pipelines.relational import discounted_revenue

    return _finalize(discounted_revenue(
        _read(sf_dir, "lineitem",
              ["l_partkey", "l_quantity", "l_extendedprice",
               "l_discount"]),
        _read(sf_dir, "part", ["p_partkey", "p_brand", "p_size"])))


def _q_host_pagerank(sf_dir: str):
    from rse_ray.pipelines.linkgraph import host_pagerank

    return _finalize(host_pagerank(_extracted_links(),
                                   iters=PAGERANK_ITERS,
                                   damping=PAGERANK_DAMPING))


def _q_readability_scores(sf_dir: str):
    from rse_ray.pipelines.text import readability_scores

    return _finalize(readability_scores(
        _read(sf_dir, "documents", ["doc_id", "text"])))


def _q_source_lang_entropy(sf_dir: str):
    from rse_ray.pipelines.relational import source_lang_entropy

    return _finalize(source_lang_entropy(
        _read(sf_dir, "documents", ["source", "lang"])))


def _q_cusum_drift(sf_dir: str):
    from rse_ray.pipelines.relational import cusum_drift

    return _finalize(cusum_drift(
        _read(sf_dir, "events", ["event_type", "ts"])))


def _q_rfm_segments(sf_dir: str):
    from rse_ray.pipelines.relational import rfm_segments

    return _finalize(rfm_segments(
        _read(sf_dir, "events", ["user_id", "ts", "value"])))


def _q_boilerplate_ngrams(sf_dir: str):
    from rse_ray.pipelines.text import boilerplate_ngrams

    return _finalize(boilerplate_ngrams(
        _read(sf_dir, "documents", ["source", "text"])))


def _q_tokenizer_fertility(sf_dir: str):
    from rse_ray.pipelines.text import tokenizer_fertility

    return _finalize(tokenizer_fertility(
        _read(sf_dir, "documents", ["lang", "text"])))


def _q_source_overlap_matrix(sf_dir: str):
    from rse_ray.pipelines.text import source_overlap_matrix

    return _finalize(source_overlap_matrix(
        _read(sf_dir, "documents", ["source", "text"])))


def _q_top_supplier_revenue(sf_dir: str):
    from rse_ray.pipelines.relational import top_supplier_revenue

    return _finalize(top_supplier_revenue(
        _read(sf_dir, "lineitem",
              ["l_suppkey", "l_extendedprice", "l_discount",
               "l_shipdate"]),
        _read(sf_dir, "supplier", ["s_suppkey", "s_name"])))


def _q_bm25_explain(sf_dir: str):
    from rse_ray.pipelines.text import bm25_explain

    return _finalize(bm25_explain(
        _read(sf_dir, "documents", ["doc_id", "text"]),
        BM25_QUERY, EXPLAIN_DOC_IDS))


def _q_nearest_centroid_eval(sf_dir: str):
    from rse_ray.pipelines.ann import nearest_centroid_eval

    return _finalize(nearest_centroid_eval(
        _read(sf_dir, "embeddings",
              ["vec_id", "embedding", "label"])))


def _q_rake_phrases(sf_dir: str):
    from rse_ray.pipelines.text import rake_phrases

    return _finalize(rake_phrases(
        _read(sf_dir, "documents", ["doc_id", "text"]), top_n=15))


def _q_textrank_keywords(sf_dir: str):
    from rse_ray.pipelines.text import textrank_keywords

    return _finalize(textrank_keywords(
        _read(sf_dir, "documents", ["doc_id", "text"]),
        iters=3, top_n=20))


def _q_user_burstiness(sf_dir: str):
    from rse_ray.pipelines.relational import user_burstiness

    return _finalize(user_burstiness(
        _read(sf_dir, "events", ["user_id", "ts", "event_id"])))


def _q_lsa_power_iteration(sf_dir: str):
    from rse_ray.pipelines.text import lsa_power_iteration

    return _finalize(lsa_power_iteration(
        _read(sf_dir, "documents", ["doc_id", "text"]), iters=3))


def _q_percolate(sf_dir: str):
    from rse_ray.pipelines.text import percolate

    return _finalize(percolate(
        _read(sf_dir, "documents", ["doc_id", "text"]), PERC_QUERIES))


def _q_scd2_intervals(sf_dir: str):
    from rse_ray.pipelines.relational import scd2_intervals

    return _finalize(scd2_intervals(
        _read(sf_dir, "events",
              ["user_id", "ts", "event_id", "event_type"])))


def _q_bool_query(sf_dir: str):
    from rse_ray.pipelines.text import bool_query_match

    return _finalize(bool_query_match(
        _read(sf_dir, "documents", ["doc_id", "text"]), BOOL_QUERY))


def _q_mad_outliers(sf_dir: str):
    from rse_ray.pipelines.relational import mad_outliers

    return _finalize(mad_outliers(
        _read(sf_dir, "events", ["event_id", "event_type", "value"])))


def _q_user_ewma(sf_dir: str):
    from rse_ray.pipelines.relational import user_ewma

    return _finalize(user_ewma(
        _read(sf_dir, "events",
              ["user_id", "ts", "event_id", "value"]), alpha=0.3))


def _q_token_entropy(sf_dir: str):
    from rse_ray.pipelines.text import token_entropy

    return _finalize(token_entropy(
        _read(sf_dir, "documents", ["doc_id", "text"])))


def _q_corpus_divergence(sf_dir: str):
    from rse_ray.pipelines.text import corpus_divergence

    return _finalize(corpus_divergence(
        _read(sf_dir, "documents", ["doc_id", "text"])))


def _q_skipgram_counts(sf_dir: str):
    from rse_ray.pipelines.text import skipgram_counts

    return _finalize(skipgram_counts(
        _read(sf_dir, "documents", ["doc_id", "text"]),
        window=2, top_n=50))


def _q_pmi_topk(sf_dir: str):
    from rse_ray.pipelines.text import pmi_topk

    return _finalize(pmi_topk(
        _read(sf_dir, "documents", ["doc_id", "text"]),
        min_count=5, top_n=50))


def _q_bm25_with_deletes(sf_dir: str):
    from rse_ray.pipelines.docsearch import bm25_documents_with_deletes

    return _finalize(bm25_documents_with_deletes(
        sf_dir, BM25_QUERY, DELETE_DOC_IDS))


def _q_bm25_after_compact(sf_dir: str):
    from rse_ray.pipelines.docsearch import bm25_documents_after_compact

    return _finalize(bm25_documents_after_compact(
        sf_dir, BM25_QUERY, DELETE_DOC_IDS))


def _q_phrase_after_compact(sf_dir: str):
    from rse_ray.pipelines.docsearch import \
        phrase_documents_after_compact

    return _finalize(phrase_documents_after_compact(
        sf_dir, PHRASE_QUERY, DELETE_DOC_IDS))


def _q_bm25_after_compact_refresh(sf_dir: str):
    from rse_ray.pipelines.docsearch import \
        bm25_documents_after_compact_refresh

    return _finalize(bm25_documents_after_compact_refresh(
        sf_dir, BM25_QUERY, DELETE_DOC_IDS))


def _q_more_like_this(sf_dir: str):
    from rse_ray.pipelines.docsearch import more_like_this_documents

    return _finalize(more_like_this_documents(sf_dir, MLT_DOC_ID, m=5, k=20))


def _q_bm25_filtered(sf_dir: str):
    from rse_ray.pipelines.docsearch import bm25_documents_filtered

    return _finalize(bm25_documents_filtered(
        sf_dir, BM25_QUERY, lang=FILTER_LANG, k=20))


def _q_prefix_search(sf_dir: str):
    from rse_ray.pipelines.docsearch import bm25_documents_prefix

    return _finalize(bm25_documents_prefix(sf_dir, PREFIX_QUERY, k=20))


def _q_bm25_conjunctive(sf_dir: str):
    from rse_ray.pipelines.docsearch import bm25_documents

    return _finalize(bm25_documents(sf_dir, CONJ_QUERY, k=20,
                                    conjunctive=True))


def _q_bm25_msm(sf_dir: str):
    from rse_ray.pipelines.docsearch import bm25_documents

    return _finalize(bm25_documents(sf_dir, CONJ_QUERY, k=20,
                                    min_match=2))


def _q_vsm_cosine_topk(sf_dir: str):
    from rse_ray.pipelines.text import vsm_cosine_topk

    return _finalize(vsm_cosine_topk(
        _read(sf_dir, "documents", ["doc_id", "text"]), BM25_QUERY, k=20))


def _q_oov_rate(sf_dir: str):
    from rse_ray.pipelines.text import oov_rate

    return _finalize(oov_rate(
        _read(sf_dir, "documents", ["doc_id", "text"]), vocab_n=20))


def _q_bm25_not(sf_dir: str):
    from rse_ray.pipelines.docsearch import bm25_documents

    return _finalize(bm25_documents(sf_dir, BM25_QUERY, k=20,
                                    excluded=NOT_TERMS))


def _q_fuzzy_terms(sf_dir: str):
    from rse_ray.pipelines.text import fuzzy_term_match

    return _finalize(fuzzy_term_match(
        _read(sf_dir, "documents", ["text"]), FUZZY_PROBES, max_dist=1))


def _q_phrase_match(sf_dir: str):
    from rse_ray.pipelines.text import phrase_match

    return _finalize(phrase_match(
        _read(sf_dir, "documents", ["doc_id", "text"]), PHRASE_QUERY))


def _q_facet_counts(sf_dir: str):
    from rse_ray.pipelines.text import facet_counts

    return _finalize(facet_counts(
        _read(sf_dir, "documents", ["doc_id", "text", "lang", "source"]),
        PHRASE_QUERY))


def _q_kwic_snippets(sf_dir: str):
    from rse_ray.pipelines.text import kwic_snippets

    return _finalize(kwic_snippets(
        _read(sf_dir, "documents", ["doc_id", "text"]), PHRASE_QUERY,
        window=3))


def _q_phrase_match_indexed(sf_dir: str):
    from rse_ray.pipelines.docsearch import phrase_documents

    return _finalize(phrase_documents(sf_dir, PHRASE_QUERY))


def _q_term_proximity_indexed(sf_dir: str):
    from rse_ray.pipelines.docsearch import proximity_documents

    return _finalize(proximity_documents(sf_dir, "hash", "join"))


def _q_term_proximity(sf_dir: str):
    from rse_ray.pipelines.text import term_proximity

    return _finalize(term_proximity(
        _read(sf_dir, "documents", ["doc_id", "text"]), "hash", "join"))


def _q_epoch_shuffle(sf_dir: str):
    from rse_ray.pipelines.relational import epoch_shuffle

    return _finalize(epoch_shuffle(
        _read(sf_dir, "documents", ["doc_id", "lang"]),
        key="doc_id", seed=3))


def _q_decontaminate(sf_dir: str):
    """Corpus = docs with doc_id % 25 != 0; benchmark = the rest (a
    deterministic 4% 'eval set' carved from the same table)."""
    from rse_ray.pipelines.dedup import decontaminate

    def _part(keep_bench: bool):
        def f(t: pa.Table) -> pa.Table:
            ids = t.column("doc_id").to_numpy()
            m = pa.array((ids % 25 == 0) == keep_bench)
            return t.filter(m)
        return f

    docs = _read(sf_dir, "documents", ["doc_id", "text"]) \
        .map_batches(_part(False), batch_format="pyarrow")
    bench = _read(sf_dir, "documents", ["doc_id", "text"]) \
        .map_batches(_part(True), batch_format="pyarrow")
    return _finalize(decontaminate(docs, bench, n=3))


DUP_SPAN_K = 25

# dup_spans DuckDB twin, shared by the dup_spans and dup_span_stats
# oracles: mark every k-gram position whose gram occurs >=2 times
# corpus-wide, then merge positions <= k apart into maximal spans
_DUP_SPANS_SQL = f"""
WITH pos AS (
  SELECT doc_id,
         unnest(range(0, length(text) - {DUP_SPAN_K} + 1)) AS pos, text
  FROM documents WHERE length(text) >= {DUP_SPAN_K}
), g AS (
  SELECT doc_id, pos,
         substr(text, (pos + 1)::INT, {DUP_SPAN_K}) AS gram FROM pos
), dup AS (
  SELECT doc_id, pos FROM g
  WHERE gram IN (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2)
), isl AS (
  SELECT doc_id, pos,
         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                  > {DUP_SPAN_K} THEN 1 ELSE 0 END AS brk
  FROM dup
), grp AS (
  SELECT doc_id, pos,
         sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS grp_id
  FROM isl
)
SELECT doc_id, min(pos)::BIGINT AS span_start,
       (max(pos) + {DUP_SPAN_K} - min(pos))::BIGINT AS span_len
FROM grp GROUP BY doc_id, grp_id"""


def _q_dup_spans(sf_dir: str):
    from rse_ray.pipelines.dedup import dup_spans

    return _finalize(dup_spans(
        _read(sf_dir, "documents", ["doc_id", "text"]), k=DUP_SPAN_K))


def _q_dup_span_stats(sf_dir: str):
    from rse_ray.pipelines.dedup import dup_span_stats

    return _finalize(dup_span_stats(
        _read(sf_dir, "documents", ["doc_id", "text"]), k=DUP_SPAN_K))


# pattern_scan oracle patterns: the PII presets (email/ipv4 — zero on
# this corpus, the honest result) plus two that actually fire on the
# word-salad fixture text, so the hash gate checks real counts. All
# RE2-compatible and semantics-identical between Python re and DuckDB.
SCAN_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
    "a_word": r"\b[a-z]*a[a-z]*\b",
    "sk_word": r"\bs[a-z]+k\b",
}


def _q_pattern_scan(sf_dir: str):
    from rse_ray.pipelines.text import pattern_scan

    return _finalize(pattern_scan(
        _read(sf_dir, "documents", ["doc_id", "text"]),
        patterns=SCAN_PATTERNS, redact=True))


# 40-merge BPE vocabulary trained once on the sf0.001 documents fixture
# (bpe_train, deterministic: exact counts + lexicographic tie-break).
# Pinned so bpe_token_counts stays a FIXED-parameter operator the SQL
# twin can replay via chained replaces; the trainer itself is gated by
# bpe_train (rows-only here, exact-equality pytest oracles vs a
# recount-from-scratch reference and across shard counts).
BPE_PINNED_MERGES = (
    ('e', 'r'), ('o', 'r'), ('i', 'n'), ('o', 'w'),
    ('s', 't'), ('l', 'u'), ('a', 'r'), ('p', 'ar'),
    ('m', 'er'), ('a', 't'), ('a', 'n'), ('c', 'an'),
    ('s', 'can'), ('c', 'o'), ('co', 'lu'), ('colu', 'm'),
    ('colum', 'n'), ('d', 'ow'), ('in', 'dow'), ('w', 'indow'),
    ('d', 'er'), ('or', 'der'), ('or', 't'), ('s', 'ort'),
    ('par', 't'), ('u', 'p'), ('a', 'g'), ('ag', 'g'),
    ('a', 'lu'), ('alu', 'e'), ('v', 'alue'), ('in', 'e'),
    ('l', 'ine'), ('e', 'y'), ('k', 'ey'), ('j', 'o'),
    ('jo', 'in'), ('g', 'e'), ('mer', 'ge'), ('er', 'y'),
)
BPE_NUM_MERGES = 40


def _q_bpe_train(sf_dir: str):
    from rse_ray.pipelines.bpe import bpe_train

    return _finalize(bpe_train(
        _read(sf_dir, "documents", ["text"]),
        num_merges=BPE_NUM_MERGES))


def _q_bpe_token_counts(sf_dir: str):
    from rse_ray.pipelines.bpe import bpe_encode_counts

    return _finalize(bpe_encode_counts(
        _read(sf_dir, "documents", ["doc_id", "text"]),
        list(BPE_PINNED_MERGES)))


STRAT_RATES = {"en": 300, "fr": 800}
STRAT_DEFAULT = 500


def _q_stratified_sample(sf_dir: str):
    from rse_ray.pipelines.relational import stratified_sample

    return _finalize(stratified_sample(
        _read(sf_dir, "documents"),
        group="lang", key="doc_id", rates=STRAT_RATES,
        default_permille=STRAT_DEFAULT))


def _q_jsonl_source_counts(sf_dir: str):
    """Layout-agnostic ingestion: the documents table served from
    JSONL (ray.data.read_json) through a grouped count — the oracle
    reads the Parquet twin, so a hash match proves the read path
    (schema mapping, unicode round trip) end to end."""
    from ray.data.aggregate import Sum

    from rse_ray.sources.formats import documents_jsonl

    ds = documents_jsonl(sf_dir)

    def partial(batch):
        g = batch.group_by(["lang", "source"]).aggregate(
            [([], "count_all")])
        return g.rename_columns(["lang", "source", "c"])

    agg = ds.select_columns(["lang", "source"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(["lang", "source"]) \
        .aggregate(Sum("c", alias_name="n_docs"))

    def finish(batch):
        import pyarrow.compute as pc

        return pa.table({
            "lang": batch.column("lang"),
            "source": batch.column("source"),
            "n_docs": pc.cast(batch.column("n_docs"), pa.int64()),
        })

    return _finalize(agg.map_batches(finish, batch_format="pyarrow"))


def _q_csv_source_window_agg(sf_dir: str):
    """The events table served from CSV (explicit Arrow schema,
    pinned timestamp parser) through the standard tumbling window
    aggregate — same oracle as window_agg over the Parquet twin."""
    from rse_ray.pipelines.relational import window_agg
    from rse_ray.sources.formats import events_csv

    return _finalize(window_agg(events_csv(sf_dir)))


LANG_QUOTA = 60


def _q_lang_quota_sample(sf_dir: str):
    from rse_ray.pipelines.relational import group_quota_sample

    return _finalize(group_quota_sample(
        _read(sf_dir, "documents", ["doc_id", "lang"]),
        group="lang", key="doc_id", quota=LANG_QUOTA))


def _q_incremental_dedup(sf_dir: str):
    """Nightly-ingest shape: OLD = docs with doc_id % 10 != 0 (the
    snapshot_diff convention), NEW = docs with doc_id % 3 == 0; a new
    doc survives iff its text never appears in the old corpus."""
    from rse_ray.pipelines.dedup import incremental_exact_dedup

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def old_f(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy()
        return b.filter(pa.array(ids % 10 != 0))

    def new_f(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy()
        return b.filter(pa.array(ids % 3 == 0))

    return _finalize(incremental_exact_dedup(
        docs.map_batches(new_f, batch_format="pyarrow"),
        docs.map_batches(old_f, batch_format="pyarrow")))


def _q_quality_rank(sf_dir: str):
    from rse_ray.pipelines.relational import global_rank

    return _finalize(global_rank(
        _read(sf_dir, "documents", ["doc_id", "n_chars"]),
        order="n_chars", key="doc_id", descending=True))


def _q_quality_ntile(sf_dir: str):
    from rse_ray.pipelines.relational import ntile_rank

    return _finalize(ntile_rank(
        _read(sf_dir, "documents", ["doc_id", "n_chars"]),
        order="n_chars", key="doc_id", n=4, descending=True))


FUNNEL_STEPS = ("view", "click", "purchase")


def _q_funnel_counts(sf_dir: str):
    from rse_ray.pipelines.relational import funnel_counts

    return _finalize(funnel_counts(
        _read(sf_dir, "events", ["user_id", "ts", "event_type"]),
        steps=FUNNEL_STEPS))


def _funnel_sql() -> str:
    """Greedy earliest-match funnel twin: each step's reach time is
    the min qualifying ts strictly after the previous step's."""
    s1, s2, s3 = FUNNEL_STEPS
    return f"""
WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
            WHERE event_type = '{s1}' AND user_id IS NOT NULL
              AND ts IS NOT NULL GROUP BY 1),
s2 AS (SELECT e.user_id, min(ts) AS t2 FROM events e JOIN s1 USING (user_id)
       WHERE event_type = '{s2}' AND ts > t1 GROUP BY 1),
s3 AS (SELECT e.user_id, min(ts) AS t3 FROM events e JOIN s2 USING (user_id)
       WHERE event_type = '{s3}' AND ts > t2 GROUP BY 1)
SELECT 0 AS step, '{s1}' AS event_type, (SELECT count(*) FROM s1) AS users
UNION ALL
SELECT 1, '{s2}', (SELECT count(*) FROM s2)
UNION ALL
SELECT 2, '{s3}', (SELECT count(*) FROM s3)"""


def _q_rolling_time_window(sf_dir: str):
    from rse_ray.pipelines.relational import rolling_time_window

    return _finalize(rolling_time_window(
        _read(sf_dir, "events",
              ["event_id", "ts", "user_id", "value"]), hours=24))


def _q_weighted_sample(sf_dir: str):
    from rse_ray.pipelines.relational import weighted_sample

    return _finalize(weighted_sample(
        _read(sf_dir, "documents", ["doc_id", "n_chars"]),
        n=100, weight_col="n_chars"))


def _q_event_transitions(sf_dir: str):
    from rse_ray.pipelines.relational import event_transitions

    return _finalize(event_transitions(
        _read(sf_dir, "events",
              ["event_id", "ts", "user_id", "event_type"])))


def _q_value_zscores(sf_dir: str):
    from rse_ray.pipelines.relational import value_zscores

    return _finalize(value_zscores(
        _read(sf_dir, "events", ["event_id", "event_type", "value"])))


def _q_weekly_churn(sf_dir: str):
    from rse_ray.pipelines.relational import weekly_churn

    return _finalize(weekly_churn(
        _read(sf_dir, "events", ["user_id", "ts"])))


def _q_retention_cohorts(sf_dir: str):
    from rse_ray.pipelines.relational import retention_cohorts

    return _finalize(retention_cohorts(
        _read(sf_dir, "events", ["user_id", "ts"])))


def _q_weighted_sample_by_group(sf_dir: str):
    from rse_ray.pipelines.relational import weighted_sample_by_group

    return _finalize(weighted_sample_by_group(
        _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"]),
        n=30, weight_col="n_chars", group_col="lang"))


def _q_event_paths(sf_dir: str):
    from rse_ray.pipelines.relational import event_paths

    return _finalize(event_paths(
        _read(sf_dir, "events",
              ["event_id", "ts", "user_id", "event_type"]), first_k=5))


RP_D_IN, RP_D_OUT, RP_SEED = 64, 16, 17


def _rp_matrix_path() -> str:
    """Pin the deterministic projection matrix to a parquet the SQL
    twin reads (the matrix itself is splitmix-generated, not random —
    both sides could regenerate it; the parquet just makes it
    SQL-visible). ALL entries ship, including the ~2/3 zeros, so every
    (vec_id, dim) group exists on the SQL side too."""
    import pyarrow.parquet as pq

    from rse_ray.pipelines.ann import projection_matrix

    import numpy as np

    path = os.path.join(
        "/tmp/rse_ray_cache",
        f"rp_matrix_{RP_D_IN}x{RP_D_OUT}_s{RP_SEED}.parquet")
    if not os.path.exists(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        R = projection_matrix(RP_D_IN, RP_D_OUT, seed=RP_SEED)
        i, j = np.meshgrid(np.arange(1, RP_D_IN + 1),
                           np.arange(RP_D_OUT), indexing="ij")
        tmp = path + ".tmp"
        pq.write_table(pa.table({
            "i": pa.array(i.ravel(), type=pa.int64()),
            "j": pa.array(j.ravel(), type=pa.int64()),
            "r": pa.array(R.ravel(), type=pa.float64()),
        }), tmp)
        os.replace(tmp, path)
    return path


def _q_random_projection(sf_dir: str):
    from rse_ray.pipelines.ann import projection_matrix, random_projection

    _rp_matrix_path()
    return _finalize(random_projection(
        _read(sf_dir, "embeddings", ["vec_id", "embedding"]),
        projection_matrix(RP_D_IN, RP_D_OUT, seed=RP_SEED)))


def _q_pca_project(sf_dir: str):
    # pytest-oracled (tests/test_pipelines.py): the d x d
    # eigendecomposition has no SQL analog; the covariance it eats is
    # the separately hash-gated embedding_covariance reduction
    from rse_ray.pipelines.ann import pca_project

    return _finalize(pca_project(
        _read(sf_dir, "embeddings", ["vec_id", "embedding"]), k=4))


def _q_embedding_covariance(sf_dir: str):
    from rse_ray.pipelines.ann import embedding_covariance

    return _finalize(embedding_covariance(
        _read(sf_dir, "embeddings", ["vec_id", "embedding"])))


def _q_snapshot_diff(sf_dir: str):
    """Two snapshots derived deterministically from documents: new
    gains doc_id%10==0, loses doc_id%10==1, and rewrites doc_id%7==0
    texts — the add/remove/change mix a corpus refresh produces."""
    from rse_ray.pipelines.relational import snapshot_diff

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def old_f(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy()
        return b.filter(pa.array(ids % 10 != 0))

    def new_f(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy()
        t = b.filter(pa.array(ids % 10 != 1))
        ids2 = t.column("doc_id").to_numpy()
        texts = [x + " v2" if i % 7 == 0 else x
                 for i, x in zip(ids2, t.column("text").to_pylist())]
        return pa.table({"doc_id": t.column("doc_id"),
                         "text": pa.array(texts, type=pa.string())})

    old = docs.map_batches(old_f, batch_format="pyarrow")
    new = docs.map_batches(new_f, batch_format="pyarrow")
    return _finalize(snapshot_diff(old, new))


def _q_doc_lm_score(sf_dir: str):
    from rse_ray.pipelines.text import doc_lm_score

    return _finalize(doc_lm_score(
        _read(sf_dir, "documents", ["doc_id", "text"])))


def _q_lm_quality_buckets(sf_dir: str):
    from rse_ray.pipelines.text import lm_quality_buckets

    return _finalize(lm_quality_buckets(
        _read(sf_dir, "documents", ["doc_id", "text", "lang"]),
        n_buckets=3))


def _q_repetition_scores(sf_dir: str):
    from rse_ray.pipelines.text import repetition_scores

    return _finalize(repetition_scores(
        _read(sf_dir, "documents", ["doc_id", "text"])))


def _q_approx_ndistinct_users(sf_dir: str):
    from rse_ray.pipelines.sketch import approx_ndistinct

    return _finalize(approx_ndistinct(
        _read(sf_dir, "events", ["user_id"]), col="user_id"))


def _q_approx_ndistinct_by_type(sf_dir: str):
    from rse_ray.pipelines.sketch import approx_ndistinct_by

    return _finalize(approx_ndistinct_by(
        _read(sf_dir, "events", ["event_type", "user_id"]),
        group="event_type", col="user_id"))


HEAVY_HITTER_MIN_COUNT = 200


def _q_heavy_hitter_terms(sf_dir: str):
    from rse_ray.pipelines.sketch import heavy_hitters

    return _finalize(heavy_hitters(
        _read(sf_dir, "documents", ["doc_id", "text"]),
        min_count=HEAVY_HITTER_MIN_COUNT, capacity=4096))


VIDEO_DIR = "/tmp/rse_ray_cache/video_fixture_24"


def _video_fixture_dir() -> str:
    from rse_ray.pipelines.multimodal import write_video_fixture

    write_video_fixture(VIDEO_DIR, n=24, seed=9, every_k=4,
                        out_h=16, out_w=16)
    return VIDEO_DIR


def _q_video_frame_sample(sf_dir: str):
    """Every-4th-frame sampling over the RVID corpus; golden features
    computed from the raw frame arrays pre-encode."""
    import ray.data

    from rse_ray.pipelines.multimodal import sample_video_frames

    d = _video_fixture_dir()
    ds = ray.data.read_parquet(os.path.join(d, "videos.parquet"))
    return _finalize(sample_video_frames(ds, every_k=4))


def _q_image_resize(sf_dir: str):
    """Nearest-neighbor 16x16 resize over the stills corpus; golden
    features computed from resize of the raw arrays pre-encode."""
    import ray.data

    from rse_ray.pipelines.multimodal import resize_images

    d = _video_fixture_dir()
    ds = ray.data.read_parquet(os.path.join(d, "stills.parquet"))
    return _finalize(resize_images(ds, out_h=16, out_w=16))


RECENCY_AS_OF = "2024-01-31"
RECENCY_DELAY_DAYS = 14


def _q_recency_filter(sf_dir: str):
    from rse_ray.pipelines.relational import recency_filter

    return _finalize(
        recency_filter(
            _read(sf_dir, "events", ["event_id", "ts", "event_type"]),
            as_of=RECENCY_AS_OF, revisit_delay_days=RECENCY_DELAY_DAYS,
        )
    )


def _q_distinct(sf_dir: str):
    from rse_ray.pipelines.relational import distinct_lang_source

    return _finalize(distinct_lang_source(_read(sf_dir, "documents",
                                                ["lang", "source"])))


def _q_partitioned_sink(sf_dir: str):
    """Write events hash-partitioned by user_id, then report each
    partition's row count FROM THE MANIFESTS — the oracle checks the
    sink's routing + accounting contract (int64 key: part = user_id
    mod P), not a re-scan of the output."""
    import tempfile

    from rse_ray.sinks import partition_summary, write_partitioned

    out = tempfile.mkdtemp(prefix="rse_sink_", dir="/tmp")
    write_partitioned(
        _read(sf_dir, "events", ["event_id", "user_id", "value"]),
        out, key="user_id", num_parts=16)
    s = partition_summary(out)[["partition", "rows"]]
    return s.rename(columns={"rows": "n_rows"})


def _q_rollup_counts(sf_dir: str):
    from rse_ray.pipelines.relational import rollup_counts

    return _finalize(rollup_counts(
        _read(sf_dir, "documents", ["lang", "source", "n_chars"])))


def _q_above_group_median(sf_dir: str):
    from rse_ray.pipelines.relational import above_group_median

    return _finalize(above_group_median(
        _read(sf_dir, "documents", ["doc_id", "source", "n_chars"])))


def _q_doc_chunks(sf_dir: str):
    from rse_ray.pipelines.text import doc_chunks

    return _finalize(doc_chunks(
        _read(sf_dir, "documents", ["doc_id", "text"]),
        chunk=64, overlap=16))


def _q_dense_window_agg(sf_dir: str):
    from rse_ray.pipelines.relational import dense_window_agg

    return _finalize(dense_window_agg(
        _read(sf_dir, "events", ["ts", "value"])))


def _q_pretrain_pack(sf_dir: str):
    from rse_ray.pipelines.text import pretrain_pack

    return _finalize(pretrain_pack(
        _read(sf_dir, "documents", ["doc_id", "text", "lang"])))


def _q_event_pivot(sf_dir: str):
    from rse_ray.pipelines.relational import pivot_counts

    return _finalize(pivot_counts(
        _read(sf_dir, "events", ["user_id", "event_type"])))


PIVOT_TYPES = ("click", "error", "purchase", "signup", "view")


def _q_event_unpivot(sf_dir: str):
    """PIVOT -> UNPIVOT round trip: the wide per-user count table back
    to tidy (user_id, event_type, n) — zero rows for declared-but-
    absent combos survive, which is what distinguishes UNPIVOT of a
    schema from a plain GROUP BY."""
    from rse_ray.pipelines.relational import pivot_counts, unpivot

    pv = pivot_counts(_read(sf_dir, "events", ["user_id", "event_type"]))
    return _finalize(unpivot(
        pv, id_cols=["user_id"],
        value_cols={f"n_{v}": v for v in PIVOT_TYPES},
        var_name="event_type", value_name="n"))


def _q_rank_funcs(sf_dir: str):
    from rse_ray.pipelines.relational import group_rank_funcs

    return _finalize(group_rank_funcs(
        _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"]),
        group="lang", order="n_chars", key="doc_id", descending=True))


def _q_profile_events(sf_dir: str):
    from rse_ray.pipelines.relational import profile_table

    return _finalize(profile_table(
        _read(sf_dir, "events",
              ["event_id", "ts", "user_id", "event_type", "value"]),
        columns=["event_id", "ts", "user_id", "event_type", "value"],
        numeric=["event_id", "user_id", "value"]))


def _q_value_histogram(sf_dir: str):
    from rse_ray.pipelines.relational import value_histogram

    return _finalize(value_histogram(
        _read(sf_dir, "events", ["value"]), lo=0.0, hi=500.0, bins=20))


def _q_user_window_funcs(sf_dir: str):
    from rse_ray.pipelines.relational import user_window_funcs

    return _finalize(user_window_funcs(
        _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])))


def _q_full_outer_join(sf_dir: str):
    """FULL OUTER reconciliation: per-user event activity vs the
    even-custkey half of the customer dimension — both unmatched
    directions are non-empty by construction (odd users have no dim
    row; most even customers have no events). The right key rides
    along as a payload copy so the coalesced join key survives the
    equality."""
    import pyarrow.compute as _pc
    from ray.data.aggregate import Sum

    from rse_ray.pipelines.relational import hash_join

    events = _read(sf_dir, "events", ["user_id"])

    def cnt(batch: pa.Table) -> pa.Table:
        g = batch.group_by("user_id").aggregate([([], "count_all")])
        return pa.table({"user_id": g.column("user_id"),
                         "n_p": g.column("count_all")})

    per_user = events.map_batches(cnt, batch_format="pyarrow") \
        .groupby("user_id").aggregate(Sum("n_p", alias_name="n_events"))
    def even_with_key_copy(b: pa.Table) -> pa.Table:
        keys = b.column("c_custkey").to_numpy()
        b = b.filter(pa.array(keys % 2 == 0))
        return pa.table({"c_custkey": b.column("c_custkey"),
                         "cust_key": b.column("c_custkey"),
                         "c_acctbal": b.column("c_acctbal")})

    cust = _read(sf_dir, "customer", ["c_custkey", "c_acctbal"]) \
        .map_batches(even_with_key_copy, batch_format="pyarrow")
    j = hash_join(per_user, cust, left_on="user_id",
                  right_on="c_custkey",
                  right_cols=["cust_key", "c_acctbal"],
                  how="outer").to_pandas()
    j["join_key"] = j["user_id"].fillna(j["cust_key"]).astype("int64")
    # nullable BIGINT comes back from DuckDB's .df() as float64+NaN;
    # emit the same dtype so the hash comparator sees one shape
    j["n_events"] = j["n_events"].astype("float64")
    out = j[["join_key", "n_events", "c_acctbal"]] \
        .sort_values("join_key").reset_index(drop=True)
    return out


def _q_cube_counts(sf_dir: str):
    from rse_ray.pipelines.relational import cube_counts

    return _finalize(cube_counts(
        _read(sf_dir, "documents", ["lang", "source", "n_chars"])))


def _q_json_sum(sf_dir: str):
    from rse_ray.pipelines.relational import json_props_sum

    return _finalize(json_props_sum(_read(sf_dir, "events",
                                          ["event_type", "props"])))


def _q_reference_relevance(sf_dir: str):
    from rse_ray.pipelines.linkgraph import reference_relevance

    return _finalize(
        reference_relevance(_read(sf_dir, "documents", ["doc_id", "text"]),
                            BM25_QUERY, stem=False)
    )


LINKGRAPH_DIR = "/tmp/rse_ray_cache/linkgraph_pages_2000_i"  # i: +DDL-wide rows
MEDIA_DIR = "/tmp/rse_ray_cache/media_real_v5_96"  # v5: +transcode golden


def _linkgraph_corpus() -> str:
    """Deterministic cached pages corpus for the link-graph queries (no
    html/link tables exist in testdata; pages are the fixture corpus).
    Also writes the GENERATOR's golden links table (the hrefs it
    planted, independent of the extraction pipeline) so the link-graph
    queries are DuckDB-oracle-able via read_parquet."""
    import json

    from rse_ray.sources.fixtures import generate_pages

    pages_dir = LINKGRAPH_DIR
    marker = os.path.join(pages_dir, "_DONE.json")
    if not os.path.exists(marker):
        import shutil

        shutil.rmtree(pages_dir, ignore_errors=True)
        os.makedirs(pages_dir, exist_ok=True)
        meta = generate_pages(
            pages_dir, n_rows=2000, n_dup_pairs=0, seed=11,
            rows_per_file=500,
            golden_links_path=os.path.join(pages_dir, "golden_links.parquet"),
            golden_anchors_path=os.path.join(pages_dir,
                                             "golden_anchors.parquet"),
        )
        with open(marker, "w") as f:
            json.dump(meta, f)
    return pages_dir


def _linkgraph_pages_paths() -> list[str]:
    """Only the pages_*.parquet files (golden_links.parquet lives in
    the same dir and must not enter the pages read)."""
    d = _linkgraph_corpus()
    return [os.path.join(d, f) for f in sorted(os.listdir(d))
            if f.startswith("pages_") and f.endswith(".parquet")]


def _media_fixture_dir() -> str:
    from rse_ray.pipelines.multimodal import write_real_media_fixture

    write_real_media_fixture(MEDIA_DIR, n=96, seed=5)
    return MEDIA_DIR


def _q_image_transcode(sf_dir: str):
    """Corpus normalization: decode BMP/PNG/JPEG payloads, re-encode
    all of them as baseline JPEG at TRANSCODE_QUALITY; the size/crc
    report is golden-oracled byte-exactly (generator computed the
    same transcode pre-write, via jpeg_reference_pixels for the
    lossy inputs)."""
    import ray.data

    from rse_ray.pipelines.multimodal import transcode_images

    d = _media_fixture_dir()
    ds = ray.data.read_parquet(os.path.join(d, "media.parquet"))
    return _finalize(transcode_images(ds))


BOILER_DIR = "/tmp/rse_ray_cache/boiler_v2_120"  # v2: +syndicated dups


def _q_main_content(sf_dir: str):
    """Boilerplate removal (jusText-lite) over a planted corpus: the
    golden main text is the planted content paragraphs by
    construction — never computed by the extractor."""
    import ray.data

    from rse_ray.pipelines.text import main_content
    from rse_ray.sources.fixtures import write_boilerplate_fixture

    write_boilerplate_fixture(BOILER_DIR)
    ds = ray.data.read_parquet(os.path.join(BOILER_DIR,
                                            "pages.parquet"))
    return _finalize(main_content(ds).select_columns(
        ["url", "main_text", "n_kept"]))


def _q_webtext_clean(sf_dir: str):
    """Composed cleaning chain over the planted corpus — the
    syndicated copies (unique raw html, identical article) survive a
    raw-bytes dedup and collapse only after boilerplate removal."""
    import ray.data

    from rse_ray.pipelines.text import webtext_clean
    from rse_ray.sources.fixtures import write_boilerplate_fixture

    write_boilerplate_fixture(BOILER_DIR)
    ds = ray.data.read_parquet(os.path.join(BOILER_DIR,
                                            "pages.parquet"))
    return _finalize(webtext_clean(ds).select_columns(
        ["url", "n_tokens"]))


def _q_link_extract(sf_dir: str):
    import ray.data

    from rse_ray.pipelines.linkgraph import extract_links

    return _finalize(extract_links(ray.data.read_parquet(_linkgraph_pages_paths())))


def _q_url_templates(sf_dir: str):
    import ray.data

    from rse_ray.pipelines.linkgraph import url_templates

    return _finalize(url_templates(
        ray.data.read_parquet(_linkgraph_pages_paths(),
                              columns=["url"])))


def _q_diameter_estimate(sf_dir: str):
    from rse_ray.pipelines.linkgraph import diameter_estimate

    return _finalize(diameter_estimate(_extracted_links()))


def _q_crawl_budget(sf_dir: str):
    import ray.data

    from rse_ray.pipelines.linkgraph import crawl_budget

    return _finalize(crawl_budget(
        ray.data.read_parquet(_linkgraph_pages_paths(),
                              columns=["url"]),
        budget=1000))


def _q_backlink_counts(sf_dir: str):
    import ray.data

    from rse_ray.pipelines.linkgraph import backlink_counts, extract_links

    links = extract_links(ray.data.read_parquet(_linkgraph_pages_paths()))
    return _finalize(backlink_counts(links))


def _q_anchor_boosted_rank(sf_dir: str):
    import ray.data

    from rse_ray.pipelines.linkgraph import anchor_boosted_rank
    from rse_ray.sources.fixtures import make_vocab

    vocab = make_vocab(10_000, 11)
    query = f"{vocab[0]} {vocab[2]} {vocab[0]}"   # qtf 2 / 1
    return _finalize(anchor_boosted_rank(
        ray.data.read_parquet(_linkgraph_pages_paths()), query,
        w=0.25, stem=False))


def _anchor_boost_sql() -> str:
    """Content dot product from the golden text + anchor dot product
    from the golden anchor rows, full-outer fused at w=0.25."""
    from rse_ray.sources.fixtures import make_vocab

    vocab = make_vocab(10_000, 11)
    pages = os.path.join(LINKGRAPH_DIR, "pages_*.parquet")
    anchors = os.path.join(LINKGRAPH_DIR, "golden_anchors.parquet")
    return f"""
WITH q(term, qtf) AS (VALUES ('{vocab[0]}', 2), ('{vocab[2]}', 1)),
toks0 AS (SELECT url, unnest(regexp_split_to_array(lower(text), '\\s+'))
              AS term FROM read_parquet('{pages}')),
toks AS (SELECT url, term FROM toks0 WHERE term <> ''),
rel AS (SELECT url, sum(qtf)::BIGINT AS relevance
        FROM toks JOIN q USING (term) GROUP BY url),
an0 AS (SELECT dst_url AS url,
               unnest(regexp_split_to_array(lower(anchor_text), '\\s+'))
                   AS term
        FROM read_parquet('{anchors}')),
an AS (SELECT url, sum(qtf)::BIGINT AS anchor
       FROM an0 JOIN q USING (term) WHERE term <> '' GROUP BY url)
SELECT url, coalesce(relevance, 0) AS relevance,
       coalesce(anchor, 0) AS anchor,
       coalesce(relevance, 0) + 0.25 * coalesce(anchor, 0) AS score
FROM rel FULL OUTER JOIN an USING (url)"""


def _q_anchor_terms(sf_dir: str):
    """Anchor-text index over the crawler corpus — extraction side is
    the REAL html walk; the oracle tokenizes the generator's golden
    (dst, anchor_text) rows (planted pre-html, non-circular)."""
    import ray.data

    from rse_ray.pipelines.linkgraph import anchor_terms

    return _finalize(anchor_terms(
        ray.data.read_parquet(_linkgraph_pages_paths())))


def _q_domain_counts(sf_dir: str):
    import ray.data

    from rse_ray.pipelines.linkgraph import domain_counts

    return _finalize(domain_counts(
        ray.data.read_parquet(_linkgraph_pages_paths(),
                              columns=["url", "html"])))


EXTRACT_CACHE_VERSION = "v1"  # bump on ANY extract/resolve code change


def _extracted_links():
    """Extract links from the fixture corpus ONCE and cache the result
    parquet — pagerank/crawl_depth/connected_components all consume the
    same extracted edge table, and re-running the extraction flat-map
    per query is pure repeated work (the extraction operator itself is
    gated separately as `link_extract`). The cache file is keyed by
    EXTRACT_CACHE_VERSION so an extraction-code change cannot serve
    stale edges."""
    import ray.data

    from rse_ray.pipelines.linkgraph import extract_links

    out = os.path.join(
        _linkgraph_corpus(),
        f"extracted_links_{EXTRACT_CACHE_VERSION}")
    marker = os.path.join(out, "_DONE.json")
    if not os.path.exists(marker):
        import shutil

        from rse_ray.state.manifest import write_json_atomic

        # Distributed write: each block lands as its own parquet file
        # (no driver-side concat of the corpus-sized edge table), then
        # the atomic _DONE marker commits the directory — a partial
        # write from a killed run is simply rebuilt.
        shutil.rmtree(out, ignore_errors=True)
        extract_links(ray.data.read_parquet(
            _linkgraph_pages_paths())).write_parquet(out)
        write_json_atomic(marker, {"status": "done",
                                   "version": EXTRACT_CACHE_VERSION})
    return ray.data.read_parquet(
        [os.path.join(out, f) for f in sorted(os.listdir(out))
         if f.endswith(".parquet")])


def _q_pagerank(sf_dir: str):
    from rse_ray.pipelines.linkgraph import pagerank

    return _finalize(pagerank(_extracted_links(), iters=PAGERANK_ITERS,
                              damping=PAGERANK_DAMPING))


PAGERANK_ITERS = 5
PAGERANK_DAMPING = 0.85
CRAWL_SEED_MOD = 101  # seeds: md5_number_lower(url) % 101 == 0
CRAWL_MAX_DEPTH = 32


def _crawl_seed_pred(urls):
    """Content-deterministic seed gate, the md5_number_lower twin."""
    import hashlib
    import struct

    import numpy as np

    h = np.fromiter(
        (struct.unpack(
            "<Q", hashlib.md5(u.encode("utf-8")).digest()[8:])[0]
         for u in urls),
        dtype=np.uint64, count=len(urls))
    return (h % CRAWL_SEED_MOD) == 0


def _q_crawl_depth(sf_dir: str):
    from rse_ray.pipelines.linkgraph import crawl_depth

    return _finalize(crawl_depth(_extracted_links(),
                                 seed_pred=_crawl_seed_pred,
                                 max_depth=CRAWL_MAX_DEPTH))


def _pagerank_sql(edges_cte: str | None = None,
                  out_col: str = "url") -> str:
    """Unrolled power-iteration twin over the generator's golden links
    (DuckDB recursive CTEs disallow aggregates in the recursive term,
    so the fixed iteration count is expanded as chained CTEs).
    ``edges_cte`` overrides the edge-table SQL (must end in a CTE
    named ``edges`` with columns src, dst) — host_pagerank passes the
    host-collapsed form; ``out_col`` renames the node column."""
    links = os.path.join(LINKGRAPH_DIR, "golden_links.parquet")
    d = PAGERANK_DAMPING
    default_edges = f"""
WITH edges AS (SELECT src_url AS src, dst_url AS dst
               FROM read_parquet('{links}')),"""
    parts = [(edges_cte if edges_cte is not None else default_edges)
             + """
nodes AS (SELECT src AS url FROM edges UNION SELECT dst FROM edges),
nn AS (SELECT count(*)::DOUBLE AS n FROM nodes),
deg AS (SELECT src, count(*)::DOUBLE AS odeg FROM edges GROUP BY 1),
ed AS (SELECT e.src, e.dst, deg.odeg FROM edges e JOIN deg USING (src)),
r0 AS (SELECT url, 1.0/nn.n AS rank FROM nodes CROSS JOIN nn)"""]
    for k in range(1, PAGERANK_ITERS + 1):
        parts.append(f""",
c{k} AS (SELECT ed.dst, sum(r.rank/ed.odeg) AS c FROM ed
         JOIN r{k - 1} r ON ed.src = r.url GROUP BY 1),
t{k} AS (SELECT coalesce(sum(c), 0) AS t FROM c{k}),
r{k} AS (SELECT n.url,
                (1-{d})/nn.n + {d}*(coalesce(c.c, 0) + (1-t{k}.t)/nn.n)
                    AS rank
         FROM nodes n LEFT JOIN c{k} c ON n.url = c.dst
         CROSS JOIN nn CROSS JOIN t{k})""")
    parts.append(
        f"\nSELECT url AS {out_col}, round(rank, 6) AS rank "
        f"FROM r{PAGERANK_ITERS}")
    return "".join(parts)


def _host_pagerank_sql() -> str:
    """host_pagerank twin: the same unrolled power iteration over the
    host-collapsed edge table (lower authority, strip userinfo/:port,
    drop self-loops, DISTINCT) — RE2 patterns shared with
    rse_ray.pipelines.linkgraph.host_edges."""
    links = os.path.join(LINKGRAPH_DIR, "golden_links.parquet")
    strip = ("regexp_replace(regexp_replace({c}, '^[^@]*@', ''), "
             "':[0-9]+$', '')")
    edges = f"""
WITH pl AS (SELECT
    lower(regexp_extract(src_url,
          '^[A-Za-z][A-Za-z0-9+.\\-]*://([^/]+)', 1)) AS sh,
    lower(regexp_extract(dst_url,
          '^[A-Za-z][A-Za-z0-9+.\\-]*://([^/]+)', 1)) AS dh
  FROM read_parquet('{links}')),
st AS (SELECT {strip.format(c='sh')} AS src,
              {strip.format(c='dh')} AS dst
       FROM pl WHERE sh <> '' AND dh <> ''),
edges AS (SELECT DISTINCT src, dst FROM st WHERE src <> dst),"""
    return _pagerank_sql(edges_cte=edges, out_col="host")


def _q_pagerank_personalized(sf_dir: str):
    from rse_ray.pipelines.linkgraph import pagerank

    return _finalize(pagerank(_extracted_links(), iters=PAGERANK_ITERS,
                              damping=PAGERANK_DAMPING,
                              personalize_pred=_crawl_seed_pred))


def _ppr_sql() -> str:
    """Unrolled personalized-PageRank twin: teleport vector s uniform
    over the md5-gated seed set (the crawl_depth gate), r0 = s,
    r_k = (1-d)*s + d*(c + dang*s)."""
    links = os.path.join(LINKGRAPH_DIR, "golden_links.parquet")
    d = PAGERANK_DAMPING
    parts = [f"""
WITH edges AS MATERIALIZED (SELECT src_url AS src, dst_url AS dst
               FROM read_parquet('{links}')),
nodes AS MATERIALIZED (SELECT src AS url FROM edges UNION SELECT dst FROM edges),
seeds AS (SELECT url FROM nodes
          WHERE md5_number_lower(url) % {CRAWL_SEED_MOD} = 0),
ns AS (SELECT count(*)::DOUBLE AS n FROM seeds),
s AS MATERIALIZED (
    SELECT n.url, CASE WHEN sd.url IS NOT NULL THEN 1.0/ns.n
                       ELSE 0 END AS sv
    FROM nodes n LEFT JOIN seeds sd USING (url) CROSS JOIN ns),
deg AS (SELECT src, count(*)::DOUBLE AS odeg FROM edges GROUP BY 1),
ed AS MATERIALIZED (SELECT e.src, e.dst, deg.odeg
                    FROM edges e JOIN deg USING (src)),
r0 AS (SELECT url, sv AS rank FROM s)"""]
    for k in range(1, PAGERANK_ITERS + 1):
        parts.append(f""",
c{k} AS (SELECT ed.dst, sum(r.rank/ed.odeg) AS c FROM ed
         JOIN r{k - 1} r ON ed.src = r.url GROUP BY 1),
t{k} AS (SELECT coalesce(sum(c), 0) AS t FROM c{k}),
r{k} AS (SELECT s.url,
                (1-{d})*s.sv + {d}*(coalesce(c.c, 0) + (1-t{k}.t)*s.sv)
                    AS rank
         FROM s LEFT JOIN c{k} c ON s.url = c.dst CROSS JOIN t{k})""")
    parts.append(
        f"\nSELECT url, round(rank, 6) AS rank FROM r{PAGERANK_ITERS}")
    return "".join(parts)


HITS_ITERS = 5


def _q_hits_scores(sf_dir: str):
    from rse_ray.pipelines.linkgraph import hits_scores

    return _finalize(hits_scores(_extracted_links(), iters=HITS_ITERS))


def _hits_sql() -> str:
    """Unrolled HITS twin over the generator's golden links — raw sums
    and normalized scores round to 9dp each half-step exactly like the
    engine, so the fp state both sides iterate from is pinned. Every
    CTE is MATERIALIZED: DuckDB inlines multi-referenced CTEs by
    default, and the doubly-referenced per-iteration chain re-expands
    exponentially (verified: >7 min inlined vs 0.2 s materialized)."""
    links = os.path.join(LINKGRAPH_DIR, "golden_links.parquet")
    parts = [f"""
WITH edges AS MATERIALIZED (SELECT src_url AS src, dst_url AS dst
               FROM read_parquet('{links}')),
nodes AS MATERIALIZED (SELECT src AS url FROM edges UNION SELECT dst FROM edges),
nn AS MATERIALIZED (SELECT count(*)::DOUBLE AS n FROM nodes),
h0 AS MATERIALIZED (SELECT url, round(1.0/sqrt(nn.n), 9) AS s
       FROM nodes CROSS JOIN nn)"""]
    for k in range(1, HITS_ITERS + 1):
        parts.append(f""",
ar{k} AS MATERIALIZED (SELECT n.url, round(coalesce(s.v, 0), 9) AS v
          FROM nodes n LEFT JOIN
               (SELECT e.dst AS url, sum(h.s) AS v FROM edges e
                JOIN h{k - 1} h ON e.src = h.url GROUP BY 1) s
               USING (url)),
az{k} AS MATERIALIZED (SELECT sqrt(sum(v*v)) AS z FROM ar{k}),
a{k} AS MATERIALIZED (SELECT url, CASE WHEN z > 0 THEN round(v/z, 9) ELSE 0 END AS s
         FROM ar{k} CROSS JOIN az{k}),
hr{k} AS MATERIALIZED (SELECT n.url, round(coalesce(s.v, 0), 9) AS v
          FROM nodes n LEFT JOIN
               (SELECT e.src AS url, sum(a.s) AS v FROM edges e
                JOIN a{k} a ON e.dst = a.url GROUP BY 1) s
               USING (url)),
hz{k} AS MATERIALIZED (SELECT sqrt(sum(v*v)) AS z FROM hr{k}),
h{k} AS MATERIALIZED (SELECT url, CASE WHEN z > 0 THEN round(v/z, 9) ELSE 0 END AS s
         FROM hr{k} CROSS JOIN hz{k})""")
    parts.append(f"""
SELECT h.url, round(h.s, 6) AS hub, round(a.s, 6) AS authority
FROM h{HITS_ITERS} h JOIN a{HITS_ITERS} a USING (url)""")
    return "".join(parts)


def _q_related_pages(sf_dir: str):
    from rse_ray.pipelines.linkgraph import related_pages

    return _finalize(related_pages(_extracted_links()))


def _related_pages_sql() -> str:
    """Co-citation Jaccard twin over the golden links: same
    informative-source window (distinct out-degree in [2, 100]) and
    same kept-source in-degrees as the engine."""
    links = os.path.join(LINKGRAPH_DIR, "golden_links.parquet")
    return f"""
WITH e AS MATERIALIZED (
    SELECT DISTINCT src_url AS src, dst_url AS dst
    FROM read_parquet('{links}')
    WHERE src_url IS NOT NULL AND dst_url IS NOT NULL),
keep AS (SELECT src FROM e GROUP BY 1 HAVING count(*) BETWEEN 2 AND 100),
ek AS MATERIALIZED (SELECT e.src, e.dst FROM e JOIN keep USING (src)),
deg AS (SELECT dst, count(*) AS d FROM ek GROUP BY 1),
pairs AS (SELECT a.dst AS url_a, b.dst AS url_b, count(*) AS common
          FROM ek a JOIN ek b ON a.src = b.src AND a.dst < b.dst
          GROUP BY 1, 2)
SELECT url_a, url_b, common,
       round(common::DOUBLE / (d1.d + d2.d - common), 6) AS jaccard
FROM pairs JOIN deg d1 ON pairs.url_a = d1.dst
           JOIN deg d2 ON pairs.url_b = d2.dst
WHERE common >= 1"""


def _q_bloom_semi_join(sf_dir: str):
    from rse_ray.pipelines.relational import bloom_semi_join

    orders = _read(sf_dir, "orders")
    building = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]) \
        .filter(expr="c_mktsegment == 'BUILDING'")
    return _finalize(bloom_semi_join(
        orders, building, left_on="o_custkey", right_on="c_custkey"))


CC_SQL_ITERS = 12  # golden-links graph converges in 6; 2x margin


def _q_connected_components(sf_dir: str):
    from rse_ray.pipelines.linkgraph import connected_components

    return _finalize(connected_components(_extracted_links()))


GRAPH_LINKS = "/tmp/rse_ray_cache/graph_600_v1/links.parquet"
GRAPH_CORE_LINKS = "/tmp/rse_ray_cache/graph_core_v1/links.parquet"
# k-core SQL unroll bounds: fixture degeneracy is 7 (K8 clique) and no
# level needs more than 3 peel rounds; extra rounds are the identity
CORE_SQL_KMAX, CORE_SQL_ROUNDS = 8, 6


def _graph_links_path() -> str:
    """Synthetic link graph with PLANTED triangles / mutual pairs /
    hub / self-loops / duplicate edges — the crawler corpus's golden
    links have none of those (0 triangles, 0 reciprocal pairs), so the
    structural graph queries get their own deterministic fixture."""
    from rse_ray.sources.fixtures import generate_graph

    generate_graph(GRAPH_LINKS)
    return GRAPH_LINKS


ROBOTS_DIR = "/tmp/rse_ray_cache/robots_v2"  # v2: +frontier_rules
CANON_URLS = "/tmp/rse_ray_cache/canon_v1/urls.parquet"


def _q_canonical_urls(sf_dir: str):
    import ray.data

    from rse_ray.pipelines.linkgraph import canonical_urls
    from rse_ray.sources.fixtures import generate_canonical_fixture

    generate_canonical_fixture(CANON_URLS)
    return _finalize(canonical_urls(ray.data.read_parquet(CANON_URLS)))


def _q_ddl_quarantine(sf_dir: str):
    """Field-width quarantine over the crawler corpus — the oracle
    reads extracted fields from the golden text column (title/desc =
    lines 1/2 of the byte-exact extraction contract)."""
    import ray.data

    from rse_ray.pipelines.linkgraph import ddl_quarantine

    return _finalize(ddl_quarantine(
        ray.data.read_parquet(_linkgraph_pages_paths())))


def _ddl_quarantine_sql() -> str:
    pages = os.path.join(LINKGRAPH_DIR, "pages_*.parquet")
    return f"""
WITH f AS (SELECT url, split_part(text, chr(10), 1) AS title,
                  split_part(text, chr(10), 2) AS description
           FROM read_parquet('{pages}'))
SELECT url, 'url' AS field, length(url)::BIGINT AS length,
       8192::BIGINT AS limit_ FROM f WHERE length(url) > 8192
UNION ALL
SELECT url, 'title', length(title)::BIGINT, 256::BIGINT
FROM f WHERE length(title) > 256
UNION ALL
SELECT url, 'description', length(description)::BIGINT, 1024::BIGINT
FROM f WHERE length(description) > 1024"""


def _q_frontier_prep(sf_dir: str):
    import ray.data

    from rse_ray.pipelines.linkgraph import frontier_prep
    from rse_ray.sources.fixtures import generate_robots_fixture

    generate_robots_fixture(ROBOTS_DIR)
    return _finalize(frontier_prep(
        ray.data.read_parquet(_linkgraph_pages_paths()),
        ray.data.read_parquet(
            os.path.join(ROBOTS_DIR, "frontier_rules.parquet"))))


def _frontier_prep_sql() -> str:
    """The crawl-loop tail replayed: distinct golden link targets,
    minus visited pages, robots precedence, per-host politeness
    wave."""
    links = os.path.join(LINKGRAPH_DIR, "golden_links.parquet")
    pages = os.path.join(LINKGRAPH_DIR, "pages_*.parquet")
    rules = os.path.join(ROBOTS_DIR, "frontier_rules.parquet")
    return f"""
WITH cand AS (SELECT DISTINCT dst_url AS url FROM read_parquet('{links}')),
fresh AS (SELECT url FROM cand
          WHERE url NOT IN (SELECT url FROM read_parquet('{pages}'))),
u AS (SELECT url,
        regexp_extract(url, '^https?://([^/?#]*)', 1) AS host,
        coalesce(nullif(regexp_extract(
            url, '^https?://[^/?#]*([^#?]*)', 1), ''), '/') AS path
      FROM fresh),
m AS (SELECT u.url, r.allow, length(r.prefix) AS plen
      FROM u JOIN read_parquet('{rules}') r
        ON u.host = r.host AND starts_with(u.path, r.prefix)),
ranked AS (SELECT url, allow,
                  row_number() OVER (PARTITION BY url
                                     ORDER BY plen DESC, allow DESC) AS rn
           FROM m),
kept AS (SELECT u.url, u.host FROM u
         LEFT JOIN ranked r ON r.url = u.url AND r.rn = 1
         WHERE coalesce(r.allow, TRUE))
SELECT url, host,
       (row_number() OVER (PARTITION BY host ORDER BY url) - 1)::BIGINT
           AS wave
FROM kept"""


def _canonical_urls_sql() -> str:
    """The canonicalization contract replayed with DuckDB string/list
    kernels: lowercase scheme + host, strip www., drop default ports,
    strip trailing slashes ('' -> '/'), drop fragment, filter empty +
    tracking query params, sort the rest."""
    return f"""
WITH u AS (SELECT url,
    lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
    lower(regexp_extract(url, '^[^:]+://([^/?#]*)', 1)) AS hostport,
    regexp_extract(url, '^[^:]+://[^/?#]*([^?#]*)', 1) AS rawpath,
    regexp_extract(url, '^[^#]*\\?([^#]*)', 1) AS rawq
  FROM read_parquet('{CANON_URLS}')),
parts AS (SELECT url, scheme,
    regexp_replace(regexp_extract(hostport, '^([^:]*)', 1),
                   '^www\\.', '') AS host,
    regexp_extract(hostport, ':([0-9]+)$', 1) AS port,
    CASE WHEN regexp_replace(rawpath, '/+$', '') = '' THEN '/'
         ELSE regexp_replace(rawpath, '/+$', '') END AS path,
    array_to_string(list_sort(list_filter(str_split(rawq, '&'),
        p -> p <> '' AND NOT regexp_matches(
            p, '^(utm_|fbclid(=|$)|gclid(=|$)|ref(=|$))'))), '&') AS qs
  FROM u)
SELECT url, scheme || '://' || host ||
       CASE WHEN port = '' OR (scheme = 'http' AND port = '80')
                 OR (scheme = 'https' AND port = '443')
            THEN '' ELSE ':' || port END ||
       path ||
       CASE WHEN qs <> '' THEN '?' || qs ELSE '' END AS canonical_url
FROM parts"""


def _q_robots_filter(sf_dir: str):
    import ray.data

    from rse_ray.pipelines.linkgraph import robots_filter
    from rse_ray.sources.fixtures import generate_robots_fixture

    generate_robots_fixture(ROBOTS_DIR)
    return _finalize(robots_filter(
        ray.data.read_parquet(os.path.join(ROBOTS_DIR, "urls.parquet")),
        ray.data.read_parquet(os.path.join(ROBOTS_DIR, "rules.parquet"))))


def _robots_sql() -> str:
    """Longest-prefix robots precedence in SQL: rank matching rules
    per url by (prefix length DESC, allow DESC — allow wins ties),
    default allow when nothing matches."""
    urls = os.path.join(ROBOTS_DIR, "urls.parquet")
    rules = os.path.join(ROBOTS_DIR, "rules.parquet")
    return f"""
WITH u AS (SELECT url,
             regexp_extract(url, '^https?://([^/?#]*)', 1) AS host,
             coalesce(nullif(regexp_extract(
                 url, '^https?://[^/?#]*([^#?]*)', 1), ''), '/') AS path
           FROM read_parquet('{urls}')),
m AS (SELECT u.url, r.allow, length(r.prefix) AS plen
      FROM u JOIN read_parquet('{rules}') r
        ON u.host = r.host AND starts_with(u.path, r.prefix)),
ranked AS (SELECT url, allow,
                  row_number() OVER (PARTITION BY url
                                     ORDER BY plen DESC, allow DESC) AS rn
           FROM m)
SELECT u.url, coalesce(r.allow, TRUE) AS allowed
FROM u LEFT JOIN ranked r ON r.url = u.url AND r.rn = 1"""


def _core_graph_links_path() -> str:
    """Planted coreness-spectrum fixture (pendants=1, ring=2, K5=4,
    K8=7, plus self-loops/dup edges) — generate_graph's fixture is
    uniformly coreness 2, so k-core gets its own."""
    from rse_ray.sources.fixtures import generate_core_graph

    generate_core_graph(GRAPH_CORE_LINKS)
    return GRAPH_CORE_LINKS


GRAPH_SCC_LINKS = "/tmp/rse_ray_cache/graph_scc_v1/links.parquet"


def _scc_graph_links_path() -> str:
    """Planted SCC-spectrum fixture (the crawl-graph fixture is one
    giant SCC): 4-cycles in a shallow DAG + singleton sources/sinks +
    a self-loop."""
    from rse_ray.sources.fixtures import generate_scc_graph

    generate_scc_graph(GRAPH_SCC_LINKS)
    return GRAPH_SCC_LINKS


def _q_scc(sf_dir: str):
    import ray.data

    from rse_ray.pipelines.linkgraph import scc

    return _finalize(scc(ray.data.read_parquet(_scc_graph_links_path())))


def _q_coreness(sf_dir: str):
    import ray.data

    from rse_ray.pipelines.linkgraph import coreness

    return _finalize(coreness(
        ray.data.read_parquet(_core_graph_links_path())))


def _coreness_sql() -> str:
    """Unrolled Matula-Beck peeling twin: for each level k, ROUNDS
    simultaneous peel rounds (survivors = alive nodes with >= k alive
    neighbors); coreness(v) = max level whose fixpoint contains v.
    Extra rounds past a level's fixpoint are the identity, so the
    static (KMAX x ROUNDS) unroll is exact once bounds cover the
    fixture (asserted in tests against the engine)."""
    links = GRAPH_CORE_LINKS
    parts = [f"""
WITH e0 AS (SELECT src_url AS src, dst_url AS dst
            FROM read_parquet('{links}') WHERE src_url <> dst_url
            UNION
            SELECT dst_url, src_url
            FROM read_parquet('{links}') WHERE src_url <> dst_url),
nodes AS (SELECT DISTINCT src AS url FROM e0),
r0_0 AS (SELECT url FROM nodes)"""]
    prev = "r0_0"
    finals = []
    for k in range(1, CORE_SQL_KMAX + 1):
        for r in range(1, CORE_SQL_ROUNDS + 1):
            cur = f"r{k}_{r}"
            parts.append(f""",
{cur} AS MATERIALIZED (
    SELECT e0.src AS url FROM e0
    JOIN {prev} p ON e0.src = p.url
    JOIN {prev} q ON e0.dst = q.url
    GROUP BY e0.src HAVING count(*) >= {k})""")
            prev = cur
        finals.append((k, prev))
    unions = "\nUNION ALL\n".join(
        f"SELECT url, {k} AS k FROM {name}" for k, name in finals)
    parts.append(f""",
lv AS ({unions})
SELECT n.url, coalesce(m.c, 0) AS coreness
FROM nodes n LEFT JOIN (SELECT url, max(k) AS c FROM lv GROUP BY 1) m
     USING (url)""")
    return "".join(parts)


def _q_degree_distribution(sf_dir: str):
    import ray.data

    from rse_ray.pipelines.linkgraph import degree_distribution

    return _finalize(degree_distribution(
        ray.data.read_parquet(_graph_links_path())))


def _q_reciprocal_links(sf_dir: str):
    import ray.data

    from rse_ray.pipelines.linkgraph import reciprocal_links

    return _finalize(reciprocal_links(
        ray.data.read_parquet(_graph_links_path())))


def _q_triangle_count(sf_dir: str):
    import ray.data

    from rse_ray.pipelines.linkgraph import triangle_count

    return _finalize(triangle_count(
        ray.data.read_parquet(_graph_links_path())))


def _connected_components_sql() -> str:
    """Unrolled min-label-propagation twin over the symmetrized golden
    links (recursive CTEs disallow aggregates; CC_SQL_ITERS is 2x the
    measured convergence depth, and past the fixpoint every extra
    iteration is the identity)."""
    links = os.path.join(LINKGRAPH_DIR, "golden_links.parquet")
    parts = [f"""
WITH edges AS (SELECT src_url AS src, dst_url AS dst
               FROM read_parquet('{links}')
               UNION
               SELECT dst_url, src_url FROM read_parquet('{links}')),
nodes AS (SELECT DISTINCT src AS url FROM edges),
l0 AS (SELECT url, url AS lbl FROM nodes)"""]
    for k in range(1, CC_SQL_ITERS + 1):
        # MATERIALIZED: l{k-1} is referenced twice — without it DuckDB
        # inlines the chain and the plan grows 2^k
        parts.append(f""",
l{k} AS MATERIALIZED (
         SELECT p.url, least(p.lbl, coalesce(min(q.lbl), p.lbl)) AS lbl
         FROM l{k - 1} p
         LEFT JOIN edges e ON e.src = p.url
         LEFT JOIN l{k - 1} q ON q.url = e.dst
         GROUP BY p.url, p.lbl)""")
    parts.append(
        f"\nSELECT url, lbl AS component FROM l{CC_SQL_ITERS}")
    return "".join(parts)


def _q_reference_rank(sf_dir: str):
    import ray.data

    from rse_ray.pipelines.linkgraph import extract_links, reference_search
    from rse_ray.sources.fixtures import make_vocab

    pages = ray.data.read_parquet(_linkgraph_pages_paths())
    links = extract_links(pages)
    vocab = make_vocab(10_000, 11)
    query = f"{vocab[0]} {vocab[2]} {vocab[0]}"
    df = reference_search(pages, links, query, stem=True)
    # 6dp: kills float sum-order noise so the SQL oracle matches exactly
    df["rank"] = df["rank"].round(6)
    return _finalize(df)


def _q_media_features(sf_dir: str):
    """REAL multimodal decode over a deterministic BMP/PNG/WAV corpus
    (no media tables exist in testdata): payloads are actual encoded
    containers, the decode is pure numpy+zlib, and the features are oracled
    against the generator's golden parquet (computed from the raw
    arrays before encoding — the full round trip must be bit-exact)."""
    import ray.data

    from rse_ray.pipelines.multimodal import media_features

    d = _media_fixture_dir()
    ds = ray.data.read_parquet(os.path.join(d, "media.parquet"))
    return _finalize(media_features(ds, backend="real"))


PHASH_DIR = "/tmp/rse_ray_cache/phash_v2_48"  # v2: +JPEG bases
PHASH_MAX_HAMMING = 3


def _phash_fixture_dir() -> str:
    from rse_ray.pipelines.multimodal import write_phash_fixture

    write_phash_fixture(PHASH_DIR, n_base=48, seed=11)
    return PHASH_DIR


def _q_image_phash(sf_dir: str):
    """Perceptual hashes over the planted near-dup image corpus —
    decode (BMP/PNG) + DCT pHash, oracled against the generator's
    golden parquet (hashes computed from raw pixels pre-encode)."""
    import ray.data

    from rse_ray.pipelines.multimodal import image_phash

    d = _phash_fixture_dir()
    ds = ray.data.read_parquet(os.path.join(d, "media.parquet"))
    return _finalize(image_phash(ds))


def _q_image_dup_pairs(sf_dir: str):
    import ray.data

    from rse_ray.pipelines.multimodal import image_dup_pairs

    d = _phash_fixture_dir()
    ds = ray.data.read_parquet(os.path.join(d, "media.parquet"))
    return _finalize(image_dup_pairs(ds, max_hamming=PHASH_MAX_HAMMING))


# ---------------------------------------------------------------------------
# generated oracle SQL (computed from the same constants the Ray side uses)
# ---------------------------------------------------------------------------

def _q_image_dup_clusters(sf_dir: str):
    import ray.data

    from rse_ray.pipelines.multimodal import image_dup_clusters

    d = _phash_fixture_dir()
    ds = ray.data.read_parquet(os.path.join(d, "media.parquet"))
    return _finalize(image_dup_clusters(ds, max_hamming=PHASH_MAX_HAMMING))


def _q_audio_rms(sf_dir: str):
    """Framewise RMS over the real WAV decode — golden-oracled
    pre-encode like media_features."""
    import ray.data

    from rse_ray.pipelines.multimodal import audio_rms_windows

    d = _media_fixture_dir()
    ds = ray.data.read_parquet(os.path.join(d, "media.parquet"))
    return _finalize(audio_rms_windows(ds))


def _lang_id_sql() -> str:
    """DuckDB replica of pipelines/text.LangId: per-doc lowercase-letter
    counts (case-sensitive replace — the Ray histogram only counts
    bytes 97..122), dot product against the unit-normalized profiles,
    argmax with ties broken lang-ascending (np.argmax takes the first
    maximum over the asc-sorted lang list)."""
    import numpy as np

    from rse_ray.pipelines.text import _LANG_PROFILES

    langs = sorted(_LANG_PROFILES)
    letters = sorted({ch for p in _LANG_PROFILES.values() for ch in p})
    mat = np.zeros((len(langs), 26), dtype=np.float64)
    for li, lang in enumerate(langs):
        for ch, w in _LANG_PROFILES[lang].items():
            mat[li, ord(ch) - 97] = w
    norm = np.linalg.norm(mat, axis=1, keepdims=True)
    mat = mat / np.where(norm == 0, 1, norm)
    counts = ",\n         ".join(
        f"(length(text) - length(replace(text, '{ch}', '')))::DOUBLE AS c_{ch}"
        for ch in letters
    )
    sims = []
    for li, lang in enumerate(langs):
        terms = " + ".join(
            f"c_{ch} * {mat[li, ord(ch) - 97]!r}"
            for ch in letters if mat[li, ord(ch) - 97] != 0.0
        )
        sims.append(f"SELECT doc_id, '{lang}' AS lang, {terms} AS sim FROM c")
    union = "\nUNION ALL ".join(sims)
    return f"""
WITH c AS (
  SELECT doc_id,
         {counts}
  FROM documents
), sims AS (
{union}
)
SELECT doc_id, lang AS lang_pred FROM sims
QUALIFY row_number() OVER (PARTITION BY doc_id
                           ORDER BY sim DESC, lang ASC) = 1"""


def _simhash_sql(max_hamming: int = 3) -> str:
    """DuckDB replica of functions/hashing.simhash64 + the pair scan:
    token hash = md5_number_lower (little-endian high 8 digest bytes,
    byte-identical to the Python side), bit votes, signature, then all
    pairs with bit_count(xor) <= max_hamming. Exact — the Ray side's
    4-quarter prefix trick is guaranteed-recall at Hamming <= 3, so
    both sides enumerate the identical pair set."""
    return f"""
WITH toks0 AS (
  SELECT doc_id, unnest(regexp_split_to_array(text, '\\s+')) AS tok
  FROM documents
), th AS (
  SELECT doc_id, md5_number_lower(tok) AS h FROM toks0 WHERE tok <> ''
), bits AS (
  SELECT doc_id, b, sum(2 * ((h >> b) & 1)::BIGINT - 1) AS acc
  FROM th, unnest(range(0, 64)) AS r(b)
  GROUP BY doc_id, b
), sig AS (
  SELECT doc_id,
         sum(CASE WHEN acc > 0 THEN (1::UBIGINT << b) ELSE 0::UBIGINT
             END)::UBIGINT AS s
  FROM bits GROUP BY doc_id
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       bit_count(xor(a.s, b.s))::BIGINT AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.s, b.s)) <= {max_hamming}"""


def _winnow_sql(window: int = 64, mod_bits: int = 4) -> str:
    """DuckDB replica of functions/hashing.rolling_fingerprint: the
    Rabin-Karp window hash rewritten as its closed form — a 64-term
    weighted byte sum mod 2^31-1 (each term < 2^39, 64 terms < 2^45,
    safely inside BIGINT before the single mod). Short docs emit the
    whole-document polynomial hash ungated.

    ASCII contract: the Python side hashes UTF-8 BYTES while SQL sees
    codepoints/char-lengths — identical only for ASCII text, which the
    documents fixtures guarantee (the same caveat applies to every
    text oracle's \\s+ splitting vs str.split())."""
    base, mod = 257, (1 << 31) - 1
    powers = ", ".join(
        f"({e}, {pow(base, e, mod)})" for e in range(window)
    )
    mask = (1 << mod_bits) - 1
    return f"""
WITH pw(e, w) AS (VALUES {powers}),
ex AS (
  SELECT doc_id, length(text) AS L,
         unnest(range(1, length(text) + 1)) AS i, text
  FROM documents
), byte AS (
  SELECT doc_id, L, i, unicode(substr(text, i::INT, 1))::BIGINT AS v FROM ex
), win AS (
  SELECT a.doc_id, a.i, (sum(b.v * pw.w) % {mod}) AS hv
  FROM byte a
  JOIN byte b ON b.doc_id = a.doc_id AND b.i BETWEEN a.i - {window - 1} AND a.i
  JOIN pw ON pw.e = a.i - b.i
  WHERE a.L >= {window} AND a.i >= {window}
  GROUP BY a.doc_id, a.i
), short AS (
  SELECT doc_id, (sum(v * pw.w) % {mod}) AS hv
  FROM byte JOIN pw ON pw.e = L - i
  WHERE L < {window} AND L > 0
  GROUP BY doc_id
)
SELECT doc_id, hv::BIGINT AS fp FROM win WHERE (hv & {mask}) = 0
UNION ALL
SELECT doc_id, hv::BIGINT AS fp FROM short"""


def _reference_rank_sql() -> str:
    """DuckDB replica of pipelines/linkgraph.reference_search over the
    generator-golden fixtures: relevance = query-tf x page-tf where the
    Porter stemming is PRECOMPUTED here (the full vocab is stemmed and
    every word sharing a query stem enters the VALUES list with that
    stem's query tf — SQL then only needs lower+split+join), and rank
    is the reference's degenerate PageRank over the golden links."""
    from collections import Counter

    from rse_ray.functions.tokenizer import porter_stem, tokenize
    from rse_ray.sources.fixtures import make_vocab

    vocab = make_vocab(10_000, 11)
    query = f"{vocab[0]} {vocab[2]} {vocab[0]}"
    qtf = Counter(tokenize(query, stem=True))
    matched: dict[str, int] = {}
    for w in set(vocab):
        s = porter_stem(w)
        if s in qtf:
            matched[w] = qtf[s]
    values = ", ".join(f"('{w}', {q})" for w, q in sorted(matched.items()))
    pages_glob = os.path.join(LINKGRAPH_DIR, "pages_*.parquet")
    links = os.path.join(LINKGRAPH_DIR, "golden_links.parquet")
    return f"""
WITH toks0 AS (
  SELECT url, unnest(regexp_split_to_array(lower(text), '\\s+')) AS term
  FROM read_parquet('{pages_glob}')
), q(term, w) AS (VALUES {values}),
rel AS (
  SELECT url, sum(w)::BIGINT AS relevance
  FROM toks0 JOIN q USING (term) GROUP BY url
),
bl AS (
  SELECT src_url, count(*)::BIGINT AS n
  FROM read_parquet('{links}')
  WHERE dst_url IN (SELECT url FROM rel)
  GROUP BY src_url
),
contrib AS (
  SELECT bl.src_url AS url, COALESCE(r.relevance, 0)::DOUBLE / bl.n AS c
  FROM bl LEFT JOIN rel r ON r.url = bl.src_url
),
tot AS (SELECT COALESCE(sum(c), 0)::DOUBLE AS t FROM contrib)
SELECT r.url, r.relevance,
       round((1.0 + tot.t - COALESCE(c2.c, 0)) * 0.85, 6) AS rank
FROM rel r CROSS JOIN tot LEFT JOIN contrib c2 ON c2.url = r.url"""


# ---------------------------------------------------------------------------
# the contract
# ---------------------------------------------------------------------------

def entry() -> Any:
    """Flagship: full html->index->BM25 pipeline at sf0.001. Documents
    are wrapped into the reference HTML shape so the byte-exact
    extractor runs, then indexed (stemmed) and queried."""
    import ray.data

    from rse_ray.pipelines.build import BuildConfig, build_index
    from rse_ray.pipelines.search import Searcher, hydrate_urls

    sf_dir = "/root/testdata/sf0.001"

    def wrap_html(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        urls, htmls = [], []
        from datetime import datetime, timedelta

        for i, t in zip(ids, texts):
            urls.append(f"https://docs.example/{i:012d}")
            htmls.append(
                (f"<!DOCTYPE html><html><head><title>document {i}</title>"
                 f'<meta name="description" content="synthetic doc {i}">'
                 f"</head><body><p>{t}</p></body></html>").encode()
            )
        ts = [datetime(2024, 12, 1) + timedelta(seconds=i) for i in ids]
        return pa.table(
            {"url": pa.array(urls), "warc_ts": pa.array(ts, type=pa.timestamp("us")),
             "html": pa.array(htmls, type=pa.binary())}
        )

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    ).map_batches(wrap_html, batch_format="pyarrow")
    index_dir = "/tmp/rse_ray_cache/flagship_sf0001"
    build_index(ds, index_dir,
                BuildConfig(num_buckets=16, buckets_per_salt_group=4,
                            stem=True, from_html=True))
    s = Searcher(index_dir)
    hits = s.search("spark windows merged data", k=10)
    rows = hydrate_urls(index_dir, hits)
    import pandas as pd

    return pd.DataFrame(
        {"rank": range(1, len(rows) + 1),
         "doc_id": [d for d, _, _ in rows],
         "score": [round(sc, 6) for _, sc, _ in rows],
         "url": [u for _, _, u in rows]}
    )


def _q_market_share(sf_dir: str):
    from rse_ray.pipelines.relational import market_share

    return _finalize(market_share(
        _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]),
        _read(sf_dir, "orders",
              ["o_orderkey", "o_custkey", "o_orderdate"]),
        _read(sf_dir, "lineitem",
              ["l_orderkey", "l_partkey", "l_suppkey",
               "l_extendedprice", "l_discount"]),
        _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]),
        _read(sf_dir, "nation", ["n_nationkey", "n_name",
                                 "n_regionkey"]),
        _read(sf_dir, "region", ["r_regionkey", "r_name"]),
        _read(sf_dir, "part", ["p_partkey", "p_type"])))


def _q_product_profit(sf_dir: str):
    from rse_ray.pipelines.relational import product_profit

    return _finalize(product_profit(
        _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"]),
        _read(sf_dir, "lineitem",
              ["l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
               "l_extendedprice", "l_discount"]),
        _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]),
        _read(sf_dir, "nation", ["n_nationkey", "n_name"]),
        _read(sf_dir, "part",
              ["p_partkey", "p_name", "p_retailprice"])))


def _q_bm25_pruned(sf_dir: str):
    from rse_ray.pipelines.text import bm25_pruned

    return _finalize(bm25_pruned(
        _read(sf_dir, "documents", ["doc_id", "text"]),
        BM25_QUERY, keep_pct=50, k=20))


RL_CAPACITY, RL_REFILL = 3.0, 1.0 / 600.0


def _q_transition_entropy(sf_dir: str):
    from rse_ray.pipelines.relational import transition_entropy

    return _finalize(transition_entropy(
        _read(sf_dir, "events",
              ["user_id", "ts", "event_id", "event_type"])))


def _q_hll_sliding(sf_dir: str):
    from rse_ray.pipelines.sketch import hll_sliding

    return _finalize(hll_sliding(
        _read(sf_dir, "events", ["ts", "user_id"]),
        window_hours=3))


def _q_rate_limit_replay(sf_dir: str):
    from rse_ray.pipelines.relational import rate_limit_replay

    return _finalize(rate_limit_replay(
        _read(sf_dir, "events", ["user_id", "ts", "event_id"]),
        capacity=RL_CAPACITY, refill_per_s=RL_REFILL))


def _q_theil_sen_trend(sf_dir: str):
    from rse_ray.pipelines.relational import theil_sen_trend

    return _finalize(theil_sen_trend(_read(sf_dir, "events", ["ts"])))


def _q_ks_test(sf_dir: str):
    from rse_ray.pipelines.relational import ks_test

    return _finalize(ks_test(
        _read(sf_dir, "events", ["event_type", "value"])))


def _q_spearman_corr(sf_dir: str):
    from rse_ray.pipelines.relational import spearman_corr

    return _finalize(spearman_corr(
        _read(sf_dir, "lineitem", ["l_quantity", "l_extendedprice"])))


def _q_waiting_suppliers(sf_dir: str):
    from rse_ray.pipelines.relational import waiting_suppliers

    return _finalize(waiting_suppliers(
        _read(sf_dir, "supplier", ["s_suppkey", "s_name"]),
        _read(sf_dir, "orders",
              ["o_orderkey", "o_orderdate", "o_orderstatus"]),
        _read(sf_dir, "lineitem",
              ["l_orderkey", "l_suppkey", "l_shipdate"])))


def _q_min_cost_supplier(sf_dir: str):
    from rse_ray.pipelines.relational import min_cost_supplier

    return _finalize(min_cost_supplier(
        _read(sf_dir, "part", ["p_partkey", "p_size", "p_type"]),
        _read(sf_dir, "supplier",
              ["s_suppkey", "s_name", "s_acctbal", "s_nationkey"]),
        _read(sf_dir, "lineitem",
              ["l_partkey", "l_suppkey", "l_extendedprice",
               "l_quantity"]),
        _read(sf_dir, "nation"),
        _read(sf_dir, "region")))


def _q_important_parts(sf_dir: str):
    from rse_ray.pipelines.relational import important_parts

    return _finalize(important_parts(
        _read(sf_dir, "lineitem",
              ["l_partkey", "l_suppkey", "l_extendedprice",
               "l_discount"]),
        _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])))


def _q_supplier_part_counts(sf_dir: str):
    from rse_ray.pipelines.relational import supplier_part_counts

    return _finalize(supplier_part_counts(
        _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"]),
        _read(sf_dir, "part",
              ["p_partkey", "p_brand", "p_type", "p_size"]),
        _read(sf_dir, "supplier", ["s_suppkey", "s_acctbal"])))


def _q_promotion_suppliers(sf_dir: str):
    from rse_ray.pipelines.relational import promotion_suppliers

    return _finalize(promotion_suppliers(
        _read(sf_dir, "part", ["p_partkey", "p_name"]),
        _read(sf_dir, "lineitem",
              ["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"]),
        _read(sf_dir, "supplier",
              ["s_suppkey", "s_name", "s_acctbal"])))


DSIR_TARGET = "src0"


def _q_dsir_weights(sf_dir: str):
    from rse_ray.pipelines.text import dsir_weights

    return _finalize(dsir_weights(
        _read(sf_dir, "documents", ["doc_id", "text", "source"]),
        target_source=DSIR_TARGET))


def _q_adamic_adar(sf_dir: str):
    from rse_ray.pipelines.linkgraph import adamic_adar

    return _finalize(adamic_adar(_extracted_links()))


def _adamic_adar_sql() -> str:
    """AA twin over the golden links: same informative-source window
    (distinct out-degree in [2, 100]) as related_pages, weights
    1/ln(out_degree), already-linked pairs excluded over the full
    distinct undirected edge set."""
    links = os.path.join(LINKGRAPH_DIR, "golden_links.parquet")
    return f"""
WITH e AS MATERIALIZED (
    SELECT DISTINCT src_url AS src, dst_url AS dst
    FROM read_parquet('{links}')
    WHERE src_url IS NOT NULL AND dst_url IS NOT NULL),
keep AS (SELECT src, count(*)::DOUBLE AS c FROM e GROUP BY 1
         HAVING count(*) BETWEEN 2 AND 100),
ek AS MATERIALIZED (SELECT e.src, e.dst, k.c
                    FROM e JOIN keep k USING (src)),
pairs AS (SELECT a.dst AS url_a, b.dst AS url_b,
                 count(*)::BIGINT AS common,
                 sum(1.0 / ln(a.c)) AS aa
          FROM ek a JOIN ek b ON a.src = b.src AND a.dst < b.dst
          GROUP BY 1, 2),
ue AS (SELECT DISTINCT least(src_url, dst_url) AS u,
              greatest(src_url, dst_url) AS v
       FROM read_parquet('{links}')
       WHERE src_url IS NOT NULL AND dst_url IS NOT NULL
         AND src_url <> dst_url)
SELECT url_a, url_b, common, round(aa, 6) AS aa
FROM pairs p
WHERE NOT EXISTS (SELECT 1 FROM ue
                  WHERE ue.u = p.url_a AND ue.v = p.url_b)"""


def _q_jaccard_links(sf_dir: str):
    from rse_ray.pipelines.linkgraph import jaccard_links

    return _finalize(jaccard_links(_extracted_links()))


def _jaccard_links_sql() -> str:
    """Jaccard twin: common counts AND windowed in-degrees on the same
    [2, 100]-out-degree source universe; linked pairs excluded."""
    links = os.path.join(LINKGRAPH_DIR, "golden_links.parquet")
    return f"""
WITH e AS MATERIALIZED (
    SELECT DISTINCT src_url AS src, dst_url AS dst
    FROM read_parquet('{links}')
    WHERE src_url IS NOT NULL AND dst_url IS NOT NULL),
keep AS (SELECT src FROM e GROUP BY 1
         HAVING count(*) BETWEEN 2 AND 100),
ek AS MATERIALIZED (SELECT e.src, e.dst
                    FROM e JOIN keep k USING (src)),
pairs AS (SELECT a.dst AS url_a, b.dst AS url_b,
                 count(*)::BIGINT AS common
          FROM ek a JOIN ek b ON a.src = b.src AND a.dst < b.dst
          GROUP BY 1, 2),
ind AS (SELECT dst, count(*)::BIGINT AS ind FROM ek GROUP BY 1),
ue AS (SELECT DISTINCT least(src_url, dst_url) AS u,
              greatest(src_url, dst_url) AS v
       FROM read_parquet('{links}')
       WHERE src_url IS NOT NULL AND dst_url IS NOT NULL
         AND src_url <> dst_url)
SELECT p.url_a, p.url_b, p.common,
       round(p.common * 1.0 / (ia.ind + ib.ind - p.common), 6)
           AS jaccard
FROM pairs p JOIN ind ia ON ia.dst = p.url_a
     JOIN ind ib ON ib.dst = p.url_b
WHERE NOT EXISTS (SELECT 1 FROM ue
                  WHERE ue.u = p.url_a AND ue.v = p.url_b)"""


def _q_chi_square_lang_source(sf_dir: str):
    from rse_ray.pipelines.relational import chi_square_independence

    return _finalize(chi_square_independence(
        _read(sf_dir, "documents", ["lang", "source"])))


def _q_mann_whitney_u(sf_dir: str):
    from rse_ray.pipelines.relational import mann_whitney_u

    return _finalize(mann_whitney_u(
        _read(sf_dir, "events", ["event_type", "value"])))


def _q_late_shipment_priority(sf_dir: str):
    from rse_ray.pipelines.relational import late_shipment_priority

    return _finalize(late_shipment_priority(
        _read(sf_dir, "orders",
              ["o_orderkey", "o_orderdate", "o_orderpriority"]),
        _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])))


def _q_priority_line_counts(sf_dir: str):
    from rse_ray.pipelines.relational import priority_line_counts

    return _finalize(priority_line_counts(
        _read(sf_dir, "lineitem",
              ["l_orderkey", "l_returnflag", "l_shipdate"]),
        _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])))


def _q_customer_order_distribution(sf_dir: str):
    from rse_ray.pipelines.relational import (
        customer_order_distribution)

    return _finalize(customer_order_distribution(
        _read(sf_dir, "customer", ["c_custkey"]),
        _read(sf_dir, "orders", ["o_custkey"])))


def _q_large_volume_customers(sf_dir: str):
    from rse_ray.pipelines.relational import large_volume_customers

    return _finalize(large_volume_customers(
        _read(sf_dir, "customer", ["c_custkey", "c_name"]),
        _read(sf_dir, "orders",
              ["o_orderkey", "o_custkey", "o_orderdate",
               "o_totalprice"]),
        _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"]),
        min_qty=300.0, k=100))


def _q_idle_rich_customers(sf_dir: str):
    from rse_ray.pipelines.relational import idle_rich_customers

    return _finalize(idle_rich_customers(
        _read(sf_dir, "customer",
              ["c_custkey", "c_nationkey", "c_acctbal"]),
        _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])))


def _q_nation_trade_volume(sf_dir: str):
    from rse_ray.pipelines.relational import nation_trade_volume

    return _finalize(nation_trade_volume(
        _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]),
        _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]),
        _read(sf_dir, "lineitem",
              ["l_orderkey", "l_suppkey", "l_extendedprice",
               "l_discount", "l_shipdate"]),
        _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]),
        _read(sf_dir, "nation", ["n_nationkey", "n_name"])))


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        # fulltext core (tokenize -> postings -> stats -> BM25)
        "doc_token_stats": _q_doc_token_stats,
        "vocab_growth": _q_vocab_growth,
        "zipf_slope": _q_zipf_slope,
        "langid_confusion": _q_langid_confusion,
        "negative_sampling_table": _q_negative_sampling_table,
        "postings": _q_postings,
        "term_df": _q_term_df,
        "corpus_stats": _q_corpus_stats,
        "bm25_scores": _q_bm25_scores,
        "bm25_topk": _q_bm25_topk,
        "bm25_topk_distributed": _q_bm25_topk_distributed,
        "bm25_prf": _q_bm25_prf,
        "bm25_snippets": _q_bm25_snippets,
        "index_stats": _q_index_stats,
        "bm25_page2": _q_bm25_page2,
        "bm25_total_hits": _q_bm25_total_hits,
        "bm25_synonyms": _q_bm25_synonyms,
        "suggest_terms": _q_suggest_terms,
        "wildcard_terms": _q_wildcard_terms,
        "hybrid_rrf": _q_hybrid_rrf,
        "hybrid_combsum": _q_hybrid_combsum,
        "query_clarity": _q_query_clarity,
        "bm25_topk_diverse": _q_bm25_topk_diverse,
        "bm25_proximity": _q_bm25_proximity,
        "knn_cosine_sq_rerank": _q_knn_cosine_sq_rerank,
        "bm25_champions": _q_bm25_champions,
        "bm25_plus_scores": _q_bm25_plus,
        "bm25_topk_maxscore": _q_bm25_maxscore,
        "span_near": _q_span_near,
        "phrase_gap": _q_phrase_gap,
        "bm25f_scores": _q_bm25f_scores,
        "lm_dirichlet_scores": _q_lm_dirichlet_scores,
        "lm_jm_scores": _q_lm_jm_scores,
        "dfr_pl2_scores": _q_dfr_pl2_scores,
        "ltr_features": _q_ltr_features,
        "batch_bm25_topk": _q_batch_bm25_topk,
        "retrieval_metrics": _q_retrieval_metrics,
        "normalize_text": _q_normalize_text,
        # text analysis (training-data ops)
        "quality_scores": _q_quality,
        "gopher_rules": _q_gopher_rules,
        "mlm_mask_plan": _q_mlm_mask_plan,
        "codec_size_report": _q_codec_size_report,
        "phrase_scan": _q_phrase_scan,
        "cms_term_counts": _q_cms_term_counts,
        "registrable_domains": _q_registrable_domains,
        "canonical_dedup": _q_canonical_dedup,
        "content_chunks": _q_content_chunks,
        "mix_plan": _q_mix_plan,
        "freq_spectrum": _q_freq_spectrum,
        "auto_stopwords": _q_auto_stopwords,
        "sentence_split": _q_sentence_split,
        "significant_terms": _q_significant_terms,
        "llr_bigrams": _q_llr_bigrams,
        "group_ols": _q_group_ols,
        "fuzzy_pairs": _q_fuzzy_pairs,
        "market_basket": _q_market_basket,
        "trending_event_types": _q_trending_event_types,
        "ab_test_welch": _q_ab_test_welch,
        "mmr_rerank": _q_mmr_rerank,
        "bool_query": _q_bool_query,
        "mad_outliers": _q_mad_outliers,
        "user_ewma": _q_user_ewma,
        "percolate": _q_percolate,
        "scd2_intervals": _q_scd2_intervals,
        "lsa_power_iteration": _q_lsa_power_iteration,
        "shipping_priority": _q_shipping_priority,
        "winsorized_mean": _q_winsorized_mean,
        "consistent_hash_moves": _q_consistent_hash_moves,
        "rag_chunk_search": _q_rag_chunk_search,
        "did_you_mean": _q_did_you_mean,
        "condensation_layers": _q_condensation_layers,
        "group_moments": _q_group_moments,
        "hill_tail_index": _q_hill_tail_index,
        "arrow_ipc_counts": _q_arrow_ipc_counts,
        "audio_spectrogram": _q_audio_spectrogram,
        "textrank_keywords": _q_textrank_keywords,
        "user_burstiness": _q_user_burstiness,
        "fk_violations": _q_fk_violations,
        "rake_phrases": _q_rake_phrases,
        "local_supplier_volume": _q_local_supplier_volume,
        "quality_threshold_sweep": _q_quality_threshold_sweep,
        "video_scene_cuts": _q_video_scene_cuts,
        "small_quantity_revenue": _q_small_quantity_revenue,
        "deterministic_walks": _q_deterministic_walks,
        "bm25_explain": _q_bm25_explain,
        "nearest_centroid_eval": _q_nearest_centroid_eval,
        "time_rollup_counts": _q_time_rollup_counts,
        "benford_prices": _q_benford_prices,
        "returned_item_revenue": _q_returned_item_revenue,
        "promo_revenue": _q_promo_revenue,
        "discounted_revenue": _q_discounted_revenue,
        "top_supplier_revenue": _q_top_supplier_revenue,
        "host_pagerank": _q_host_pagerank,
        "readability_scores": _q_readability_scores,
        "source_lang_entropy": _q_source_lang_entropy,
        "cusum_drift": _q_cusum_drift,
        "rfm_segments": _q_rfm_segments,
        "market_share": _q_market_share,
        "product_profit": _q_product_profit,
        "waiting_suppliers": _q_waiting_suppliers,
        "ks_test": _q_ks_test,
        "theil_sen_trend": _q_theil_sen_trend,
        "rate_limit_replay": _q_rate_limit_replay,
        "hll_sliding": _q_hll_sliding,
        "transition_entropy": _q_transition_entropy,
        "bm25_pruned": _q_bm25_pruned,
        "spearman_corr": _q_spearman_corr,
        "min_cost_supplier": _q_min_cost_supplier,
        "important_parts": _q_important_parts,
        "supplier_part_counts": _q_supplier_part_counts,
        "promotion_suppliers": _q_promotion_suppliers,
        "dsir_weights": _q_dsir_weights,
        "chi_square_lang_source": _q_chi_square_lang_source,
        "mann_whitney_u": _q_mann_whitney_u,
        "late_shipment_priority": _q_late_shipment_priority,
        "priority_line_counts": _q_priority_line_counts,
        "customer_order_distribution": _q_customer_order_distribution,
        "large_volume_customers": _q_large_volume_customers,
        "idle_rich_customers": _q_idle_rich_customers,
        "nation_trade_volume": _q_nation_trade_volume,
        "boilerplate_ngrams": _q_boilerplate_ngrams,
        "main_content": _q_main_content,
        "webtext_clean": _q_webtext_clean,
        "tokenizer_fertility": _q_tokenizer_fertility,
        "source_overlap_matrix": _q_source_overlap_matrix,
        "daily_anomalies": _q_daily_anomalies,
        "hard_negatives": _q_hard_negatives,
        "conversion_latency": _q_conversion_latency,
        "user_growth_curve": _q_user_growth_curve,
        "feature_hashing": _q_feature_hashing,
        "corpus_release": _q_corpus_release,
        "containment_pairs": _q_containment_pairs,
        "mix_epochs": _q_mix_epochs,
        "dup_chunks": _q_dup_chunks,
        "lineitem_corr": _q_lineitem_corr,
        "skew_report": _q_skew_report,
        "grouping_sets_counts": _q_grouping_sets,
        "ttl_dedup": _q_ttl_dedup,
        "pushdown_scan": _q_pushdown_scan,
        "warc_source_docs": _q_warc_source_docs,
        "zorder_key": _q_zorder_key,
        "pii_counts": _q_pii_counts,
        "pii_redact": _q_pii_redact,
        "doc_fingerprints": _q_fingerprint,
        "regex_token_counts": _q_regex_token_counts,
        "winnow_fingerprints": _q_winnow_fingerprints,
        "lang_id": _q_lang_id,
        # dedup family
        "exact_dedup": _q_exact_dedup,
        "paragraph_dedup": _q_paragraph_dedup,
        "dedup_last_writer": _q_last_writer,
        "ngram_jaccard_pairs": _q_ngram_jaccard,
        "minhash_dedup_pairs": _q_minhash_pairs,
        "dup_clusters": _q_dup_clusters,
        "dup_graph_stats": _q_dup_graph_stats,
        "dedup_keep_representative": _q_keep_representative,
        "simhash_dup_pairs": _q_simhash_pairs,
        # similarity search
        "knn_cosine": _q_knn,
        "knn_cosine_sq": _q_knn_sq,
        "knn_cosine_pq": _q_knn_pq,
        "knn_cosine_lsh": _q_lsh_knn,
        "knn_cosine_hnsw": _q_hnsw_knn,
        "knn_cosine_ivf": _q_ivf_knn,
        "knn_cosine_ivf_exact": _q_ivf_knn_exact,
        "embedding_centroids": _q_centroids,
        "kmeans_clusters": _q_kmeans_clusters,
        "semdedup": _q_semdedup,
        "nb_classify": _q_nb_classify,
        "webdataset_shards": _q_webdataset_shards,
        "source_gini": _q_source_gini,
        "rbo_source_drift": _q_rbo_source_drift,
        "langid_kappa": _q_langid_kappa,
        "burrows_delta": _q_burrows_delta,
        "heaps_fit": _q_heaps_fit,
        "otsu_threshold": _q_otsu_threshold,
        "fightin_words": _q_fightin_words,
        "lead_terms": _q_lead_terms,
        "multi_pattern_scan": _q_multi_pattern_scan,
        "mrf_sd_scores": _q_mrf_sd_scores,
        "info_gain_terms": _q_info_gain_terms,
        "cosine_neardup_pairs": _q_cos_neardup,
        # relational / streaming surface
        "pricing_summary": _q_pricing,
        "top_orders": _q_top_orders,
        "revenue_filter": _q_revenue,
        "semi_join_customers": _q_semi_join,
        "orders_by_segment": _q_orders_by_segment,
        "window_agg": _q_window_agg,
        "window_agg_late": _q_window_agg_late,
        "hopping_window_agg": _q_hopping_window_agg,
        "asof_last_purchase": _q_asof_last_purchase,
        "asof_last_purchase_partitioned": _q_asof_last_purchase_partitioned,
        "orders_customer_join": _q_orders_customer_join,
        "orders_customer_left_join": _q_orders_customer_left_join,
        "train_val_split": _q_train_val_split,
        "top_docs_per_lang": _q_top_docs_per_lang,
        "sessions": _q_sessions,
        "session_attribution": _q_session_attribution,
        "group_quantiles": _q_group_quantiles,
        "customers_without_orders": _q_customers_without_orders,
        "tfidf_topk": _q_tfidf_topk,
        "pack_sequences": _q_pack_sequences,
        "bigram_counts": _q_bigram_counts,
        "bm25_conjunctive": _q_bm25_conjunctive,
        "bm25_msm": _q_bm25_msm,
        "bm25_not": _q_bm25_not,
        "vsm_cosine_topk": _q_vsm_cosine_topk,
        "oov_rate": _q_oov_rate,
        "prefix_search": _q_prefix_search,
        "bm25_with_deletes": _q_bm25_with_deletes,
        "bm25_after_compact": _q_bm25_after_compact,
        "phrase_after_compact": _q_phrase_after_compact,
        "bm25_after_compact_refresh": _q_bm25_after_compact_refresh,
        "bm25_filtered": _q_bm25_filtered,
        "more_like_this": _q_more_like_this,
        "phrase_match": _q_phrase_match,
        "fuzzy_terms": _q_fuzzy_terms,
        "phrase_match_indexed": _q_phrase_match_indexed,
        "term_proximity_indexed": _q_term_proximity_indexed,
        "term_proximity": _q_term_proximity,
        "kwic_snippets": _q_kwic_snippets,
        "facet_counts": _q_facet_counts,
        "token_entropy": _q_token_entropy,
        "corpus_divergence": _q_corpus_divergence,
        "skipgram_counts": _q_skipgram_counts,
        "pmi_topk": _q_pmi_topk,
        "epoch_shuffle": _q_epoch_shuffle,
        "bpe_train": _q_bpe_train,
        "bpe_token_counts": _q_bpe_token_counts,
        "decontaminate": _q_decontaminate,
        "dup_spans": _q_dup_spans,
        "dup_span_stats": _q_dup_span_stats,
        "pattern_scan": _q_pattern_scan,
        "stratified_sample": _q_stratified_sample,
        "lang_quota_sample": _q_lang_quota_sample,
        "incremental_dedup": _q_incremental_dedup,
        "jsonl_source_counts": _q_jsonl_source_counts,
        "csv_source_window_agg": _q_csv_source_window_agg,
        "quality_rank": _q_quality_rank,
        "quality_ntile": _q_quality_ntile,
        "doc_lm_score": _q_doc_lm_score,
        "lm_quality_buckets": _q_lm_quality_buckets,
        "snapshot_diff": _q_snapshot_diff,
        "embedding_covariance": _q_embedding_covariance,
        "random_projection": _q_random_projection,
        "pca_project": _q_pca_project,
        "funnel_counts": _q_funnel_counts,
        "retention_cohorts": _q_retention_cohorts,
        "value_zscores": _q_value_zscores,
        "event_transitions": _q_event_transitions,
        "weekly_churn": _q_weekly_churn,
        "event_paths": _q_event_paths,
        "weighted_sample": _q_weighted_sample,
        "weighted_sample_by_group": _q_weighted_sample_by_group,
        "rolling_time_window": _q_rolling_time_window,
        "repetition_scores": _q_repetition_scores,
        "approx_ndistinct_users": _q_approx_ndistinct_users,
        "approx_ndistinct_by_type": _q_approx_ndistinct_by_type,
        "heavy_hitter_terms": _q_heavy_hitter_terms,
        "video_frame_sample": _q_video_frame_sample,
        "image_resize": _q_image_resize,
        "recency_filter": _q_recency_filter,
        "distinct_lang_source": _q_distinct,
        "rollup_counts": _q_rollup_counts,
        "partitioned_sink": _q_partitioned_sink,
        "cube_counts": _q_cube_counts,
        "user_customer_full_join": _q_full_outer_join,
        "user_window_funcs": _q_user_window_funcs,
        "value_histogram": _q_value_histogram,
        "profile_events": _q_profile_events,
        "event_type_pivot": _q_event_pivot,
        "event_type_unpivot": _q_event_unpivot,
        "rank_funcs": _q_rank_funcs,
        "pretrain_pack": _q_pretrain_pack,
        "dense_window_agg": _q_dense_window_agg,
        "doc_chunks": _q_doc_chunks,
        "above_group_median": _q_above_group_median,
        "json_props_sum": _q_json_sum,
        # link graph (reference M5/A2/A3/A4 capability)
        "reference_relevance": _q_reference_relevance,
        "link_extract": _q_link_extract,
        "url_templates": _q_url_templates,
        "crawl_budget": _q_crawl_budget,
        "diameter_estimate": _q_diameter_estimate,
        "backlink_counts": _q_backlink_counts,
        "anchor_terms": _q_anchor_terms,
        "anchor_boosted_rank": _q_anchor_boosted_rank,
        "pagerank": _q_pagerank,
        "hits_scores": _q_hits_scores,
        "pagerank_personalized": _q_pagerank_personalized,
        "related_pages": _q_related_pages,
        "adamic_adar": _q_adamic_adar,
        "jaccard_links": _q_jaccard_links,
        "bloom_semi_join": _q_bloom_semi_join,
        "crawl_depth": _q_crawl_depth,
        "connected_components": _q_connected_components,
        "degree_distribution": _q_degree_distribution,
        "reciprocal_links": _q_reciprocal_links,
        "triangle_count": _q_triangle_count,
        "coreness": _q_coreness,
        "scc": _q_scc,
        "robots_filter": _q_robots_filter,
        "canonical_urls": _q_canonical_urls,
        "frontier_prep": _q_frontier_prep,
        "ddl_quarantine": _q_ddl_quarantine,
        "domain_counts": _q_domain_counts,
        "reference_rank": _q_reference_rank,
        # multimodal plumbing (stubbed decode kernel)
        "media_features": _q_media_features,
        "image_transcode": _q_image_transcode,
        "image_phash": _q_image_phash,
        "audio_rms_windows": _q_audio_rms,
        "image_dup_pairs": _q_image_dup_pairs,
        "image_dup_clusters": _q_image_dup_clusters,
    }


def oracle_sql() -> dict[str, str]:
    from rse_ray.pipelines.ann import kmeans_oracle_sql, semdedup_oracle_sql
    from rse_ray.pipelines.relational import window_agg_late_oracle_sql
    from rse_ray.pipelines.bpe import bpe_encode_oracle_sql
    from rse_ray.pipelines.sketch import (hll_group_oracle_sql,
                                          hll_oracle_sql)

    sql = {
        "doc_token_stats": _TOKS + """
SELECT doc_id, count(*)::BIGINT AS n_tokens,
       count(DISTINCT term)::BIGINT AS n_unique
FROM toks GROUP BY doc_id""",
        "postings": _TOKS + """
SELECT term, doc_id, count(*)::BIGINT AS tf FROM toks GROUP BY term, doc_id""",
        # Zipf rank-frequency OLS fit over the term distribution
        "zipf_slope": _TOKS + """,
t AS (SELECT term, count(*)::BIGINT AS total_tf FROM toks GROUP BY 1),
r AS (SELECT total_tf,
             row_number() OVER (ORDER BY total_tf DESC, term) AS rank
      FROM t),
s AS (SELECT count(*)::DOUBLE AS n, sum(ln(rank)) AS sx,
             sum(ln(total_tf)) AS sy, sum(ln(rank) * ln(total_tf)) AS sxy,
             sum(ln(rank) * ln(rank)) AS sxx FROM r)
SELECT n::BIGINT AS n_terms,
       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
       round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6)
           AS intercept
FROM s""",
        # word2vec negative-sampling distribution: P(t) ~ tf^0.75
        "negative_sampling_table": _TOKS + """,
t AS (SELECT term, count(*)::BIGINT AS total_tf FROM toks GROUP BY 1)
SELECT term, round(pow(total_tf, 0.75)
                   / (SELECT sum(pow(total_tf, 0.75)) FROM t), 9)
           AS weight
FROM t""",
        # Heaps-law curve: cumulative tokens + cumulative distinct
        # terms (a term counts at its FIRST doc) in doc_id order
        "vocab_growth": _TOKS + """,
nt AS (SELECT d.doc_id, count(t.term)::BIGINT AS nt
       FROM documents d LEFT JOIN toks t USING (doc_id) GROUP BY 1),
firsts AS (SELECT term, min(doc_id) AS fd FROM toks GROUP BY 1),
nv AS (SELECT fd AS doc_id, count(*)::BIGINT AS nv FROM firsts GROUP BY 1)
SELECT nt.doc_id,
       CAST(sum(nt.nt) OVER w AS BIGINT) AS cum_tokens,
       CAST(sum(coalesce(nv.nv, 0)) OVER w AS BIGINT) AS cum_vocab
FROM nt LEFT JOIN nv USING (doc_id)
WINDOW w AS (ORDER BY nt.doc_id ROWS UNBOUNDED PRECEDING)""",
        "term_df": _TOKS + """
, p AS (SELECT term, doc_id, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2)
SELECT term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS total_tf
FROM p GROUP BY term""",
        "corpus_stats": _TOKS + """
, dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks GROUP BY 1)
SELECT count(*)::BIGINT AS n_docs, sum(dl)::BIGINT AS total_tokens,
       round(sum(dl)::DOUBLE / count(*), 6) AS avgdl
FROM dl""",
        "bm25_scores": _BM25_CTES + """
SELECT doc_id, round(raw, 6) AS score FROM scores""",
        "bm25_topk": _BM25_CTES + """
SELECT doc_id, round(raw, 6) AS score FROM scores
ORDER BY raw DESC, doc_id LIMIT 20""",
        # cursor pagination: page 2 == OFFSET over the same strict
        # total order the cursor walks
        "bm25_page2": _BM25_CTES + """
SELECT doc_id, round(raw, 6) AS score FROM scores
ORDER BY raw DESC, doc_id LIMIT 20 OFFSET 20""",
        # the API's total-hit count: docs matching >= 1 query term
        "bm25_total_hits": _BM25_CTES + """
SELECT count(*)::BIGINT AS n_hits FROM scores""",
        # the scatter-gather + sharded-accumulator path must reproduce
        # the exact same scores as the driver-side scorer
        "bm25_topk_distributed": _BM25_CTES + """
SELECT doc_id, round(raw, 6) AS score FROM scores
ORDER BY raw DESC, doc_id LIMIT 20""",
        # manifest metrics vs ground truth: docs/tokens/avgdl/terms/
        # postings recounted from the corpus must equal what the
        # build's counters and shard directories report
        "index_stats": _TOKS + """,
dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks GROUP BY 1),
p AS (SELECT DISTINCT term, doc_id FROM toks)
SELECT (SELECT count(*) FROM documents)::BIGINT AS num_docs,
       (SELECT coalesce(sum(dl), 0) FROM dl)::BIGINT AS num_tokens,
       round((SELECT coalesce(sum(dl), 0) FROM dl)::DOUBLE
             / (SELECT count(*) FROM documents), 9) AS avgdl,
       (SELECT count(DISTINCT term) FROM toks)::BIGINT AS num_terms,
       (SELECT count(*) FROM p)::BIGINT AS num_postings""",
        # best-window snippets: for each top-k hit, the width-token
        # window with the most DISTINCT query terms (ties earliest);
        # snippet = the tokenizer's lowercased whitespace tokens
        "bm25_snippets": _BM25_CTES + f""",
topk AS (SELECT doc_id FROM scores ORDER BY raw DESC, doc_id LIMIT 10),
arr AS (SELECT d.doc_id,
          list_filter(regexp_split_to_array(lower(d.text), '\\s+'),
                      x -> x <> '') AS a
        FROM documents d JOIN topk USING (doc_id)),
meta AS (SELECT doc_id, a, len(a) AS n,
                least({SNIPPET_WIDTH}, len(a)) AS w FROM arr),
pos AS (SELECT doc_id, i, a[i] AS term
        FROM meta, unnest(range(1, n + 1)) AS t(i)),
qpos AS (SELECT doc_id, i, term FROM pos
         WHERE term IN (SELECT term FROM q)),
starts AS (SELECT doc_id, w, s
           FROM meta, unnest(range(1, n - w + 2)) AS t(s)),
wc AS (SELECT st.doc_id, st.s, st.w, count(DISTINCT p.term) AS c
       FROM starts st LEFT JOIN qpos p
         ON p.doc_id = st.doc_id AND p.i >= st.s AND p.i < st.s + st.w
       GROUP BY 1, 2, 3),
best AS (SELECT doc_id, s, w, c,
                row_number() OVER (PARTITION BY doc_id
                                   ORDER BY c DESC, s) AS rn FROM wc)
SELECT b.doc_id, (b.s - 1)::BIGINT AS win_start, b.c::BIGINT AS n_terms,
       array_to_string(m.a[b.s:b.s + b.w - 1], ' ') AS snippet
FROM best b JOIN meta m USING (doc_id) WHERE rn = 1""",
        # Rocchio PRF replayed end-to-end: round-1 scores CTE picks the
        # feedback set, offer weight = sum_fb(tf) * idf ranks the
        # expansion terms (query terms excluded, term-asc ties), and
        # round 2 rescores the weighted expanded query
        "bm25_prf": _BM25_CTES + f""",
fb AS (SELECT doc_id FROM scores
       ORDER BY raw DESC, doc_id LIMIT {PRF_FB_DOCS}),
exp AS (SELECT p.term,
               sum(p.tf)::DOUBLE *
                   ln(1 + (any_value(s.n) - any_value(d.df) + 0.5)
                      / (any_value(d.df) + 0.5)) AS w
        FROM p JOIN fb USING (doc_id) JOIN d USING (term) CROSS JOIN s
        WHERE p.term NOT IN (SELECT term FROM q)
        GROUP BY p.term
        ORDER BY w DESC, p.term LIMIT {PRF_FB_TERMS}),
q1 AS (SELECT term, qtf::DOUBLE AS w FROM q
       UNION ALL SELECT term, {PRF_BETA!r} FROM exp),
scores1 AS (
  SELECT p.doc_id,
         sum(q1.w * ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5)) *
             (p.tf * (1.2 + 1)) /
             (p.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl))) AS raw
  FROM p JOIN q1 USING (term) JOIN d USING (term)
       JOIN dl ON p.doc_id = dl.doc_id CROSS JOIN s
  GROUP BY p.doc_id)
SELECT doc_id, round(raw, 6) AS score FROM scores1
ORDER BY raw DESC, doc_id LIMIT 20""",
        # Dirichlet query-likelihood: every >=1-term candidate pays
        # each query term's smoothed contribution (tf=0 via the LEFT
        # JOIN) — the per-doc dl coupling BM25's per-posting sum lacks
        "lm_dirichlet_scores": _TOKS + f""",
p AS (SELECT term, doc_id, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks GROUP BY 1),
tot AS (SELECT sum(dl)::DOUBLE AS t FROM dl),
q(term, qtf) AS (VALUES {BM25_QUERY_SQL_TERMS}),
cf AS (SELECT term, sum(tf)::DOUBLE AS cf FROM p GROUP BY 1),
cand AS (SELECT DISTINCT p.doc_id FROM p JOIN q USING (term)),
scores AS (
  SELECT cand.doc_id,
         sum(q.qtf * ln((coalesce(pp.tf, 0) + {LM_MU!r} * cf.cf / tot.t)
                        / (dl.dl + {LM_MU!r}))) AS raw
  FROM cand CROSS JOIN q JOIN cf ON cf.term = q.term
       LEFT JOIN p pp ON pp.doc_id = cand.doc_id AND pp.term = q.term
       JOIN dl ON dl.doc_id = cand.doc_id CROSS JOIN tot
  GROUP BY 1)
SELECT doc_id, round(raw, 6) AS score FROM scores""",
        "lm_jm_scores": _TOKS + f""",
p AS (SELECT term, doc_id, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks GROUP BY 1),
tot AS (SELECT sum(dl)::DOUBLE AS t FROM dl),
q(term, qtf) AS (VALUES {BM25_QUERY_SQL_TERMS}),
cf AS (SELECT term, sum(tf)::DOUBLE AS cf FROM p GROUP BY 1),
cand AS (SELECT DISTINCT p.doc_id FROM p JOIN q USING (term)),
scores AS (
  SELECT cand.doc_id,
         sum(q.qtf * ln((1 - {LM_JM_LAMBDA!r}) *
                        (coalesce(pp.tf, 0)::DOUBLE / dl.dl)
                        + {LM_JM_LAMBDA!r} * cf.cf / tot.t)) AS raw
  FROM cand CROSS JOIN q JOIN cf ON cf.term = q.term
       LEFT JOIN p pp ON pp.doc_id = cand.doc_id AND pp.term = q.term
       JOIN dl ON dl.doc_id = cand.doc_id CROSS JOIN tot
  GROUP BY 1)
SELECT doc_id, round(raw, 6) AS score FROM scores""",
        # DFR PL2 (Amati & van Rijsbergen 2002): tfn-normalized
        # Poisson divergence with Laplace after-effect; avgdl follows
        # the index's 9dp-rounded stats convention
        "dfr_pl2_scores": _TOKS + f""",
p AS (SELECT term, doc_id, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks GROUP BY 1),
s AS (SELECT count(*)::DOUBLE AS n,
             round(sum(dl)::DOUBLE / count(*), 9) AS avgdl FROM dl),
q(term, qtf) AS (VALUES {BM25_QUERY_SQL_TERMS}),
cf AS (SELECT term, sum(tf)::DOUBLE AS cf FROM p GROUP BY 1),
t AS (SELECT p.doc_id, q.qtf, cf.cf / s.n AS lam,
             p.tf * log2(1 + (1.0 * s.avgdl) / dl.dl) AS tfn
      FROM p JOIN q USING (term) JOIN cf USING (term)
           JOIN dl ON dl.doc_id = p.doc_id CROSS JOIN s),
sc AS (SELECT doc_id,
         sum(qtf * (tfn * log2(tfn / lam)
                    + (lam - tfn) * log2(exp(1))
                    + 0.5 * log2(2 * pi() * tfn)) / (tfn + 1)) AS raw
       FROM t GROUP BY 1)
SELECT doc_id, round(raw, 6) AS score FROM sc""",
        "ltr_features": _TOKS + f""",
p AS (SELECT term, doc_id, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks GROUP BY 1),
s AS (SELECT count(*)::DOUBLE AS n, sum(dl)::DOUBLE / count(*) AS avgdl
      FROM dl),
q(term, qtf) AS (VALUES {BM25_QUERY_SQL_TERMS}),
d AS (SELECT term, count(*)::DOUBLE AS df FROM p GROUP BY 1),
f AS (
  SELECT p.doc_id,
         sum(q.qtf * ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5)) *
             (p.tf * (1.2 + 1)) /
             (p.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl))) AS raw,
         count(*)::BIGINT AS n_match,
         sum(p.tf)::BIGINT AS sum_tf,
         max(p.tf)::BIGINT AS max_tf,
         sum(ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5))) AS raw_idf
  FROM p JOIN q USING (term) JOIN d USING (term)
       JOIN dl ON p.doc_id = dl.doc_id CROSS JOIN s
  GROUP BY p.doc_id)
SELECT f.doc_id, round(raw, 6) AS bm25, dl.dl AS dl, n_match,
       sum_tf, max_tf, round(raw_idf, 6) AS sum_idf
FROM f JOIN dl ON f.doc_id = dl.doc_id""",
        # synonym expansion = the standard BM25 CTE over the EXPANDED
        # (term, qtf) list; 'seek' (df 0) drops out via the df join
        "bm25_synonyms": _BM25_CTES_TMPL.format(terms=SYN_SQL_TERMS) + """
SELECT doc_id, round(raw, 6) AS score FROM scores
ORDER BY raw DESC, doc_id LIMIT 20""",
        # autocomplete: prefix completions ranked (df desc, term asc)
        "suggest_terms": _TOKS + f"""
SELECT term, count(DISTINCT doc_id)::BIGINT AS df
FROM toks WHERE term LIKE '{PREFIX_QUERY}%' GROUP BY term
ORDER BY df DESC, term LIMIT {SUGGEST_K}""",
        "bm25_plus_scores": _TOKS + f""",
p AS (SELECT term, doc_id, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks GROUP BY 1),
s AS (SELECT count(*)::DOUBLE AS n, sum(dl)::DOUBLE / count(*) AS avgdl
      FROM dl),
q(term, qtf) AS (VALUES {BM25_QUERY_SQL_TERMS}),
d AS (SELECT term, count(*)::DOUBLE AS df FROM p GROUP BY 1),
scores AS (
  SELECT p.doc_id,
         sum(q.qtf * ln((s.n + 1) / d.df) *
             ((1.2 + 1) * (p.tf / (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) /
              (1.2 + p.tf / (1 - 0.75 + 0.75 * dl.dl / s.avgdl))
              + 1.0)) AS raw
  FROM p JOIN q USING (term) JOIN d USING (term)
       JOIN dl ON p.doc_id = dl.doc_id CROSS JOIN s
  GROUP BY p.doc_id)
SELECT doc_id, round(raw, 6) AS score FROM scores""",
        "hybrid_rrf": _BM25_CTES_TMPL.format(
            terms=BM25_QUERY_SQL_TERMS) + f""",
lex AS (SELECT doc_id,
               row_number() OVER (ORDER BY raw DESC, doc_id) AS r
        FROM scores QUALIFY r <= 50),
qv AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings
       WHERE vec_id = {KNN_QUERY_IDS[0]}),
vec AS (SELECT e.vec_id AS doc_id,
               row_number() OVER (ORDER BY list_cosine_similarity(
                   qv.qe, CAST(e.embedding AS DOUBLE[])) DESC,
                   e.vec_id) AS r
        FROM embeddings e CROSS JOIN qv
        WHERE e.vec_id <> {KNN_QUERY_IDS[0]} QUALIFY r <= 50),
f AS (SELECT coalesce(l.doc_id, v.doc_id) AS doc_id,
             coalesce(1.0 / (60 + l.r), 0)
             + coalesce(1.0 / (60 + v.r), 0) AS raw_rrf
      FROM lex l FULL OUTER JOIN vec v ON l.doc_id = v.doc_id)
SELECT doc_id, round(raw_rrf, 6) AS rrf FROM f
ORDER BY raw_rrf DESC, doc_id LIMIT 20""",
        # CombSUM/CombMNZ fusion: min-max over each list's RAW scores,
        # missing side contributes 0, MNZ multiplies by list count
        "hybrid_combsum": _BM25_CTES_TMPL.format(
            terms=BM25_QUERY_SQL_TERMS) + f""",
lex AS (SELECT doc_id, raw FROM scores
        QUALIFY row_number() OVER (ORDER BY raw DESC, doc_id) <= 50),
qv AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings
       WHERE vec_id = {KNN_QUERY_IDS[0]}),
vec AS (SELECT e.vec_id AS doc_id,
               list_cosine_similarity(
                   qv.qe, CAST(e.embedding AS DOUBLE[])) AS raw
        FROM embeddings e CROSS JOIN qv
        WHERE e.vec_id <> {KNN_QUERY_IDS[0]}
        QUALIFY row_number() OVER (ORDER BY raw DESC, e.vec_id)
                <= 50),
lnorm AS (SELECT doc_id,
                 CASE WHEN max(raw) OVER () = min(raw) OVER ()
                      THEN 0.0
                      ELSE (raw - min(raw) OVER ())
                           / (max(raw) OVER () - min(raw) OVER ())
                 END AS n
          FROM lex),
vnorm AS (SELECT doc_id,
                 CASE WHEN max(raw) OVER () = min(raw) OVER ()
                      THEN 0.0
                      ELSE (raw - min(raw) OVER ())
                           / (max(raw) OVER () - min(raw) OVER ())
                 END AS n
          FROM vec),
f AS (SELECT coalesce(l.doc_id, v.doc_id) AS doc_id,
             coalesce(l.n, 0) + coalesce(v.n, 0) AS cs,
             (coalesce(l.n, 0) + coalesce(v.n, 0))
             * ((l.doc_id IS NOT NULL)::INT
                + (v.doc_id IS NOT NULL)::INT) AS mnz
      FROM lnorm l FULL OUTER JOIN vnorm v ON l.doc_id = v.doc_id)
SELECT doc_id, round(cs, 6) AS combsum, round(mnz, 6) AS combmnz
FROM f ORDER BY mnz DESC, doc_id LIMIT 20""",
        # BM25 + 1/mindist^2 pair-proximity boost (positional unnest)
        "bm25_proximity": _BM25_CTES_TMPL.format(
            terms=BM25_QUERY_SQL_TERMS) + """,
arr AS (SELECT doc_id,
    list_filter(regexp_split_to_array(lower(text), '\\s+'),
                x -> x <> '') AS a FROM documents),
pos AS (SELECT doc_id, i, a[i] AS w
        FROM arr, unnest(range(1, len(a) + 1)) AS t(i)),
qp AS (SELECT doc_id, w, i FROM pos
       WHERE w IN ('merge', 'spark', 'window')),
md AS (SELECT p1.doc_id, p1.w AS wa, p2.w AS wb,
              min(abs(p1.i - p2.i))::BIGINT AS d
       FROM qp p1 JOIN qp p2
         ON p1.doc_id = p2.doc_id AND p1.w < p2.w
       GROUP BY 1, 2, 3),
px AS (SELECT doc_id, sum(1.0 / (d * d)) AS prox FROM md
       GROUP BY 1)
SELECT s.doc_id,
       round(s.raw + coalesce(px.prox, 0.0), 6) AS score
FROM scores s LEFT JOIN px USING (doc_id)
ORDER BY s.raw + coalesce(px.prox, 0.0) DESC, s.doc_id
LIMIT 20""",
        # source-diversified top-k: per-source quota window then
        # overall top-k window (order-equivalent to greedy skip-full)
        "bm25_topk_diverse": _BM25_CTES_TMPL.format(
            terms=BM25_QUERY_SQL_TERMS) + """,
pool AS (SELECT doc_id, raw FROM scores
         QUALIFY row_number() OVER (ORDER BY raw DESC, doc_id)
                 <= 50),
ann AS (SELECT p.doc_id, d.source, p.raw,
               row_number() OVER (PARTITION BY d.source
                   ORDER BY p.raw DESC, p.doc_id) AS sr
        FROM pool p JOIN documents d USING (doc_id))
SELECT doc_id, source, round(raw, 6) AS score FROM ann
WHERE sr <= 2
QUALIFY row_number() OVER (ORDER BY raw DESC, doc_id) <= 10""",
        # clarity = KL(topk-concatenation LM || collection LM) over the
        # top-k vocabulary
        "query_clarity": _BM25_CTES_TMPL.format(
            terms=BM25_QUERY_SQL_TERMS) + """,
topd AS (SELECT doc_id FROM scores
         QUALIFY row_number() OVER (ORDER BY raw DESC, doc_id)
                 <= 10),
qt AS (SELECT t.term, count(*)::BIGINT AS c
       FROM toks t JOIN topd USING (doc_id) GROUP BY 1),
qtot AS (SELECT sum(c)::DOUBLE AS t FROM qt),
ctot AS (SELECT count(*)::DOUBLE AS t FROM toks),
cf AS (SELECT t.term, count(*)::BIGINT AS cf
       FROM toks t JOIN (SELECT DISTINCT term FROM qt) v
            USING (term)
       GROUP BY 1)
SELECT round(sum((qt.c / qtot.t)
                 * ln((qt.c / qtot.t) / (cf.cf / ctot.t))), 6)
           AS clarity,
       count(*)::BIGINT AS n_terms,
       (SELECT count(*) FROM topd)::BIGINT AS n_docs
FROM qt JOIN cf USING (term) CROSS JOIN qtot CROSS JOIN ctot""",
        "bm25_champions": _TOKS + f""",
p0 AS (SELECT term, doc_id, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks GROUP BY 1),
s AS (SELECT count(*)::DOUBLE AS n, sum(dl)::DOUBLE / count(*) AS avgdl
      FROM dl),
q(term, qtf) AS (VALUES {BM25_QUERY_SQL_TERMS}),
d AS (SELECT term, count(*)::DOUBLE AS df FROM p0 GROUP BY 1),
p AS (SELECT * FROM p0 QUALIFY
        row_number() OVER (PARTITION BY term
                           ORDER BY tf DESC, doc_id) <= {CHAMP_M}),
scores AS (
  SELECT p.doc_id,
         sum(q.qtf * ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5)) *
             (p.tf * (1.2 + 1)) /
             (p.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl))) AS raw
  FROM p JOIN q USING (term) JOIN d USING (term)
       JOIN dl ON p.doc_id = dl.doc_id CROSS JOIN s
  GROUP BY p.doc_id)
SELECT doc_id, round(raw, 6) AS score FROM scores
ORDER BY raw DESC, doc_id LIMIT 20""",
        "wildcard_terms": _TOKS + f"""
SELECT term, count(DISTINCT doc_id)::BIGINT AS df
FROM toks WHERE term LIKE '{WILDCARD_LIKE}' GROUP BY term
ORDER BY df DESC, term LIMIT {SUGGEST_K}""",
        # query-log replay: one multi-query scores CTE, top-k per query
        "batch_bm25_topk": _TOKS + f""",
p AS (SELECT term, doc_id, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks GROUP BY 1),
s AS (SELECT count(*)::DOUBLE AS n, sum(dl)::DOUBLE / count(*) AS avgdl
      FROM dl),
q(query_id, term, qtf) AS (VALUES {BATCH_QUERIES_SQL_TERMS}),
d AS (SELECT term, count(*)::DOUBLE AS df FROM p GROUP BY 1),
scores AS (
  SELECT q.query_id, p.doc_id,
         sum(q.qtf * ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5)) *
             (p.tf * (1.2 + 1)) /
             (p.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl))) AS raw
  FROM p JOIN q USING (term) JOIN d USING (term)
       JOIN dl ON p.doc_id = dl.doc_id CROSS JOIN s
  GROUP BY 1, 2)
SELECT query_id, doc_id, round(raw, 6) AS score FROM scores
QUALIFY row_number() OVER (PARTITION BY query_id
                           ORDER BY round(raw, 6) DESC, doc_id)
        <= {BATCH_K}""",
        # search-quality eval: MRR / nDCG@k of the BM25 top-k against
        # the conjunctive (all-terms) relevance set; ideal-DCG
        # constants injected so both engines divide identically
        "retrieval_metrics": _TOKS + f""",
p AS (SELECT term, doc_id, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks GROUP BY 1),
s AS (SELECT count(*)::DOUBLE AS n, sum(dl)::DOUBLE / count(*) AS avgdl
      FROM dl),
q(query_id, term, qtf) AS (VALUES {BATCH_QUERIES_SQL_TERMS}),
d AS (SELECT term, count(*)::DOUBLE AS df FROM p GROUP BY 1),
scores AS (
  SELECT q.query_id, p.doc_id,
         sum(q.qtf * ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5)) *
             (p.tf * (1.2 + 1)) /
             (p.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl))) AS raw
  FROM p JOIN q USING (term) JOIN d USING (term)
       JOIN dl ON p.doc_id = dl.doc_id CROSS JOIN s
  GROUP BY 1, 2),
top AS (SELECT query_id, doc_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY raw DESC, doc_id) AS rnk
        FROM scores QUALIFY rnk <= {BATCH_K}),
nt AS (SELECT query_id, count(*)::BIGINT AS n FROM q GROUP BY 1),
rel AS (SELECT q.query_id, p.doc_id
        FROM p JOIN q USING (term) JOIN nt ON nt.query_id = q.query_id
        GROUP BY q.query_id, p.doc_id, nt.n
        HAVING count(DISTINCT term) = nt.n),
rc AS (SELECT query_id, count(*)::BIGINT AS r FROM rel GROUP BY 1),
hits AS (SELECT t.query_id, t.rnk,
                CASE WHEN rel.doc_id IS NULL THEN 0 ELSE 1 END AS rel
         FROM top t LEFT JOIN rel ON rel.query_id = t.query_id
                                 AND rel.doc_id = t.doc_id),
agg AS (SELECT query_id,
               1.0 / min(rnk) FILTER (WHERE rel = 1) AS mrr,
               sum(1.0 / log2(rnk + 1)) FILTER (WHERE rel = 1) AS dcg
        FROM hits GROUP BY 1),
ideal(m, idcg) AS (VALUES {_idcg_values_sql(BATCH_K)})
SELECT nt.query_id,
       round(coalesce(agg.mrr, 0), 6) AS mrr,
       round(CASE WHEN i.idcg > 0
                  THEN coalesce(agg.dcg, 0) / i.idcg ELSE 0 END,
             6) AS ndcg
FROM nt LEFT JOIN agg USING (query_id)
     LEFT JOIN rc USING (query_id)
     JOIN ideal i ON i.m = least({BATCH_K}, coalesce(rc.r, 0))""",
        # unicode cleanup over the planted-accent corpus (see
        # _q_normalize_text); nfc_normalize/strip_accents parity with
        # unicodedata verified over composed/decomposed samples
        "normalize_text": r"""
SELECT doc_id,
       trim(regexp_replace(
            lower(strip_accents(nfc_normalize(
                'Café-' || CAST(doc_id AS VARCHAR) || '  RÉSUMÉ naïve'
                || chr(9) || text))),
            '\s+', ' ', 'g')) AS norm_text
FROM documents""",
        # BM25F: one shared saturation over field-weighted tf~ and dl~
        "bm25f_scores": f"""
WITH dd AS (SELECT doc_id,
        list_filter(regexp_split_to_array(lower(text), '\\s+'),
                    x -> x <> '') AS arr FROM documents),
ft AS (SELECT doc_id, arr[i] AS term,
              CASE WHEN i <= {BM25F_TITLE_LEN} THEN {BM25F_W_TITLE}
                   ELSE 1.0 END AS w
       FROM dd, unnest(range(1, len(arr) + 1)) AS t(i)),
p AS (SELECT doc_id, term, sum(w)::DOUBLE AS wtf FROM ft GROUP BY 1, 2),
dl AS (SELECT doc_id, sum(w)::DOUBLE AS wdl FROM ft GROUP BY 1),
s AS (SELECT count(*)::DOUBLE AS n, sum(wdl) / count(*) AS avgdl FROM dl),
q(term, qtf) AS (VALUES {BM25_QUERY_SQL_TERMS}),
d AS (SELECT term, count(*)::DOUBLE AS df FROM p GROUP BY 1),
scores AS (
  SELECT p.doc_id,
         sum(q.qtf * ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5)) *
             (p.wtf * (1.2 + 1)) /
             (p.wtf + 1.2 * (1 - 0.75 + 0.75 * dl.wdl / s.avgdl))) AS raw
  FROM p JOIN q USING (term) JOIN d USING (term)
       JOIN dl ON p.doc_id = dl.doc_id CROSS JOIN s
  GROUP BY p.doc_id)
SELECT doc_id, round(raw, 6) AS score FROM scores""",
        "quality_scores": _TOKS + """
SELECT doc_id, count(*)::BIGINT AS n_tokens,
       round(count(DISTINCT term)::DOUBLE / count(*), 6) AS uniq_ratio,
       round(sum(length(term))::DOUBLE / count(*), 6) AS mean_token_len,
       round(sum(CASE WHEN term IN ('the', 'a') THEN 1 ELSE 0 END)::DOUBLE
             / count(*), 6) AS stopword_ratio
FROM toks GROUP BY doc_id""",
        "zorder_key": """
SELECT event_id, user_id,
       ((((user_id >> 0) & 1) << 0) + (((event_id >> 0) & 1) << 1) + (((user_id >> 1) & 1) << 2) + (((event_id >> 1) & 1) << 3) + (((user_id >> 2) & 1) << 4) + (((event_id >> 2) & 1) << 5) + (((user_id >> 3) & 1) << 6) + (((event_id >> 3) & 1) << 7) + (((user_id >> 4) & 1) << 8) + (((event_id >> 4) & 1) << 9) + (((user_id >> 5) & 1) << 10) + (((event_id >> 5) & 1) << 11) + (((user_id >> 6) & 1) << 12) + (((event_id >> 6) & 1) << 13) + (((user_id >> 7) & 1) << 14) + (((event_id >> 7) & 1) << 15) + (((user_id >> 8) & 1) << 16) + (((event_id >> 8) & 1) << 17) + (((user_id >> 9) & 1) << 18) + (((event_id >> 9) & 1) << 19) + (((user_id >> 10) & 1) << 20) + (((event_id >> 10) & 1) << 21) + (((user_id >> 11) & 1) << 22) + (((event_id >> 11) & 1) << 23) + (((user_id >> 12) & 1) << 24) + (((event_id >> 12) & 1) << 25) + (((user_id >> 13) & 1) << 26) + (((event_id >> 13) & 1) << 27) + (((user_id >> 14) & 1) << 28) + (((event_id >> 14) & 1) << 29) + (((user_id >> 15) & 1) << 30) + (((event_id >> 15) & 1) << 31))::BIGINT AS zval
FROM events""",
        "warc_source_docs": """
SELECT doc_id, coalesce(text, '') AS text, lang, source
FROM documents""",
        "pushdown_scan": """
SELECT event_id, user_id, value FROM events
WHERE event_type = 'purchase' AND value >= 100.0""",
        "grouping_sets_counts": """
SELECT coalesce(lang, 'ALL') AS lang,
       coalesce(source, 'ALL') AS source,
       count(*)::BIGINT AS n_docs, sum(n_chars)::BIGINT AS sum_chars
FROM documents GROUP BY GROUPING SETS ((lang), (source))""",
        "ttl_dedup": """
SELECT user_id, event_type, ts, event_id FROM events
QUALIFY lag(ts) OVER (PARTITION BY user_id, event_type
                      ORDER BY ts, event_id) IS NULL
     OR ts - lag(ts) OVER (PARTITION BY user_id, event_type
                           ORDER BY ts, event_id)
        > INTERVAL 60 MINUTE""",
        "skew_report": """
WITH c AS (SELECT coalesce(event_type, chr(0) || 'NULL') AS k,
                  count(*)::BIGINT AS n
           FROM events GROUP BY 1),
s AS (SELECT count(*)::BIGINT AS n_keys, sum(n)::BIGINT AS n_rows,
             max(n)::BIGINT AS max_count,
             round(quantile_cont(n, 0.5), 6) AS p50,
             round(quantile_cont(n, 0.99), 6) AS p99
      FROM c),
t AS (SELECT k AS top_key FROM c ORDER BY n DESC, k LIMIT 1)
SELECT s.n_keys, s.n_rows, s.max_count, s.p50, s.p99, t.top_key,
       round(s.max_count::DOUBLE / (s.n_rows::DOUBLE / s.n_keys), 6)
         AS skew_ratio
FROM s CROSS JOIN t""",
        "lineitem_corr": """
SELECT l_returnflag,
       round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price
FROM lineitem GROUP BY l_returnflag""",
        # sum-form OLS (NOT regr_slope) so both engines share one
        # float contract; see group_ols docstring for the 4dp pin
        "group_ols": """
WITH s AS (SELECT l_returnflag,
             count(*)::DOUBLE AS n,
             sum(l_quantity) AS sx, sum(l_extendedprice) AS sy,
             sum(l_quantity * l_quantity) AS sxx,
             sum(l_quantity * l_extendedprice) AS sxy
           FROM lineitem GROUP BY 1)
SELECT l_returnflag, n::BIGINT AS n,
       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 4) AS slope,
       round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx)
             / n, 4) AS intercept
FROM s""",
        "significant_terms": _TOKS + """,
dt AS (SELECT DISTINCT term, doc_id FROM toks),
d AS (SELECT term, count(*)::BIGINT AS df_all FROM dt GROUP BY 1),
f AS (SELECT term, count(*)::BIGINT AS df_fg
      FROM dt JOIN documents USING (doc_id)
      WHERE lang = 'en' GROUP BY 1),
nn AS (SELECT count(*)::DOUBLE AS n_all,
              sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::DOUBLE
                AS n_fg
       FROM documents WHERE text IS NOT NULL)
SELECT d.term, f.df_fg, d.df_all,
       round((f.df_fg / nn.n_fg - d.df_all / nn.n_all)
             * ((f.df_fg / nn.n_fg) / (d.df_all / nn.n_all)), 6)
         AS score
FROM d JOIN f USING (term) CROSS JOIN nn""",
        # Dunning LLR with the zero-cell convention 0*ln(0/e) = 0
        "llr_bigrams": """
WITH arr AS (SELECT doc_id,
    list_filter(regexp_split_to_array(lower(text), '\\s+'),
                x -> x <> '') AS a FROM documents),
bg AS (SELECT a[i] AS w1, a[i+1] AS w2
       FROM arr, unnest(range(1, len(a))) AS t(i)),
cb AS (SELECT w1, w2, count(*)::BIGINT AS n FROM bg GROUP BY 1, 2),
r AS (SELECT w1, sum(n)::DOUBLE AS r1 FROM cb GROUP BY 1),
c AS (SELECT w2, sum(n)::DOUBLE AS c1 FROM cb GROUP BY 1),
nt AS (SELECT sum(n)::DOUBLE AS nn FROM cb),
k AS (SELECT cb.w1, cb.w2, cb.n, n::DOUBLE AS k11,
             r.r1 - n AS k12, c.c1 - n AS k21,
             nt.nn - r.r1 - c.c1 + n AS k22, r.r1, c.c1, nt.nn
      FROM cb JOIN r USING (w1) JOIN c USING (w2) CROSS JOIN nt
      WHERE cb.n >= 5),
sc AS (SELECT w1 || ' ' || w2 AS bigram, n,
         round(2 * (
           (CASE WHEN k11 > 0
                 THEN k11 * ln(k11 / (r1 * c1 / nn)) ELSE 0 END)
         + (CASE WHEN k12 > 0
                 THEN k12 * ln(k12 / (r1 * (nn - c1) / nn)) ELSE 0 END)
         + (CASE WHEN k21 > 0
                 THEN k21 * ln(k21 / ((nn - r1) * c1 / nn)) ELSE 0 END)
         + (CASE WHEN k22 > 0
                 THEN k22 * ln(k22 / ((nn - r1) * (nn - c1) / nn))
                 ELSE 0 END)), 6) AS llr
       FROM k)
SELECT bigram, n, llr FROM sc ORDER BY llr DESC, bigram LIMIT 50""",
        "market_basket": """
WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
p AS (SELECT x.l_partkey AS pa, y.l_partkey AS pb,
             count(*)::BIGINT AS n_pair
      FROM b x JOIN b y ON x.l_orderkey = y.l_orderkey
                       AND x.l_partkey < y.l_partkey
      GROUP BY 1, 2),
m AS (SELECT l_partkey, count(*)::BIGINT AS nm FROM b GROUP BY 1),
t AS (SELECT count(DISTINCT l_orderkey)::DOUBLE AS nb FROM lineitem)
SELECT pa AS part_a, pb AS part_b, n_pair,
       ma.nm AS n_a, mb.nm AS n_b,
       round(n_pair * t.nb / (ma.nm * mb.nm), 6) AS lift
FROM p JOIN m ma ON pa = ma.l_partkey
       JOIN m mb ON pb = mb.l_partkey CROSS JOIN t
WHERE n_pair >= 2""",
        "trending_event_types": """
WITH mx AS (SELECT max(ts) AS m FROM events),
c AS (SELECT event_type,
        sum(CASE WHEN ts > m - INTERVAL 7 DAY
                 THEN 1 ELSE 0 END)::BIGINT AS n_cur,
        sum(CASE WHEN ts <= m - INTERVAL 7 DAY
                  AND ts > m - INTERVAL 14 DAY
                 THEN 1 ELSE 0 END)::BIGINT AS n_prev
      FROM events CROSS JOIN mx GROUP BY 1)
SELECT event_type, n_cur, n_prev,
       round((n_cur + 1.0) / (n_prev + 1.0), 6) AS lift FROM c""",
        # same sum-form sufficient statistics as the Ray side
        "ab_test_welch": """
WITH s AS (SELECT event_type AS g, count(*)::DOUBLE AS n,
                  sum(value) AS sx, sum(value * value) AS sxx
           FROM events WHERE event_type IN ('click', 'purchase')
           GROUP BY 1),
st AS (SELECT g, n, sx / n AS m,
              (sxx - sx * sx / n) / (n - 1.0) AS s2 FROM s),
a AS (SELECT * FROM st WHERE g = 'click'),
b AS (SELECT * FROM st WHERE g = 'purchase')
SELECT 'click' AS group_a, 'purchase' AS group_b,
       a.n::BIGINT AS n_a, b.n::BIGINT AS n_b,
       round(a.m, 6) AS mean_a, round(b.m, 6) AS mean_b,
       round((a.m - b.m) / sqrt(a.s2 / a.n + b.s2 / b.n), 6) AS t_stat,
       round(pow(a.s2 / a.n + b.s2 / b.n, 2)
             / (pow(a.s2 / a.n, 2) / (a.n - 1.0)
                + pow(b.s2 / b.n, 2) / (b.n - 1.0)), 6) AS df
FROM a CROSS JOIN b""",
        # greedy MMR unrolled to k=5 steps (each step = one argmax CTE
        # over the pool, penalty via correlated max over the selected
        # set); constants written as (1.0 - 0.7) so both engines fold
        # the identical double
        "mmr_rerank": """
WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe
           FROM embeddings WHERE vec_id = {qid}),
cand AS (SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS ve,
                list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                       q.qe) AS rel
         FROM embeddings e, q WHERE e.vec_id <> {qid}
         QUALIFY row_number() OVER (ORDER BY rel DESC, e.vec_id)
                 <= 20),
p1 AS (SELECT vec_id, ve, rel, rel AS mmr FROM cand
       ORDER BY rel DESC, vec_id LIMIT 1),
s1 AS (SELECT vec_id, ve FROM p1),
p2 AS (SELECT c.vec_id, c.ve, c.rel,
              0.7 * c.rel - (1.0 - 0.7) *
                (SELECT max(list_cosine_similarity(c.ve, s.ve))
                 FROM s1 s) AS mmr
       FROM cand c WHERE c.vec_id NOT IN (SELECT vec_id FROM s1)
       ORDER BY mmr DESC, c.vec_id LIMIT 1),
s2 AS (SELECT vec_id, ve FROM s1
       UNION ALL SELECT vec_id, ve FROM p2),
p3 AS (SELECT c.vec_id, c.ve, c.rel,
              0.7 * c.rel - (1.0 - 0.7) *
                (SELECT max(list_cosine_similarity(c.ve, s.ve))
                 FROM s2 s) AS mmr
       FROM cand c WHERE c.vec_id NOT IN (SELECT vec_id FROM s2)
       ORDER BY mmr DESC, c.vec_id LIMIT 1),
s3 AS (SELECT vec_id, ve FROM s2
       UNION ALL SELECT vec_id, ve FROM p3),
p4 AS (SELECT c.vec_id, c.ve, c.rel,
              0.7 * c.rel - (1.0 - 0.7) *
                (SELECT max(list_cosine_similarity(c.ve, s.ve))
                 FROM s3 s) AS mmr
       FROM cand c WHERE c.vec_id NOT IN (SELECT vec_id FROM s3)
       ORDER BY mmr DESC, c.vec_id LIMIT 1),
s4 AS (SELECT vec_id, ve FROM s3
       UNION ALL SELECT vec_id, ve FROM p4),
p5 AS (SELECT c.vec_id, c.ve, c.rel,
              0.7 * c.rel - (1.0 - 0.7) *
                (SELECT max(list_cosine_similarity(c.ve, s.ve))
                 FROM s4 s) AS mmr
       FROM cand c WHERE c.vec_id NOT IN (SELECT vec_id FROM s4)
       ORDER BY mmr DESC, c.vec_id LIMIT 1)
SELECT 0::BIGINT AS rank, vec_id AS neighbor_id,
       round(rel, 6) AS rel, round(mmr, 6) AS mmr FROM p1
UNION ALL SELECT 1, vec_id, round(rel, 6), round(mmr, 6) FROM p2
UNION ALL SELECT 2, vec_id, round(rel, 6), round(mmr, 6) FROM p3
UNION ALL SELECT 3, vec_id, round(rel, 6), round(mmr, 6) FROM p4
UNION ALL SELECT 4, vec_id, round(rel, 6), round(mmr, 6) FROM p5""".format(
            qid=KNN_QUERY_IDS[0]
        ),
        "percolate": _percolate_sql(),
        "shipping_priority": """
SELECT o.o_orderkey, o.o_orderdate,
       round(sum(l.l_extendedprice * (1.0 - l.l_discount)), 2)
         AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1995-03-15'
  AND l.l_shipdate > TIMESTAMP '1995-03-15'
GROUP BY 1, 2
ORDER BY sum(l.l_extendedprice * (1.0 - l.l_discount)) DESC,
         o.o_orderdate, o.o_orderkey
LIMIT 10""",
        "winsorized_mean": """
WITH b AS (SELECT event_type,
             quantile_cont(value, 0.05) AS q_lo,
             quantile_cont(value, 0.95) AS q_hi
           FROM events GROUP BY 1)
SELECT e.event_type, count(*)::BIGINT AS n,
       round(b.q_lo, 6) AS q_lo, round(b.q_hi, 6) AS q_hi,
       round(sum(least(greatest(e.value, b.q_lo), b.q_hi))
             / count(*), 6) AS wins_mean
FROM events e JOIN b USING (event_type)
GROUP BY 1, b.q_lo, b.q_hi""",
        # ring points at md5('ring:<shard>:<vnode>'); a key belongs to
        # the first point >= its hash, wrapping to the ring minimum
        "consistent_hash_moves": """
WITH rb AS (SELECT s, md5_number_lower('ring:' || s || ':' || v) AS pt
            FROM (SELECT unnest(range(0, 8)) AS s),
                 (SELECT unnest(range(0, 32)) AS v)),
ra AS (SELECT s, md5_number_lower('ring:' || s || ':' || v) AS pt
       FROM (SELECT unnest(range(0, 9)) AS s),
            (SELECT unnest(range(0, 32)) AS v)),
k AS (SELECT doc_id, md5_number_lower('key:' || doc_id) AS h
      FROM documents),
asg AS (SELECT doc_id,
          coalesce((SELECT s FROM rb WHERE pt >= h
                    ORDER BY pt, s LIMIT 1),
                   (SELECT s FROM rb ORDER BY pt, s LIMIT 1))
            AS shard_before,
          coalesce((SELECT s FROM ra WHERE pt >= h
                    ORDER BY pt, s LIMIT 1),
                   (SELECT s FROM ra ORDER BY pt, s LIMIT 1))
            AS shard_after
        FROM k)
SELECT shard_before::BIGINT AS shard_before,
       shard_after::BIGINT AS shard_after,
       count(*)::BIGINT AS n_keys
FROM asg GROUP BY 1, 2""",
        # chunk -> feature-hash -> cosine composition; integer dots,
        # rank on the raw double, round after
        "rag_chunk_search": """
WITH arr AS (SELECT doc_id,
    list_filter(regexp_split_to_array(lower(text), '\\s+'),
                x -> x <> '') AS a
  FROM documents WHERE text IS NOT NULL),
n AS (SELECT doc_id, len(a) AS n FROM arr WHERE len(a) > 0),
nc AS (SELECT doc_id,
         greatest(1, (greatest(n - 2, 1) + 5) // 6)::BIGINT AS kk
       FROM n),
ch AS (SELECT doc_id, unnest(range(0, kk)) AS chunk_id FROM nc),
tok AS (SELECT doc_id, i - 1 AS p, a[i] AS term
        FROM arr, unnest(range(1, len(a) + 1)) AS t(i)),
ct AS (SELECT c.doc_id, c.chunk_id, t.term
       FROM ch c JOIN tok t ON t.doc_id = c.doc_id
            AND t.p >= c.chunk_id * 6 AND t.p < c.chunk_id * 6 + 8),
tc AS (SELECT doc_id, chunk_id, term, count(*)::BIGINT AS tf
       FROM ct GROUP BY 1, 2, 3),
hb AS (SELECT doc_id, chunk_id, tf,
              md5_number_lower('fh:' || term) AS h FROM tc),
cv AS (SELECT doc_id, chunk_id, (h % 64)::BIGINT AS dim,
              sum(CASE WHEN (h // 64) % 2 = 1 THEN tf
                       ELSE -tf END)::BIGINT AS value
       FROM hb GROUP BY 1, 2, 3),
cvz AS (SELECT * FROM cv WHERE value <> 0),
qtc AS (SELECT term, count(*)::BIGINT AS tf FROM tok
        WHERE doc_id = 0 GROUP BY 1),
qhb AS (SELECT tf, md5_number_lower('fh:' || term) AS h FROM qtc),
qv AS (SELECT (h % 64)::BIGINT AS dim,
              sum(CASE WHEN (h // 64) % 2 = 1 THEN tf
                       ELSE -tf END)::BIGINT AS value
       FROM qhb GROUP BY 1 HAVING sum(CASE WHEN (h // 64) % 2 = 1
                                          THEN tf ELSE -tf END) <> 0),
qq AS (SELECT sqrt(sum(value * value)) AS q FROM qv),
dots AS (SELECT c.doc_id, c.chunk_id,
                sum(c.value * q.value)::BIGINT AS dot
         FROM cvz c JOIN qv q USING (dim) GROUP BY 1, 2),
norms AS (SELECT doc_id, chunk_id,
                 sum(value * value)::BIGINT AS cc
          FROM cvz GROUP BY 1, 2),
sc AS (SELECT nm.doc_id, nm.chunk_id,
              coalesce(d.dot, 0) / (qq.q * sqrt(nm.cc)) AS raw
       FROM norms nm LEFT JOIN dots d USING (doc_id, chunk_id)
            CROSS JOIN qq
       WHERE nm.doc_id <> 0)
SELECT doc_id, chunk_id, round(raw, 6) AS cos FROM sc
QUALIFY row_number() OVER (ORDER BY raw DESC, doc_id, chunk_id)
        <= 10""",
        # 3 unrolled x_k = A^T(A x_{k-1}) steps, normalize at the end
        "lsa_power_iteration": _TOKS + """,
tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf
       FROM toks GROUP BY 1, 2),
df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
nn AS (SELECT count(*)::DOUBLE AS n FROM documents
       WHERE text IS NOT NULL),
w AS (SELECT doc_id, tf.term, tf * ln(1 + nn.n / df.df) AS w
      FROM tf JOIN df USING (term) CROSS JOIN nn),
y1 AS (SELECT doc_id, sum(w * 1.0) AS y FROM w GROUP BY 1),
x1 AS (SELECT term, sum(w.w * y1.y) AS x
       FROM w JOIN y1 USING (doc_id) GROUP BY 1),
y2 AS (SELECT doc_id, sum(w.w * x1.x) AS y
       FROM w JOIN x1 USING (term) GROUP BY 1),
x2 AS (SELECT term, sum(w.w * y2.y) AS x
       FROM w JOIN y2 USING (doc_id) GROUP BY 1),
y3 AS (SELECT doc_id, sum(w.w * x2.x) AS y
       FROM w JOIN x2 USING (term) GROUP BY 1),
x3 AS (SELECT term, sum(w.w * y3.y) AS x
       FROM w JOIN y3 USING (doc_id) GROUP BY 1),
nrm AS (SELECT sqrt(sum(x * x)) AS s FROM x3)
SELECT term, round(x / nrm.s, 6) AS loading
FROM x3 CROSS JOIN nrm""",
        "scd2_intervals": """
WITH o AS (SELECT user_id, event_type, ts, event_id,
             CASE WHEN lag(event_type) OVER w
                       IS DISTINCT FROM event_type
                  THEN 1 ELSE 0 END AS chg
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
r AS (SELECT *, sum(chg) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS run
      FROM o),
g AS (SELECT user_id, event_type, run, min(ts) AS valid_from,
             count(*)::BIGINT AS n_events
      FROM r GROUP BY 1, 2, 3)
SELECT user_id, event_type, valid_from,
       lead(valid_from) OVER (PARTITION BY user_id
                              ORDER BY valid_from) AS valid_to,
       n_events
FROM g""",
        # population moments spelled as the same power-sum formula
        # (DuckDB's skewness()/kurtosis() are sample-corrected)
        "group_moments": """
WITH s AS (SELECT event_type, count(*)::DOUBLE AS n,
             sum(value) AS s1, sum(value * value) AS s2,
             sum(value * value * value) AS s3,
             sum(value * value * value * value) AS s4
           FROM events GROUP BY 1),
m AS (SELECT event_type, n, s1 / n AS m1,
        s2 / n - (s1 / n) * (s1 / n) AS m2,
        s3 / n - 3.0 * (s1 / n) * (s2 / n)
          + 2.0 * (s1 / n) * (s1 / n) * (s1 / n) AS m3,
        s4 / n - 4.0 * (s1 / n) * (s3 / n)
          + 6.0 * (s1 / n) * (s1 / n) * (s2 / n)
          - 3.0 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n) AS m4
      FROM s)
SELECT event_type, n::BIGINT AS n, round(m1, 6) AS mean,
       round(m3 / pow(m2, 1.5), 6) AS skewness,
       round(m4 / (m2 * m2) - 3.0, 6) AS kurtosis
FROM m""",
        "hill_tail_index": _TOKS + """,
tc AS (SELECT term, count(*)::DOUBLE AS n FROM toks GROUP BY 1),
o AS (SELECT n, row_number() OVER (ORDER BY n DESC, term) AS r
      FROM tc),
ref AS (SELECT n AS nk FROM o WHERE r = 21),
h AS (SELECT sum(ln(o.n / ref.nk)) / 20.0 AS hill
      FROM o CROSS JOIN ref WHERE r <= 20)
SELECT 20::BIGINT AS k, round(hill, 6) AS hill,
       round(1.0 / hill, 6) AS alpha FROM h""",
        # the IPC shards were derived from documents, so the parquet
        # view recomputes the same aggregate
        "arrow_ipc_counts": """
SELECT lang, source, sum(n_chars)::BIGINT AS sum_chars,
       count(*)::BIGINT AS n_docs
FROM documents GROUP BY 1, 2""",
        # decode->frame-diff must reproduce the pre-encode goldens
        "video_scene_cuts": """
SELECT media_id, frame_idx, diff, is_cut
FROM read_parquet('{golden}')""".format(
            golden=os.path.join(SCENE_DIR, "golden_cuts.parquet")
        ),
        # decode->spectrogram must reproduce the pre-encode goldens
        "audio_spectrogram": """
SELECT media_id, frame_idx, band, mag
FROM read_parquet('{golden}')""".format(
            golden=os.path.join(SPEC_DIR, "golden_spec.parquet")
        ),
        # 3 unrolled TextRank iterations over the undirected window-1
        # co-occurrence graph; rank on the ROUNDED score (pmi cut)
        "textrank_keywords": """
WITH arr AS (SELECT doc_id,
    list_filter(regexp_split_to_array(lower(text), '\\s+'),
                x -> x <> '') AS a FROM documents),
bgp AS (SELECT a[i] AS x, a[i+1] AS y
        FROM arr, unnest(range(1, len(a))) AS t(i)
        WHERE a[i] <> a[i+1]),
e AS (SELECT least(x, y) AS u, greatest(x, y) AS v,
             count(*)::DOUBLE AS w FROM bgp GROUP BY 1, 2),
ed AS (SELECT u AS src, v AS dst, w FROM e
       UNION ALL SELECT v, u, w FROM e),
ow AS (SELECT src AS t, sum(w) AS ow FROM ed GROUP BY 1),
n AS (SELECT count(*)::DOUBLE AS n FROM ow),
r0 AS (SELECT t, 1.0 / n.n AS r FROM ow CROSS JOIN n),
f1 AS (SELECT ed.dst AS t, sum(ed.w / ow.ow * r0.r) AS fl
       FROM ed JOIN ow ON ed.src = ow.t JOIN r0 ON ed.src = r0.t
       GROUP BY 1),
r1 AS (SELECT ow.t, (1.0 - 0.85) / n.n
                    + 0.85 * coalesce(f1.fl, 0) AS r
       FROM ow LEFT JOIN f1 USING (t) CROSS JOIN n),
f2 AS (SELECT ed.dst AS t, sum(ed.w / ow.ow * r1.r) AS fl
       FROM ed JOIN ow ON ed.src = ow.t JOIN r1 ON ed.src = r1.t
       GROUP BY 1),
r2 AS (SELECT ow.t, (1.0 - 0.85) / n.n
                    + 0.85 * coalesce(f2.fl, 0) AS r
       FROM ow LEFT JOIN f2 USING (t) CROSS JOIN n),
f3 AS (SELECT ed.dst AS t, sum(ed.w / ow.ow * r2.r) AS fl
       FROM ed JOIN ow ON ed.src = ow.t JOIN r2 ON ed.src = r2.t
       GROUP BY 1),
r3 AS (SELECT ow.t, (1.0 - 0.85) / n.n
                    + 0.85 * coalesce(f3.fl, 0) AS r
       FROM ow LEFT JOIN f3 USING (t) CROSS JOIN n),
rr AS (SELECT t AS term, round(r, 6) AS score FROM r3)
SELECT term, score FROM rr ORDER BY score DESC, term LIMIT 20""",
        # anti-join orphan audit == NOT EXISTS (null FKs orphan on
        # both engines: a null key matches nothing)
        "fk_violations": """
SELECT 'lineitem.l_orderkey -> orders' AS relationship,
       (SELECT count(*) FROM lineitem)::BIGINT AS n_rows,
       (SELECT count(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_orderkey = l.l_orderkey))::BIGINT
         AS n_orphans
UNION ALL
SELECT 'orders.o_custkey -> customer',
       (SELECT count(*) FROM orders)::BIGINT,
       (SELECT count(*) FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c
                          WHERE c.c_custkey = o.o_custkey))::BIGINT""",
        "conversion_latency": """
WITH s AS (SELECT user_id, min(ts) AS t0 FROM events
           WHERE event_type = 'signup' GROUP BY 1),
p AS (SELECT e.user_id, min(e.ts) AS t1
      FROM events e JOIN s USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts >= s.t0 GROUP BY 1),
l AS (SELECT (epoch_us(t1) - epoch_us(s.t0)) / 1000000.0 AS lat
      FROM p JOIN s USING (user_id))
SELECT count(*)::BIGINT AS n_converted,
       round(quantile_cont(lat, 0.5), 6) AS q50_s,
       round(quantile_cont(lat, 0.9), 6) AS q90_s
FROM l""",
        "user_growth_curve": """
WITH f AS (SELECT user_id, min(ts) AS t FROM events GROUP BY 1),
d AS (SELECT strftime(t, '%Y-%m-%d') AS day,
             count(*)::BIGINT AS new_users FROM f GROUP BY 1)
SELECT day, new_users,
       sum(new_users) OVER (ORDER BY day
                            ROWS UNBOUNDED PRECEDING)::BIGINT
         AS cum_users
FROM d""",
        # RAKE: stopword-delimited phrases, word score = degree/freq
        "rake_phrases": """
WITH arr AS (SELECT doc_id,
    list_filter(regexp_split_to_array(lower(text), '\\s+'),
                x -> x <> '') AS a FROM documents),
tok AS (SELECT doc_id, i AS p, a[i] AS term
        FROM arr, unnest(range(1, len(a) + 1)) AS t(i)),
fl AS (SELECT doc_id, p, term,
         CASE WHEN term IN ('the', 'a') THEN 1 ELSE 0 END AS stop
       FROM tok),
ph AS (SELECT doc_id, p, term, stop,
         sum(stop) OVER (PARTITION BY doc_id ORDER BY p
                         ROWS UNBOUNDED PRECEDING) AS pid
       FROM fl),
pw AS (SELECT doc_id, pid, p, term FROM ph WHERE stop = 0),
plen AS (SELECT doc_id, pid, count(*)::BIGINT AS L
         FROM pw GROUP BY 1, 2),
wstat AS (SELECT term, count(*)::DOUBLE AS f, sum(L)::DOUBLE AS d
          FROM pw JOIN plen USING (doc_id, pid) GROUP BY 1),
pscore AS (SELECT pw.doc_id, pw.pid,
             string_agg(pw.term, ' ' ORDER BY pw.p) AS phrase,
             sum(w.d / w.f) AS raw
           FROM pw JOIN wstat w ON pw.term = w.term GROUP BY 1, 2),
dd AS (SELECT phrase, round(raw, 6) AS score,
         row_number() OVER (PARTITION BY phrase
                            ORDER BY phrase) AS rn
       FROM pscore)
SELECT phrase, score FROM dd WHERE rn = 1
ORDER BY score DESC, phrase LIMIT 15""",
        "time_rollup_counts": """
WITH b AS (SELECT strftime(ts, '%Y-%m') AS month,
                  strftime(ts, '%Y-%m-%d') AS day, value
           FROM events),
r AS (SELECT coalesce(month, 'ALL') AS month,
             CASE WHEN grouping(day) = 1 THEN 'ALL' ELSE day END
               AS day,
             count(*)::BIGINT AS n_events,
             round(sum(value), 2) AS sum_value
      FROM b GROUP BY ROLLUP (month, day))
SELECT CASE WHEN month IS NULL THEN 'ALL' ELSE month END AS month,
       day, n_events, sum_value
FROM r""",
        "benford_prices": """
WITH v AS (SELECT floor(o_totalprice)::BIGINT AS ip FROM orders
           WHERE o_totalprice >= 1),
d AS (SELECT CAST(substr(CAST(ip AS VARCHAR), 1, 1) AS BIGINT)
        AS digit FROM v),
c AS (SELECT digit, count(*)::BIGINT AS n FROM d GROUP BY 1),
t AS (SELECT sum(n)::DOUBLE AS nt FROM c)
SELECT c.digit, c.n, round(c.n / t.nt, 6) AS frac,
       round(log10(1.0 + 1.0 / c.digit), 6) AS benford
FROM c CROSS JOIN t""",
        # three vectorized RE2 counts; the vowel-group syllable
        # estimator and max(1, sentence runs) are part of the contract
        "readability_scores": """
WITH c AS (SELECT doc_id,
    len(regexp_extract_all(text, '[A-Za-z]+'))::DOUBLE AS w,
    len(regexp_extract_all(text, '[aeiouyAEIOUY]+'))::DOUBLE AS s,
    greatest(len(regexp_extract_all(text, '[.!?]+')), 1)::DOUBLE
      AS sent
  FROM documents)
SELECT doc_id, w::BIGINT AS n_words, s::BIGINT AS n_syllables,
       sent::BIGINT AS n_sentences,
       CASE WHEN w > 0
            THEN round(206.835 - 1.015*(w/sent) - 84.6*(s/w), 4)
            ELSE 0.0 END AS flesch
FROM c""",
        "source_lang_entropy": """
WITH c AS (SELECT source, lang, count(*)::BIGINT AS n
           FROM documents GROUP BY 1, 2),
t AS (SELECT source, sum(n)::BIGINT AS n_docs,
             count(*)::BIGINT AS n_langs FROM c GROUP BY 1),
e AS (SELECT c.source,
             sum(-(c.n::DOUBLE / t.n_docs)
                 * log2(c.n::DOUBLE / t.n_docs)) AS ent
      FROM c JOIN t USING (source) GROUP BY 1),
top AS (SELECT source, lang AS top_lang FROM c
        QUALIFY row_number() OVER (PARTITION BY source
                                   ORDER BY n DESC, lang) = 1)
SELECT t.source, t.n_docs, t.n_langs, top.top_lang,
       round(e.ent, 6) AS entropy
FROM t JOIN e USING (source) JOIN top USING (source)""",
        # |cusum| rounded to 6 BEFORE the argmax; remaining ties
        # break day-asc — both engines cut identically
        "cusum_drift": """
WITH d AS (SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
                  count(*)::BIGINT AS n
           FROM events GROUP BY 1, 2),
m AS (SELECT event_type, avg(n::DOUBLE) AS mu,
             count(*)::BIGINT AS n_days FROM d GROUP BY 1),
c AS (SELECT d.event_type, d.day,
             round(abs(sum(d.n - m.mu) OVER (
                 PARTITION BY d.event_type ORDER BY d.day)), 6)
               AS a
      FROM d JOIN m USING (event_type))
SELECT c.event_type, m.n_days, c.a AS max_abs_cusum,
       c.day AS peak_day
FROM c JOIN m USING (event_type)
QUALIFY row_number() OVER (PARTITION BY c.event_type
                           ORDER BY c.a DESC, c.day) = 1""",
        # regex_token_counts' two counters aggregated per lang
        "tokenizer_fertility": """
WITH c AS (SELECT lang,
    (CASE WHEN trim(text) = '' THEN 0
          ELSE len(regexp_split_to_array(trim(text), '\\s+'))
     END)::BIGINT AS w,
    len(regexp_extract_all(text, '{pat}'))::BIGINT AS b
  FROM documents)
SELECT lang, count(*)::BIGINT AS n_docs,
       sum(w)::BIGINT AS n_ws_tokens,
       sum(b)::BIGINT AS n_bpe_tokens,
       CASE WHEN sum(w) > 0
            THEN round(sum(b)::DOUBLE / sum(w), 6)
            ELSE 0.0 END AS fertility
FROM c GROUP BY 1""".format(
            pat=__import__("rse_ray.pipelines.text",
                           fromlist=["BPE_PATTERN"])
            .BPE_PATTERN.replace("'", "''")),
        # distinct whitespace trigrams per source, pair counts via
        # self-join on the shingle (diagonal = own distinct count)
        "source_overlap_matrix": """
WITH arr AS (SELECT source, doc_id,
    list_filter(regexp_split_to_array(lower(text), '\\s+'),
                x -> x <> '') AS a
  FROM documents WHERE text IS NOT NULL),
g AS (SELECT DISTINCT source,
             a[i] || ' ' || a[i+1] || ' ' || a[i+2] AS sh
      FROM arr, unnest(range(1, len(a) - 1)) AS t(i))
SELECT g1.source AS source_a, g2.source AS source_b,
       count(*)::BIGINT AS n_shared
FROM g g1 JOIN g g2 ON g1.sh = g2.sh
GROUP BY 1, 2""",
        # Q8 shape: ASIA-region customers, PROMO parts, share from
        # NATION_5 suppliers; share computed on the raw sums
        "market_share": """
SELECT year(o.o_orderdate)::BIGINT AS o_year,
       round(sum(CASE WHEN sn.n_name = 'NATION_5'
                      THEN l.l_extendedprice * (1.0 - l.l_discount)
                      ELSE 0 END), 2) AS nation_revenue,
       round(sum(l.l_extendedprice * (1.0 - l.l_discount)), 2)
         AS total_revenue,
       round(sum(CASE WHEN sn.n_name = 'NATION_5'
                      THEN l.l_extendedprice * (1.0 - l.l_discount)
                      ELSE 0 END)
             / sum(l.l_extendedprice * (1.0 - l.l_discount)), 6)
         AS mkt_share
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation cn ON cn.n_nationkey = c.c_nationkey
JOIN region r ON r.r_regionkey = cn.n_regionkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation sn ON sn.n_nationkey = s.s_nationkey
JOIN part p ON p.p_partkey = l.l_partkey
WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
  AND o.o_orderdate >= TIMESTAMP '1995-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY 1""",
        # Q9 shape adapted: unit cost = 0.6 * p_retailprice (no
        # partsupp table in this corpus)
        # static pruning: per query term keep ceil(50% x df) postings
        # (tf desc, doc_id asc), score with FULL stats
        "bm25_pruned": _TOKS + f""",
p AS (SELECT term, doc_id, count(*)::BIGINT AS tf
      FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks GROUP BY 1),
s AS (SELECT count(*)::DOUBLE AS n,
             sum(dl)::DOUBLE / count(*) AS avgdl FROM dl),
q(term, qtf) AS (VALUES {BM25_QUERY_SQL_TERMS}),
d AS (SELECT term, count(*)::BIGINT AS df FROM p GROUP BY 1),
pruned AS (SELECT p.term, p.doc_id, p.tf
           FROM p JOIN q USING (term) JOIN d USING (term)
           QUALIFY row_number() OVER (PARTITION BY p.term
               ORDER BY p.tf DESC, p.doc_id)
               <= (d.df * 50 + 99) // 100),
scores AS (
  SELECT pr.doc_id,
         sum(q.qtf * ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5)) *
             (pr.tf * (1.2 + 1)) /
             (pr.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)))
             AS raw
  FROM pruned pr JOIN q USING (term) JOIN d USING (term)
       JOIN dl ON pr.doc_id = dl.doc_id CROSS JOIN s
  GROUP BY pr.doc_id)
SELECT doc_id, round(raw, 6) AS score FROM scores
ORDER BY raw DESC, doc_id LIMIT 20""",
        # per-user entropy of the consecutive-transition distribution
        "transition_entropy": """
WITH o AS (SELECT user_id, event_type AS ft,
                  lead(event_type) OVER (PARTITION BY user_id
                      ORDER BY ts, event_id) AS tt
           FROM events
           WHERE user_id IS NOT NULL AND ts IS NOT NULL),
tr AS (SELECT user_id, ft, tt, count(*)::BIGINT AS c
       FROM o WHERE tt IS NOT NULL GROUP BY 1, 2, 3),
ut AS (SELECT user_id, sum(c)::BIGINT AS n FROM tr GROUP BY 1)
SELECT tr.user_id, ut.n AS n_transitions,
       round(-sum((tr.c * 1.0 / ut.n)
                  * ln(tr.c * 1.0 / ut.n)), 6) AS entropy
FROM tr JOIN ut USING (user_id) GROUP BY 1, 2""",
        # token-bucket admission replay: per-key recursive CTE running
        # the engine's IDENTICAL float-op sequence (integer-us deltas
        # divided once, same min/compare/decrement order)
        "rate_limit_replay": f"""
WITH RECURSIVE o AS (
    SELECT user_id, epoch_us(ts)::BIGINT AS us,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS i
    FROM events),
tb AS (
    SELECT user_id, i, us, {RL_CAPACITY!r} - 1.0 AS tokens,
           1::BIGINT AS adm
    FROM o WHERE i = 1
    UNION ALL
    SELECT o.user_id, o.i, o.us,
           CASE WHEN least({RL_CAPACITY!r}, tb.tokens
                          + {RL_REFILL!r}
                            * ((o.us - tb.us) / 1000000.0)) >= 1.0
                THEN least({RL_CAPACITY!r}, tb.tokens
                           + {RL_REFILL!r}
                             * ((o.us - tb.us) / 1000000.0)) - 1.0
                ELSE least({RL_CAPACITY!r}, tb.tokens
                           + {RL_REFILL!r}
                             * ((o.us - tb.us) / 1000000.0)) END,
           tb.adm + CASE WHEN least({RL_CAPACITY!r}, tb.tokens
                                    + {RL_REFILL!r}
                                      * ((o.us - tb.us)
                                         / 1000000.0)) >= 1.0
                         THEN 1 ELSE 0 END
    FROM tb JOIN o ON o.user_id = tb.user_id AND o.i = tb.i + 1)
SELECT user_id, max(i)::BIGINT AS n_events,
       max(adm)::BIGINT AS n_admitted
FROM tb GROUP BY 1""",
        # Theil-Sen: median pairwise slope over exact daily counts
        "theil_sen_trend": """
WITH d AS (SELECT (CAST(date_trunc('day', ts) AS DATE)
                   - DATE '1970-01-01') AS day,
                  count(*)::BIGINT AS n
           FROM events WHERE ts IS NOT NULL GROUP BY 1),
sl AS (SELECT (b.n - a.n) * 1.0 / (b.day - a.day) AS s
       FROM d a JOIN d b ON b.day > a.day),
m AS (SELECT median(s) AS slope FROM sl),
ic AS (SELECT median(d.n - m.slope * d.day) AS intercept
       FROM d CROSS JOIN m)
SELECT (SELECT count(*) FROM d)::BIGINT AS n_days,
       round(m.slope, 6) AS slope,
       round(ic.intercept, 6) AS intercept
FROM m CROSS JOIN ic""",
        # KS two-sample: CDF gap over pooled distinct values in float
        # (identical IEEE expression both sides)
        "ks_test": """
WITH src AS (SELECT value,
                    (event_type = 'click')::BIGINT AS ia
             FROM events WHERE event_type IN ('click', 'view')
               AND value IS NOT NULL),
d AS (SELECT value, sum(ia)::BIGINT AS na,
             (count(*) - sum(ia))::BIGINT AS nb
      FROM src GROUP BY 1),
t AS (SELECT sum(na)::BIGINT AS ta, sum(nb)::BIGINT AS tb FROM d),
c AS (SELECT sum(na) OVER (ORDER BY value) AS ca,
             sum(nb) OVER (ORDER BY value) AS cb
      FROM d)
SELECT t.ta AS n_a, t.tb AS n_b,
       round(max(abs(c.ca / (t.ta * 1.0)
                     - c.cb / (t.tb * 1.0))), 6) AS d_stat,
       round(max(abs(c.ca / (t.ta * 1.0) - c.cb / (t.tb * 1.0)))
             * sqrt(t.ta * t.tb / (t.ta * 1.0 + t.tb)), 6) AS ks_z
FROM c CROSS JOIN t GROUP BY t.ta, t.tb""",
        # Spearman: Pearson over CENTERED average ranks (exact halves,
        # no big-minus-big cancellation)
        "spearman_corr": """
WITH src AS (SELECT l_quantity AS x, l_extendedprice AS y
             FROM lineitem
             WHERE l_quantity IS NOT NULL
               AND l_extendedprice IS NOT NULL),
nn AS (SELECT count(*)::BIGINT AS n FROM src),
xr AS (SELECT x, cum - cnt + (cnt + 1) / 2.0 AS r FROM (
    SELECT x, count(*)::BIGINT AS cnt,
           sum(count(*)) OVER (ORDER BY x) AS cum
    FROM src GROUP BY x)),
yr AS (SELECT y, cum - cnt + (cnt + 1) / 2.0 AS r FROM (
    SELECT y, count(*)::BIGINT AS cnt,
           sum(count(*)) OVER (ORDER BY y) AS cum
    FROM src GROUP BY y)),
j AS (SELECT xr.r - (nn.n + 1) / 2.0 AS crx,
             yr.r - (nn.n + 1) / 2.0 AS cry
      FROM src s JOIN xr ON xr.x = s.x JOIN yr ON yr.y = s.y
      CROSS JOIN nn)
SELECT nn.n, round(sum(crx * cry)
                   / sqrt(sum(crx * crx) * sum(cry * cry)), 6) AS rho
FROM j CROSS JOIN nn GROUP BY nn.n""",
        # Q21 shape: late = shipdate > orderdate + 60d (no
        # commit/receipt dates in this corpus)
        "waiting_suppliers": """
WITH lo AS (SELECT l.l_orderkey, l.l_suppkey,
                   max(CASE WHEN l.l_shipdate >
                                 o.o_orderdate + INTERVAL 60 DAY
                            THEN 1 ELSE 0 END) AS late
            FROM lineitem l
            JOIN orders o ON o.o_orderkey = l.l_orderkey
            WHERE o.o_orderstatus = 'F'
            GROUP BY 1, 2),
st AS (SELECT l_orderkey, count(*) AS nsupp, sum(late) AS nlate
       FROM lo GROUP BY 1),
w AS (SELECT lo.l_suppkey, count(*)::BIGINT AS numwait
      FROM lo JOIN st USING (l_orderkey)
      WHERE lo.late = 1 AND st.nsupp >= 2 AND st.nlate = 1
      GROUP BY 1)
SELECT s.s_name, w.numwait
FROM w JOIN supplier s ON s.s_suppkey = w.l_suppkey
ORDER BY w.numwait DESC, s.s_name LIMIT 100""",
        # Q2 shape: offer price = min unit price over lineitems (no
        # partsupp in this corpus)
        "min_cost_supplier": """
WITH offers AS (
    SELECT l.l_partkey AS p_partkey, l.l_suppkey AS s_suppkey,
           min(l.l_extendedprice / l.l_quantity) AS cost
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE p.p_size <= 10 AND p.p_type = 'STANDARD'
      AND r.r_name = 'EUROPE'
    GROUP BY 1, 2)
SELECT s.s_acctbal, s.s_name, n.n_name, o.p_partkey,
       round(o.cost, 6) AS cost
FROM offers o
JOIN supplier s ON s.s_suppkey = o.s_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE o.cost = (SELECT min(o2.cost) FROM offers o2
                WHERE o2.p_partkey = o.p_partkey)
ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, o.p_partkey
LIMIT 100""",
        # Q11 shape: integer 10^-4-unit revenue, exact HAVING
        # (value * 5000 > total) against the scalar subquery
        "important_parts": """
WITH v AS (SELECT l.l_partkey,
                  sum(round(l.l_extendedprice * (1.0 - l.l_discount)
                            * 10000)::BIGINT) AS v
           FROM lineitem l
           JOIN supplier s ON s.s_suppkey = l.l_suppkey
           WHERE s.s_nationkey = 3
           GROUP BY 1)
SELECT l_partkey, v / 10000.0 AS value FROM v
WHERE v * 5000 > (SELECT sum(v) FROM v)""",
        # Q16 shape: negative-acctbal suppliers are the complaints
        # NOT-IN analog; lineitem pairs stand in for partsupp
        "supplier_part_counts": """
SELECT p.p_brand, p.p_type, p.p_size::BIGINT AS p_size,
       count(DISTINCT l.l_suppkey)::BIGINT AS supplier_cnt
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#1' AND p.p_type <> 'PROMO'
  AND p.p_size <= 25
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                          WHERE s_acctbal < 0)
GROUP BY 1, 2, 3""",
        # Q20 shape: shipped-qty threshold stands in for the
        # availqty > half-shipped test (no partsupp)
        "promotion_suppliers": """
WITH q AS (SELECT l.l_suppkey, sum(l.l_quantity) AS qty
           FROM lineitem l
           JOIN part p ON p.p_partkey = l.l_partkey
           WHERE p.p_name LIKE '%widget%'
             AND l.l_shipdate >= TIMESTAMP '1995-01-01'
             AND l.l_shipdate < TIMESTAMP '1996-01-01'
           GROUP BY 1)
SELECT s.s_name, s.s_acctbal
FROM q JOIN supplier s ON s.s_suppkey = q.l_suppkey
WHERE q.qty > 400.0 ORDER BY s.s_name""",
        "product_profit": """
SELECT n.n_name, year(o.o_orderdate)::BIGINT AS o_year,
       (CASE WHEN sum(round(l.l_extendedprice * (1.0 - l.l_discount)
                            * 10000)::BIGINT
                     - round(0.6 * p.p_retailprice * l.l_quantity
                             * 10000)::BIGINT) >= 0
             THEN (sum(round(l.l_extendedprice * (1.0 - l.l_discount)
                             * 10000)::BIGINT
                       - round(0.6 * p.p_retailprice * l.l_quantity
                               * 10000)::BIGINT) + 50) // 100
             ELSE -((-sum(round(l.l_extendedprice
                                * (1.0 - l.l_discount)
                                * 10000)::BIGINT
                          - round(0.6 * p.p_retailprice
                                  * l.l_quantity
                                  * 10000)::BIGINT) + 50) // 100)
        END) / 100.0 AS profit
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE p.p_name LIKE '%widget%'
GROUP BY 1, 2""",
        # DSIR: hashed-unigram likelihood ratio, add-1 smoothing over
        # the 1024-bucket space; docs with no tokens emit no row
        "dsir_weights": _TOKS + """,
tc AS (SELECT doc_id, term, count(*)::BIGINT AS tf
       FROM toks GROUP BY 1, 2),
db AS (SELECT doc_id,
              (md5_number_lower('dsir:' || term) % 1024)::BIGINT
                AS bucket,
              sum(tf)::BIGINT AS n
       FROM tc GROUP BY 1, 2),
sd AS (SELECT d.doc_id, d.bucket, d.n,
              doc.source = 'src0' AS is_tgt
       FROM db d JOIN documents doc USING (doc_id)),
ct AS (SELECT bucket,
              sum(CASE WHEN is_tgt THEN n ELSE 0 END)::DOUBLE AS ct,
              sum(CASE WHEN is_tgt THEN 0 ELSE n END)::DOUBLE AS cs
       FROM sd GROUP BY 1),
tot AS (SELECT sum(ct) AS st, sum(cs) AS ss FROM ct),
lam AS (SELECT bucket,
               ln((ct + 1.0) / (st + 1024.0))
                 - ln((cs + 1.0) / (ss + 1024.0)) AS lam
        FROM ct CROSS JOIN tot),
w AS (SELECT sd.doc_id, sum(sd.n * lam.lam) AS lw
      FROM sd JOIN lam USING (bucket) GROUP BY 1)
SELECT doc_id, round(lw, 6) AS log_weight FROM w""",
        # chi2 over the FULL marginal grid (zero cells pay their
        # expected count)
        "chi_square_lang_source": """
WITH c AS (SELECT lang AS r, source AS c2, count(*)::DOUBLE AS n
           FROM documents
           WHERE lang IS NOT NULL AND source IS NOT NULL
           GROUP BY 1, 2),
rt AS (SELECT r, sum(n) AS rn FROM c GROUP BY 1),
ct AS (SELECT c2, sum(n) AS cn FROM c GROUP BY 1),
t AS (SELECT sum(n) AS tot FROM c),
grid AS (SELECT rt.r, ct.c2, rt.rn * ct.cn / t.tot AS e
         FROM rt CROSS JOIN ct CROSS JOIN t),
x AS (SELECT sum((coalesce(c.n, 0) - g.e) * (coalesce(c.n, 0) - g.e)
                 / g.e) AS chi2
      FROM grid g LEFT JOIN c ON c.r = g.r AND c.c2 = g.c2)
SELECT (SELECT tot FROM t)::BIGINT AS n,
       (SELECT count(*) FROM rt)::BIGINT AS n_rows,
       (SELECT count(*) FROM ct)::BIGINT AS n_cols,
       ((SELECT count(*) FROM rt) - 1)
         * ((SELECT count(*) FROM ct) - 1) AS dof,
       round(x.chi2, 6) AS chi2,
       round(sqrt(x.chi2 / ((SELECT tot FROM t)
             * least((SELECT count(*) FROM rt) - 1,
                     (SELECT count(*) FROM ct) - 1))), 6)
         AS cramers_v
FROM x""",
        # rank sums are integer-plus-half values, exact in doubles —
        # the two engines agree bit-for-bit before the final z
        "mann_whitney_u": """
WITH s AS (SELECT CASE WHEN event_type = 'click' THEN 1 ELSE 0 END
             AS ia, value
           FROM events
           WHERE event_type IN ('click', 'view')
             AND value IS NOT NULL),
v AS (SELECT value, sum(ia)::DOUBLE AS na, count(*)::DOUBLE AS nt
      FROM s GROUP BY 1),
o AS (SELECT value, na, nt,
        coalesce(sum(nt) OVER (ORDER BY value
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
          AS cb
      FROM v),
agg AS (SELECT sum(na * (cb + (nt + 1) / 2)) AS ra, sum(na) AS n1,
               sum(nt) - sum(na) AS n2,
               sum(nt * nt * nt - nt) AS ties, sum(nt) AS n
        FROM o)
SELECT n1::BIGINT AS n_a, n2::BIGINT AS n_b,
       round(ra - n1 * (n1 + 1) / 2, 6) AS u_a,
       round((ra - n1 * (n1 + 1) / 2 - n1 * n2 / 2)
             / sqrt(n1 * n2 / 12
                    * ((n + 1) - ties / (n * (n - 1)))), 6) AS z
FROM agg""",
        # Q4 shape: lateness is shipdate > orderdate + 90d (this
        # corpus has no l_commitdate / l_receiptdate)
        "late_shipment_priority": """
SELECT o.o_orderpriority,
       count(DISTINCT o.o_orderkey)::BIGINT AS order_count
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderdate >= TIMESTAMP '1995-04-01'
  AND o.o_orderdate < TIMESTAMP '1995-07-01'
  AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
GROUP BY 1""",
        # Q12 shape on l_returnflag (no l_shipmode in this corpus)
        "priority_line_counts": """
SELECT l.l_returnflag,
       sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
       sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END)::BIGINT AS low_line_count
FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY 1""",
        "customer_order_distribution": """
WITH co AS (SELECT c.c_custkey,
              count(o.o_custkey)::BIGINT AS c_count
            FROM customer c
            LEFT JOIN orders o ON c.c_custkey = o.o_custkey
            GROUP BY 1)
SELECT c_count, count(*)::BIGINT AS custdist FROM co GROUP BY 1""",
        # quantity sums are integer-valued doubles, so the HAVING cut
        # and the 2dp rounding agree across summation orders
        "large_volume_customers": """
WITH q AS (SELECT l_orderkey, sum(l_quantity) AS sum_qty
           FROM lineitem GROUP BY 1
           HAVING sum(l_quantity) > 300.0)
SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
       o.o_totalprice, round(q.sum_qty, 2) AS sum_qty
FROM q
JOIN orders o ON o.o_orderkey = q.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
ORDER BY o.o_totalprice DESC, o.o_orderdate, o.o_orderkey
LIMIT 100""",
        # acctbal has 2 decimals; the scalar mean differs between
        # engines only at ~1e-10, far below any comparison boundary
        "idle_rich_customers": """
WITH a AS (SELECT avg(c_acctbal) AS ab FROM customer
           WHERE c_acctbal > 0.0)
SELECT c.c_nationkey, count(*)::BIGINT AS numcust,
       round(sum(c.c_acctbal), 2) AS totacctbal
FROM customer c, a
WHERE c.c_acctbal > a.ab
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY 1""",
        "nation_trade_volume": """
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       year(l.l_shipdate)::BIGINT AS l_year,
       round(sum(l.l_extendedprice * (1.0 - l.l_discount)), 2)
         AS revenue
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation sn ON sn.n_nationkey = s.s_nationkey
JOIN nation cn ON cn.n_nationkey = c.c_nationkey
WHERE l.l_shipdate >= TIMESTAMP '1995-01-01'
  AND l.l_shipdate < TIMESTAMP '1997-01-01'
  AND ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
       OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
GROUP BY 1, 2, 3""",
        # exact NTILE codes; monetary rounded 6 BEFORE the tile
        # ordering, ties pinned on user_id — identical quartile cuts
        "rfm_segments": """
WITH u AS (SELECT user_id, max(ts) AS last_ts,
                  count(*)::BIGINT AS freq,
                  round(sum(value), 6) AS monetary
           FROM events GROUP BY 1),
a AS (SELECT max(ts) AS as_of FROM events),
r AS (SELECT user_id,
             datediff('day', cast(last_ts AS DATE),
                      cast(as_of AS DATE))::BIGINT AS recency_days,
             freq, monetary
      FROM u CROSS JOIN a),
tiles AS (SELECT user_id, monetary,
   ntile(4) OVER (ORDER BY recency_days, user_id) AS r_tile,
   ntile(4) OVER (ORDER BY freq DESC, user_id) AS f_tile,
   ntile(4) OVER (ORDER BY monetary DESC, user_id) AS m_tile
   FROM r)
SELECT r_tile::BIGINT AS r_tile, f_tile::BIGINT AS f_tile,
       m_tile::BIGINT AS m_tile, count(*)::BIGINT AS n_users,
       round(sum(monetary), 2) AS sum_monetary
FROM tiles GROUP BY 1, 2, 3""",
        # per-doc-deduped whitespace bigrams of lower(text), kept
        # when seen in >= 3 distinct docs of the same source
        "webtext_clean": """
WITH m AS (SELECT url, main_text,
                  len(regexp_split_to_array(main_text, '\\s+')) AS n_tokens
           FROM read_parquet('{golden}')),
f AS (SELECT * FROM m WHERE n_tokens >= 60)
SELECT min(url) AS url, n_tokens
FROM f GROUP BY main_text, n_tokens""".format(
            golden=os.path.join(BOILER_DIR, "golden_main.parquet")
        ),
        "main_content": """
SELECT url, main_text, n_kept FROM read_parquet('{golden}')""".format(
            golden=os.path.join(BOILER_DIR, "golden_main.parquet")
        ),
        "boilerplate_ngrams": """
WITH arr AS (SELECT source, doc_id,
    list_filter(regexp_split_to_array(lower(text), '\\s+'),
                x -> x <> '') AS a
  FROM documents WHERE text IS NOT NULL),
g AS (SELECT DISTINCT source, doc_id,
             a[i] || ' ' || a[i+1] AS shingle
      FROM arr, unnest(range(1, len(a))) AS t(i)),
d AS (SELECT source, shingle, count(*)::BIGINT AS n_docs
      FROM g GROUP BY 1, 2)
SELECT source, shingle, n_docs FROM d WHERE n_docs >= 3""",
        # TPC-H Q10 shape; revenue rounded BEFORE the ordering cut so
        # both engines cut the same top-20 set (ties on c_custkey)
        "returned_item_revenue": """
WITH a AS (
  SELECT o.o_custkey AS c_custkey,
         round(sum(l.l_extendedprice * (1.0 - l.l_discount)), 2)
           AS revenue
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE l.l_returnflag = 'R'
    AND o.o_orderdate >= TIMESTAMP '1996-01-01'
    AND o.o_orderdate < TIMESTAMP '1996-04-01'
  GROUP BY 1)
SELECT a.c_custkey::BIGINT AS c_custkey, c.c_name, a.revenue,
       c.c_acctbal, n.n_name
FROM a
JOIN customer c ON c.c_custkey = a.c_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
ORDER BY a.revenue DESC, a.c_custkey
LIMIT 20""",
        # TPC-H Q14 shape over one ship-date month
        "promo_revenue": """
WITH w AS (SELECT l_partkey,
                  l_extendedprice * (1.0 - l_discount) AS rev
           FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '1996-09-01'
             AND l_shipdate < TIMESTAMP '1996-10-01'),
j AS (SELECT w.rev, (p.p_type = 'PROMO') AS is_promo
      FROM w JOIN part p ON p.p_partkey = w.l_partkey)
SELECT round(100.0 * coalesce(sum(rev) FILTER (WHERE is_promo),
                              0.0) / sum(rev), 6) AS promo_pct,
       round(coalesce(sum(rev) FILTER (WHERE is_promo), 0.0), 2)
         AS promo_revenue,
       round(sum(rev), 2) AS total_revenue
FROM j""",
        # TPC-H Q19 shape: three brand/size/quantity arms + the
        # disjunction total under arm = -1 (arms always emit, 0s kept)
        "discounted_revenue": """
WITH j AS (SELECT l.l_quantity AS qty,
                  l.l_extendedprice * (1.0 - l.l_discount) AS rev,
                  p.p_brand AS brand, p.p_size AS size
           FROM lineitem l
           JOIN part p ON l.l_partkey = p.p_partkey),
u AS (SELECT rev,
        (brand = 'Brand#12' AND size BETWEEN 1 AND 5
         AND qty BETWEEN 1 AND 11) AS m0,
        (brand = 'Brand#23' AND size BETWEEN 1 AND 10
         AND qty BETWEEN 10 AND 20) AS m1,
        (brand = 'Brand#24' AND size BETWEEN 1 AND 15
         AND qty BETWEEN 20 AND 30) AS m2
      FROM j)
SELECT 0::BIGINT AS arm,
       count(*) FILTER (WHERE m0)::BIGINT AS n_items,
       round(coalesce(sum(rev) FILTER (WHERE m0), 0.0), 2)
         AS revenue FROM u
UNION ALL
SELECT 1::BIGINT, count(*) FILTER (WHERE m1)::BIGINT,
       round(coalesce(sum(rev) FILTER (WHERE m1), 0.0), 2) FROM u
UNION ALL
SELECT 2::BIGINT, count(*) FILTER (WHERE m2)::BIGINT,
       round(coalesce(sum(rev) FILTER (WHERE m2), 0.0), 2) FROM u
UNION ALL
SELECT -1::BIGINT, count(*) FILTER (WHERE m0 OR m1 OR m2)::BIGINT,
       round(coalesce(sum(rev) FILTER (WHERE m0 OR m1 OR m2), 0.0),
             2) FROM u""",
        # TPC-H Q15 shape: max-revenue supplier(s), ties surface;
        # revenue rounded BEFORE the max comparison on both engines
        "top_supplier_revenue": """
WITH r AS (SELECT l_suppkey AS s_suppkey,
                  round(sum(l_extendedprice * (1.0 - l_discount)),
                        2) AS total_revenue
           FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '1997-01-01'
             AND l_shipdate < TIMESTAMP '1997-04-01'
           GROUP BY 1),
m AS (SELECT max(total_revenue) AS best FROM r)
SELECT r.s_suppkey::BIGINT AS s_suppkey, s.s_name,
       r.total_revenue
FROM r JOIN m ON r.total_revenue = m.best
JOIN supplier s ON s.s_suppkey = r.s_suppkey
ORDER BY r.s_suppkey""",
        # the per-term breakdown bm25_scores sums — same CTE formula
        "bm25_explain": _TOKS + """,
p AS (SELECT term, doc_id, count(*)::BIGINT AS tf
      FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks GROUP BY 1),
s AS (SELECT count(*)::DOUBLE AS n,
             sum(dl)::DOUBLE / count(*) AS avgdl FROM dl),
q(term, qtf) AS (VALUES {qvals}),
d AS (SELECT q.term, count(DISTINCT p.doc_id)::DOUBLE AS df
      FROM q JOIN p USING (term) GROUP BY 1)
SELECT p.doc_id, p.term, q.qtf::BIGINT AS qtf, p.tf,
       d.df::BIGINT AS df,
       round(ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5)), 6) AS idf,
       round(q.qtf * ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5)) *
             (p.tf * (1.2 + 1)) /
             (p.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)), 6)
         AS term_score
FROM p JOIN q USING (term) JOIN d USING (term)
     JOIN dl ON p.doc_id = dl.doc_id CROSS JOIN s
WHERE p.doc_id IN ({dids})""".format(
            qvals=", ".join(
                f"('{t}', {c})"
                for t, c in sorted(__import__("collections")
                                   .Counter(BM25_QUERY.lower()
                                            .split()).items())),
            dids=", ".join(str(i) for i in EXPLAIN_DOC_IDS),
        ),
        # UNROUNDED centroids on both engines; argmax tie-break =
        # smaller label (cluster margins make ulp flips a non-issue)
        "nearest_centroid_eval": """
WITH x AS (SELECT label, unnest(range(1, 65))::BIGINT AS dim,
                  unnest(CAST(embedding AS DOUBLE[])) AS v
           FROM embeddings),
c AS (SELECT label AS clabel, dim, sum(v) / count(*) AS cv
      FROM x GROUP BY 1, 2),
cl AS (SELECT clabel, list(cv ORDER BY dim) AS cvec FROM c
       GROUP BY 1),
sims AS (SELECT e.vec_id, e.label::BIGINT AS label,
                cl.clabel::BIGINT AS pred,
                list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                       cvec) AS s
         FROM embeddings e CROSS JOIN cl),
best AS (SELECT vec_id, label, pred FROM sims
         QUALIFY row_number() OVER (PARTITION BY vec_id
                                    ORDER BY s DESC, pred) = 1)
SELECT label, pred AS pred_label, count(*)::BIGINT AS n
FROM best GROUP BY 1, 2""",
        # replayable hash-seeded walks over the generator-golden edges
        "deterministic_walks": """
WITH e AS (SELECT DISTINCT src_url AS src, dst_url AS dst
           FROM read_parquet('{links}')
           WHERE src_url IS NOT NULL AND dst_url IS NOT NULL),
nodes AS (SELECT DISTINCT u FROM (SELECT src AS u FROM e
                                  UNION SELECT dst FROM e)),
n1 AS (SELECT src, dst FROM (
         SELECT src, dst, row_number() OVER (PARTITION BY src
           ORDER BY md5_number_lower('walk:1:' || src || '>' || dst),
                    dst) AS rn FROM e) WHERE rn = 1),
n2 AS (SELECT src, dst FROM (
         SELECT src, dst, row_number() OVER (PARTITION BY src
           ORDER BY md5_number_lower('walk:2:' || src || '>' || dst),
                    dst) AS rn FROM e) WHERE rn = 1),
n3 AS (SELECT src, dst FROM (
         SELECT src, dst, row_number() OVER (PARTITION BY src
           ORDER BY md5_number_lower('walk:3:' || src || '>' || dst),
                    dst) AS rn FROM e) WHERE rn = 1)
SELECT nodes.u AS start_url, n1.dst AS hop_1, n2.dst AS hop_2,
       n3.dst AS hop_3
FROM nodes LEFT JOIN n1 ON nodes.u = n1.src
           LEFT JOIN n2 ON n1.dst = n2.src
           LEFT JOIN n3 ON n2.dst = n3.src""".format(
            links=os.path.join(LINKGRAPH_DIR, "golden_links.parquet")
        ),
        # threshold = 0.2 * (sum/count): exact-integer sums make it
        # bit-identical on both engines (see small_quantity_revenue)
        "small_quantity_revenue": """
WITH pa AS (SELECT l_partkey,
              0.2 * (sum(l_quantity) / count(*)) AS lim
            FROM lineitem GROUP BY 1)
SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem l JOIN pa ON l.l_partkey = pa.l_partkey
WHERE l.l_quantity < pa.lim""",
        # integer daily counts -> exact moment sums -> identical
        # mean/std on both engines
        "daily_anomalies": """
WITH d AS (SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
                  count(*)::BIGINT AS n
           FROM events GROUP BY 1, 2),
s AS (SELECT event_type, count(*)::DOUBLE AS nd, sum(n) AS s1,
             sum(n * n) AS s2 FROM d GROUP BY 1),
st AS (SELECT event_type, s1 / nd AS mean,
              sqrt(greatest(s2 / nd - (s1 / nd) * (s1 / nd), 0))
                AS std
       FROM s)
SELECT d.event_type, d.day, d.n,
       round((d.n - st.mean) / st.std, 6) AS zscore
FROM d JOIN st USING (event_type)
WHERE st.std > 0 AND abs(d.n - st.mean) > 2.0 * st.std""",
        "hard_negatives": """
WITH q AS (SELECT vec_id AS query_id,
                  CAST(embedding AS DOUBLE[]) AS qe, label AS ql
           FROM embeddings WHERE vec_id IN ({ids})),
c AS (SELECT q.query_id, e.vec_id AS neighbor_id,
             e.label::BIGINT AS label,
             list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                    q.qe) AS raw
      FROM q, embeddings e WHERE e.label <> q.ql)
SELECT query_id, neighbor_id, label, round(raw, 6) AS cos FROM c
QUALIFY row_number() OVER (PARTITION BY query_id
                           ORDER BY raw DESC, neighbor_id) <= 5""".format(
            ids=", ".join(str(i) for i in KNN_QUERY_IDS)
        ),
        "local_supplier_volume": """
SELECT n.n_name,
       round(sum(l.l_extendedprice * (1.0 - l.l_discount)), 2)
         AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
               AND c.c_nationkey = s.s_nationkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1995-01-01'
  AND o.o_orderdate < TIMESTAMP '1996-01-01'
GROUP BY 1""",
        # uniq_ratio follows the quality_scores 6dp contract, so both
        # engines compare identical doubles against i/10.0 cutoffs
        "quality_threshold_sweep": """
WITH q AS (SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '\\s+'),
                         x -> x <> '') AS a
           FROM documents WHERE text IS NOT NULL),
st AS (SELECT doc_id, len(a)::BIGINT AS n_tokens,
              CASE WHEN len(a) = 0 THEN 0.0
                   ELSE round(len(list_distinct(a))::DOUBLE / len(a),
                              6) END AS ur
       FROM q),
cuts AS (SELECT round(i / 10.0, 1) AS cutoff
         FROM (SELECT unnest(range(1, 10)) AS i))
SELECT c.cutoff,
       sum(CASE WHEN st.ur >= c.cutoff THEN 1 ELSE 0 END)::BIGINT
         AS n_docs,
       sum(CASE WHEN st.ur >= c.cutoff THEN st.n_tokens
                ELSE 0 END)::BIGINT AS n_tokens
FROM cuts c CROSS JOIN st GROUP BY 1""",
        "user_burstiness": """
WITH g AS (SELECT user_id,
             epoch_us(ts) - lag(epoch_us(ts))
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS d
           FROM events),
gg AS (SELECT user_id, d::BIGINT AS dus, d / 1000000.0 AS gap
       FROM g WHERE d IS NOT NULL),
s AS (SELECT user_id, count(*)::BIGINT AS n_gaps,
             sum(dus)::BIGINT AS s1us,
             sum(gap * gap) AS s2 FROM gg GROUP BY 1),
m AS (SELECT user_id, n_gaps, s2,
             s1us / (n_gaps * 1000000.0) AS mean FROM s)
SELECT user_id, n_gaps,
       floor(mean * 1000000.0 + 0.5) / 1000000.0 AS mean_gap_s,
       round(CASE WHEN mean = 0 THEN 0
                  ELSE sqrt(greatest(s2 / n_gaps - mean * mean, 0))
                       / mean END, 6) AS cv
FROM m""",
        "did_you_mean": _TOKS + """,
dt AS (SELECT DISTINCT term, doc_id FROM toks),
d AS (SELECT term, count(*)::BIGINT AS df FROM dt GROUP BY 1),
q(query) AS (VALUES ('tablz'), ('quer'), ('streamm'), ('vector'),
                    ('zzzzz')),
c AS (SELECT q.query, d.term AS suggestion,
             levenshtein(q.query, d.term)::BIGINT AS dist, d.df
      FROM q CROSS JOIN d
      WHERE abs(length(q.query) - length(d.term)) <= 1
        AND levenshtein(q.query, d.term) <= 1)
SELECT query, suggestion, dist, df FROM c
QUALIFY row_number() OVER (PARTITION BY query
                           ORDER BY dist, df DESC, suggestion) <= 1""",
        # condensation of the SCC contraction + recursive longest path
        "condensation_layers": f"""
WITH RECURSIVE e AS (SELECT DISTINCT src_url AS src, dst_url AS dst
                     FROM read_parquet('{GRAPH_SCC_LINKS}')),
nodes AS (SELECT src AS url FROM e UNION SELECT dst FROM e),
reach(a, b) AS (
  SELECT url, url FROM nodes
  UNION
  SELECT r.a, e.dst FROM reach r JOIN e ON r.b = e.src),
sccm AS (SELECT r1.a AS url, min(r1.b) AS scc_id
         FROM reach r1 JOIN reach r2 ON r1.a = r2.b AND r1.b = r2.a
         GROUP BY 1),
cond AS (SELECT DISTINCT s1.scc_id AS src, s2.scc_id AS dst
         FROM e JOIN sccm s1 ON e.src = s1.url
                JOIN sccm s2 ON e.dst = s2.url
         WHERE s1.scc_id <> s2.scc_id),
walk(s, d) AS (
  SELECT scc_id, 0 FROM (SELECT DISTINCT scc_id FROM sccm)
  UNION ALL
  SELECT c.dst, w.d + 1 FROM walk w JOIN cond c ON c.src = w.s),
lay AS (SELECT s AS scc_id, max(d)::BIGINT AS layer
        FROM walk GROUP BY 1),
mem AS (SELECT scc_id, count(*)::BIGINT AS n_members
        FROM sccm GROUP BY 1)
SELECT scc_id, layer, n_members FROM lay JOIN mem USING (scc_id)""",
        # '(key AND table) OR (fast AND NOT slow)' as presence flags
        "bool_query": _TOKS + """,
d AS (SELECT doc_id,
        bool_or(term = 'key') AS t_key,
        bool_or(term = 'table') AS t_table,
        bool_or(term = 'fast') AS t_fast,
        bool_or(term = 'slow') AS t_slow
      FROM toks GROUP BY 1)
SELECT doc_id FROM d
WHERE (t_key AND t_table) OR (t_fast AND NOT t_slow)""",
        "mad_outliers": """
WITH s1 AS (SELECT event_type, quantile_cont(value, 0.5) AS med
            FROM events GROUP BY 1),
s2 AS (SELECT e.event_type,
              quantile_cont(abs(e.value - s1.med), 0.5) AS mad
       FROM events e JOIN s1 USING (event_type) GROUP BY 1)
SELECT e.event_id, e.event_type, e.value
FROM events e JOIN s1 USING (event_type) JOIN s2 USING (event_type)
WHERE abs(e.value - s1.med) > 3.0 * 1.4826 * s2.mad""",
        # closed-form EWMA (same float contract as the Ray fold)
        "user_ewma": """
WITH o AS (SELECT user_id, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS i,
             count(*) OVER (PARTITION BY user_id) AS n
           FROM events)
SELECT user_id, max(n)::BIGINT AS n_events,
       round(sum(CASE WHEN i = 1
                      THEN pow(1.0 - 0.3, n - 1) * value
                      ELSE 0.3 * pow(1.0 - 0.3, n - i) * value END),
             6) AS ewma
FROM o GROUP BY 1""",
        # the O(rows^2) cross-join ground truth for the SymSpell index
        "fuzzy_pairs": """
SELECT a.c_name AS name_a, b.c_name AS name_b
FROM customer a, customer b
WHERE a.c_name < b.c_name
  AND abs(length(a.c_name) - length(b.c_name)) <= 1
  AND levenshtein(a.c_name, b.c_name) = 1""",
        "dup_chunks": """
WITH pw(e, w) AS (VALUES (0, 1), (1, 257), (2, 66049), (3, 16974593), (4, 67503107), (5, 168429323), (6, 336663071), (7, 623063367), (8, 1213495441), (9, 483199522), (10, 1775709275), (11, 1090750511), (12, 1150007217), (13, 1346595130), (14, 330081243), (15, 1079017218)),
ex AS (
  SELECT doc_id, length(text) AS L,
         unnest(range(1, length(text) + 1)) AS i, text
  FROM documents WHERE text IS NOT NULL
), byte AS (
  SELECT doc_id, L, i, unicode(substr(text, i::INT, 1))::BIGINT AS v,
         text FROM ex
), win AS (
  SELECT a.doc_id, a.i, (sum(b.v * pw.w) % 2147483647) AS hv
  FROM byte a
  JOIN byte b ON b.doc_id = a.doc_id
             AND b.i BETWEEN a.i - 15 AND a.i
  JOIN pw ON pw.e = a.i - b.i
  WHERE a.L >= 16 AND a.i >= 16
  GROUP BY a.doc_id, a.i
), cuts AS (
  SELECT doc_id, i FROM win WHERE (hv & 31) = 0
  UNION
  SELECT doc_id, L AS i FROM byte WHERE L > 0 GROUP BY doc_id, L
), seq AS (
  SELECT doc_id, i,
         coalesce(lag(i) OVER (PARTITION BY doc_id ORDER BY i), 0) AS s,
         row_number() OVER (PARTITION BY doc_id ORDER BY i) - 1 AS ci
  FROM cuts
), ch AS (
  SELECT seq.doc_id, seq.ci,
         md5(substr(d.text, (seq.s + 1)::INT, (seq.i - seq.s)::INT)) AS h
  FROM seq JOIN documents d ON d.doc_id = seq.doc_id)
SELECT doc_id AS rep_doc_id, ci AS rep_chunk_idx,
       n_copies::BIGINT AS n_copies
FROM (SELECT doc_id, ci,
             count(*) OVER (PARTITION BY h) AS n_copies,
             row_number() OVER (PARTITION BY h
                                ORDER BY doc_id, ci) AS rn
      FROM ch)
WHERE n_copies >= 2 AND rn = 1""",
        "containment_pairs": """
WITH dd AS (SELECT doc_id,
            list_filter(regexp_split_to_array(text, '\\s+'),
                        x -> x <> '') AS arr FROM documents),
sh AS (SELECT doc_id, arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2] AS shingle
       FROM dd, unnest(range(1, len(arr) - 1)) AS t(i)
       UNION ALL
       SELECT doc_id, array_to_string(arr, ' ') FROM dd
       WHERE len(arr) BETWEEN 1 AND 2),
p AS (SELECT DISTINCT doc_id, shingle FROM sh),
sz AS (SELECT doc_id, count(*)::BIGINT AS n FROM p GROUP BY 1),
inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 count(*)::BIGINT AS c
          FROM p a JOIN p b ON a.shingle = b.shingle
                            AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
SELECT doc_a, doc_b,
       round(c::DOUBLE / least(sa.n, sb.n), 6) AS containment
FROM inter JOIN sz sa ON doc_a = sa.doc_id
     JOIN sz sb ON doc_b = sb.doc_id
WHERE c::DOUBLE / least(sa.n, sb.n) >= 0.7""",
        "corpus_release": """
WITH w0 AS (SELECT doc_id, text, lang, source,
            list_filter(regexp_split_to_array(text, '\\s+'),
                        x -> x <> '') AS arr
      FROM documents WHERE text IS NOT NULL),
m AS (SELECT doc_id, text, lang, source,
             len(arr)::BIGINT AS n_words,
             list_sum(list_transform(arr, x -> length(x)))::DOUBLE
               / len(arr) AS mwl,
             len(list_filter(arr, x -> regexp_matches(x, '[A-Za-z]')))
               ::DOUBLE / len(arr) AS fa,
             (len(regexp_extract_all(text, '#'))
              + len(regexp_extract_all(text, '\\.\\.\\.')))::DOUBLE
               / len(arr) AS sym
      FROM w0 WHERE len(arr) > 0),
surv AS (SELECT doc_id, text, lang, source, n_words FROM m
         WHERE n_words BETWEEN 30 AND 90 AND mwl BETWEEN 4.0 AND 5.0
           AND fa >= 0.8 AND sym <= 0.05),
ded AS (SELECT * FROM surv
        QUALIFY row_number() OVER (PARTITION BY md5(text)
                                   ORDER BY doc_id) = 1),
t0 AS (SELECT doc_id,
              unnest(regexp_split_to_array(lower(text), '\\s+')) AS term
       FROM ded),
t AS (SELECT doc_id, term FROM t0 WHERE term <> ''),
nt AS (SELECT d.source, count(*)::BIGINT AS n_tokens
       FROM t JOIN ded d USING (doc_id) GROUP BY 1),
j AS (SELECT source, n_tokens,
             1.0 + (CAST(substr(source, 4) AS BIGINT) % 4) AS w
      FROM nt WHERE n_tokens > 0),
s AS (SELECT sum(w) AS sw, sum(n_tokens)::DOUBLE AS T FROM j),
rp AS (SELECT source, w / s.sw * s.T / n_tokens AS r
       FROM j CROSS JOIN s),
reps AS (SELECT ded.doc_id,
           (CASE WHEN rp.r IS NULL THEN 0
                 ELSE floor(rp.r)
                      + CASE WHEN md5_number_lower('mix:' || ded.doc_id)
                                  % 1000000
                               < floor((rp.r - floor(rp.r)) * 1000000
                                       + 0.5)
                             THEN 1 ELSE 0 END
            END)::BIGINT AS n_repeats
         FROM ded LEFT JOIN rp USING (source))
SELECT ded.doc_id, ded.lang, ded.source, ded.n_words, reps.n_repeats
FROM ded JOIN reps USING (doc_id) WHERE reps.n_repeats >= 1""",
        "feature_hashing": _TOKS + """,
tc AS (SELECT doc_id, term, count(*)::BIGINT AS tf
       FROM toks GROUP BY 1, 2),
hb AS (SELECT doc_id, term, tf,
              md5_number_lower('fh:' || term) AS h FROM tc),
fv AS (SELECT doc_id, (h % 64)::BIGINT AS dim,
              sum(CASE WHEN (h // 64) % 2 = 1 THEN tf
                       ELSE -tf END)::BIGINT AS value
       FROM hb GROUP BY 1, 2)
SELECT doc_id, dim, value FROM fv WHERE value <> 0""",
        "auto_stopwords": _TOKS + """,
d AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df
      FROM toks GROUP BY 1),
n AS (SELECT count(*)::DOUBLE AS nd FROM documents
      WHERE text IS NOT NULL)
SELECT term, df, round(df / n.nd, 6) AS df_ratio
FROM d CROSS JOIN n WHERE df / n.nd >= 0.5""",
        "sentence_split": """
WITH p AS (SELECT doc_id,
             substr(text, 1, 40) || '. ' || substr(text, 41, 40)
             || '! What now? ' || substr(text, 81, 20) AS text
           FROM documents WHERE text IS NOT NULL),
m AS (SELECT doc_id,
             regexp_extract_all(text, '[^.!?]+[.!?]*') AS l FROM p),
x AS (SELECT doc_id, i, trim(l[i]) AS sentence
      FROM m, unnest(range(1, len(l) + 1)) AS t(i)),
y AS (SELECT doc_id, sentence,
             row_number() OVER (PARTITION BY doc_id ORDER BY i) - 1
               AS sent_idx
      FROM x WHERE sentence <> '')
SELECT doc_id, sent_idx, sentence FROM y""",
        "freq_spectrum": _TOKS + """,
tc AS (SELECT term, count(*)::BIGINT AS n FROM toks GROUP BY 1)
SELECT n AS n_occurrences, count(*)::BIGINT AS n_types
FROM tc GROUP BY 1""",
        "mix_plan": _TOKS + """,
nd AS (SELECT source, count(*)::BIGINT AS n_docs
       FROM documents GROUP BY 1),
nt AS (SELECT d.source, count(*)::BIGINT AS n_tokens
       FROM toks t JOIN documents d USING (doc_id) GROUP BY 1),
j AS (SELECT nd.source, nd.n_docs, coalesce(nt.n_tokens, 0) AS n_tokens,
             1.0 + (CAST(substr(nd.source, 4) AS BIGINT) % 4) AS w
      FROM nd LEFT JOIN nt USING (source)),
jj AS (SELECT * FROM j WHERE n_tokens > 0),
s AS (SELECT sum(w) AS sw, sum(n_tokens)::DOUBLE AS T FROM jj)
SELECT source, n_docs, n_tokens,
       round(w / s.sw, 6) AS target_share,
       round(w / s.sw * s.T / n_tokens, 6) AS repeat_factor
FROM jj CROSS JOIN s""",
        "mix_epochs": _TOKS + """,
nd AS (SELECT source, count(*)::BIGINT AS n_docs
       FROM documents GROUP BY 1),
nt AS (SELECT d.source, count(*)::BIGINT AS n_tokens
       FROM toks t JOIN documents d USING (doc_id) GROUP BY 1),
j AS (SELECT nd.source, nd.n_docs, coalesce(nt.n_tokens, 0) AS n_tokens,
             1.0 + (CAST(substr(nd.source, 4) AS BIGINT) % 4) AS w
      FROM nd LEFT JOIN nt USING (source)),
jj AS (SELECT * FROM j WHERE n_tokens > 0),
s AS (SELECT sum(w) AS sw, sum(n_tokens)::DOUBLE AS T FROM jj),
rp AS (SELECT source, w / s.sw * s.T / n_tokens AS r
       FROM jj CROSS JOIN s)
SELECT d.doc_id,
       (CASE WHEN rp.r IS NULL THEN 0
             ELSE floor(rp.r)
                  + CASE WHEN md5_number_lower('mix:' || d.doc_id)
                              % 1000000
                           < floor((rp.r - floor(rp.r)) * 1000000 + 0.5)
                         THEN 1 ELSE 0 END
        END)::BIGINT AS n_repeats
FROM documents d LEFT JOIN rp USING (source)""",
        "content_chunks": """
WITH pw(e, w) AS (VALUES (0, 1), (1, 257), (2, 66049), (3, 16974593), (4, 67503107), (5, 168429323), (6, 336663071), (7, 623063367), (8, 1213495441), (9, 483199522), (10, 1775709275), (11, 1090750511), (12, 1150007217), (13, 1346595130), (14, 330081243), (15, 1079017218)),
ex AS (
  SELECT doc_id, length(text) AS L,
         unnest(range(1, length(text) + 1)) AS i, text
  FROM documents WHERE text IS NOT NULL
), byte AS (
  SELECT doc_id, L, i, unicode(substr(text, i::INT, 1))::BIGINT AS v FROM ex
), win AS (
  SELECT a.doc_id, a.i, (sum(b.v * pw.w) % 2147483647) AS hv
  FROM byte a
  JOIN byte b ON b.doc_id = a.doc_id
             AND b.i BETWEEN a.i - 15 AND a.i
  JOIN pw ON pw.e = a.i - b.i
  WHERE a.L >= 16 AND a.i >= 16
  GROUP BY a.doc_id, a.i
), cuts AS (
  SELECT doc_id, i FROM win WHERE (hv & 31) = 0
  UNION
  SELECT doc_id, L AS i FROM byte WHERE L > 0 GROUP BY doc_id, L
), seq AS (
  SELECT doc_id, i,
         coalesce(lag(i) OVER (PARTITION BY doc_id ORDER BY i), 0) AS s,
         row_number() OVER (PARTITION BY doc_id ORDER BY i) - 1 AS ci
  FROM cuts)
SELECT doc_id, ci AS chunk_idx, s AS start, (i - s)::BIGINT AS length
FROM seq""",
        "registrable_domains": f"""
WITH hosts AS (SELECT host FROM read_parquet('{PSL_HOSTS}')),
r(rule, wild, exc) AS (VALUES ('com', false, false), ('uk', false, false), ('co.uk', false, false), ('io', false, false), ('github.io', false, false), ('ck', true, false), ('www.ck', false, true)),
h AS (SELECT host, string_split(lower(host), '.') AS hl
      FROM hosts WHERE host IS NOT NULL),
m AS (SELECT h.host, h.hl, r.exc,
        len(string_split(r.rule, '.'))
          + CASE WHEN r.wild THEN 1 ELSE 0 END AS n
      FROM h JOIN r ON
        len(h.hl) >= len(string_split(r.rule, '.'))
                     + CASE WHEN r.wild THEN 1 ELSE 0 END
        AND array_to_string(
              h.hl[len(h.hl) - len(string_split(r.rule, '.')) + 1
                   : len(h.hl)], '.') = r.rule),
best AS (SELECT host, CASE WHEN exc THEN n - 1 ELSE n END AS ps
         FROM m QUALIFY row_number() OVER (PARTITION BY host
             ORDER BY exc DESC,
                      CASE WHEN exc THEN n ELSE -n END) = 1),
fin AS (SELECT h.host, h.hl, coalesce(b.ps, 1) AS ps
        FROM h LEFT JOIN best b USING (host))
SELECT host,
       CASE WHEN len(hl) > ps
            THEN array_to_string(hl[len(hl) - ps : len(hl)], '.')
            ELSE NULL END AS registrable
FROM fin
UNION ALL
SELECT host, NULL AS registrable FROM hosts WHERE host IS NULL""",
        "cms_term_counts": _TOKS + """,
tc AS (SELECT term, count(*)::BIGINT AS n FROM toks GROUP BY 1),
pr(term) AS (VALUES ('spark'), ('window'), ('hash'), ('the'), ('zzznope')),
dep(dd) AS (VALUES (0), (1), (2), (3)),
sums AS (SELECT pr.term, dep.dd,
           sum(CASE WHEN md5_number_lower(dep.dd || ':' || tc.term) % 16
                       = md5_number_lower(dep.dd || ':' || pr.term) % 16
                    THEN tc.n ELSE 0 END) AS s
         FROM pr CROSS JOIN dep CROSS JOIN tc GROUP BY 1, 2),
est AS (SELECT term, min(s)::BIGINT AS cms_n FROM sums GROUP BY 1)
SELECT pr.term, coalesce(tc.n, 0)::BIGINT AS exact_n, est.cms_n
FROM pr LEFT JOIN tc USING (term) JOIN est USING (term)""",
        "phrase_scan": """
WITH ph(phrase) AS (VALUES ('merge join'), ('hash table'), ('fast scan'), ('dup key'), ('window merge')),
hits AS (SELECT d.doc_id, ph.phrase,
                len(regexp_extract_all(d.text, ph.phrase))::BIGINT AS n
         FROM documents d CROSS JOIN ph WHERE d.text IS NOT NULL)
SELECT doc_id, phrase, n FROM hits WHERE n > 0""",
        "codec_size_report": _TOKS + """,
p AS (SELECT term, doc_id FROM toks GROUP BY term, doc_id),
d AS (SELECT term, doc_id,
        doc_id - coalesce(lag(doc_id) OVER (PARTITION BY term
                                            ORDER BY doc_id), 0) AS delta,
        row_number() OVER (PARTITION BY term ORDER BY doc_id) AS rn
      FROM p),
vb AS (SELECT term, count(*)::BIGINT AS n,
        sum(ceil(length(bin(delta)) / 7.0))::BIGINT AS varint_bytes
       FROM d GROUP BY 1),
blk AS (SELECT term, (rn - 1) // 128 AS b, count(*)::BIGINT AS cnt,
         min(delta) AS base, max(delta) - min(delta) AS maxd
        FROM d GROUP BY 1, 2),
fb AS (SELECT term,
        sum(ceil(length(bin(base)) / 7.0) + 1
            + (cnt * (CASE WHEN maxd = 0 THEN 0
                           ELSE length(bin(maxd)) END) + 7) // 8
           )::BIGINT AS for_body
       FROM blk GROUP BY 1)
SELECT vb.term, vb.n AS n_postings, vb.varint_bytes,
       (ceil(length(bin(vb.n)) / 7.0)::BIGINT + fb.for_body) AS for_bytes
FROM vb JOIN fb USING (term)""",
        "mlm_mask_plan": """
WITH dd AS (SELECT doc_id,
            list_filter(regexp_split_to_array(lower(text), '\s+'),
                        x -> x <> '') AS arr FROM documents),
t AS (SELECT doc_id, i - 1 AS pos, arr[i] AS token, len(arr) AS dl, arr
      FROM dd, unnest(range(1, len(arr) + 1)) AS u(i)),
k AS (SELECT *, md5_number_lower(doc_id || ':' || pos) AS h FROM t)
SELECT doc_id, pos, token,
       CASE WHEN (h // 100) % 10 < 8 THEN 'mask'
            WHEN (h // 100) % 10 = 8 THEN 'random'
            ELSE 'keep' END AS action,
       CASE WHEN (h // 100) % 10 < 8 THEN '[MASK]'
            WHEN (h // 100) % 10 = 8
              THEN arr[(((h // 1000) % dl))::BIGINT + 1]
            ELSE token END AS replacement
FROM k WHERE h % 100 < 15""",
        "gopher_rules": """
WITH planted AS (
  SELECT doc_id, CASE WHEN doc_id % 11 = 0
         THEN text || ' 123 456 ### wait... no...' ELSE text END AS text
  FROM documents),
w AS (SELECT doc_id, text,
             list_filter(regexp_split_to_array(text, '\s+'),
                         x -> x <> '') AS arr
      FROM planted WHERE text IS NOT NULL),
m AS (SELECT doc_id,
             len(arr)::BIGINT AS n_words,
             list_sum(list_transform(arr, x -> length(x)))::DOUBLE
               / len(arr) AS mwl,
             len(list_filter(arr, x -> regexp_matches(x, '[A-Za-z]')))
               ::DOUBLE / len(arr) AS fa,
             (len(regexp_extract_all(text, '#'))
              + len(regexp_extract_all(text, '\.\.\.')))::DOUBLE
               / len(arr) AS sym
      FROM w WHERE len(arr) > 0)
SELECT doc_id, n_words, round(mwl, 6) AS mean_word_len,
       round(fa, 6) AS frac_alpha_words, round(sym, 6) AS symbol_ratio,
       (n_words BETWEEN 30 AND 90 AND mwl BETWEEN 4.0 AND 5.0
        AND fa >= 0.8 AND sym <= 0.05) AS passes
FROM m""",
        "pii_counts": _PII_PLANT_CTE + f"""
SELECT doc_id,
       len(regexp_extract_all(text, '{_PII_EMAIL}'))::BIGINT AS n_emails,
       len(regexp_extract_all(text, '{_PII_IPV4}'))::BIGINT AS n_ipv4,
       len(regexp_extract_all(text, '{_PII_PHONE}'))::BIGINT AS n_phones
FROM planted""",
        "pii_redact": _PII_PLANT_CTE + f"""
SELECT doc_id,
       regexp_replace(regexp_replace(regexp_replace(text,
           '{_PII_EMAIL}', '<EMAIL>', 'g'),
           '{_PII_IPV4}', '<IP>', 'g'),
           '{_PII_PHONE}', '<PHONE>', 'g') AS red_text
FROM planted""",
        "doc_fingerprints": "SELECT doc_id, md5(text) AS fp FROM documents",
        "regex_token_counts": """
SELECT doc_id,
       (CASE WHEN trim(text) = '' THEN 0
             ELSE len(regexp_split_to_array(trim(text), '\\s+'))
        END)::BIGINT AS n_ws_tokens,
       len(regexp_extract_all(text, '{pat}'))::BIGINT AS n_bpe_tokens
FROM documents""".format(pat=__import__("rse_ray.pipelines.text",
                                        fromlist=["BPE_PATTERN"])
                         .BPE_PATTERN.replace("'", "''")),
        "exact_dedup": """
SELECT min(doc_id)::BIGINT AS doc_id, count(*)::BIGINT AS n_copies
FROM documents GROUP BY text""",
        "paragraph_dedup": """
WITH planted AS (
  SELECT doc_id,
         'common paragraph ' || (doc_id % 7) || chr(10) ||
         substr(text, 1, 80) || chr(10) ||
         'common paragraph ' || (doc_id % 3) AS text
  FROM documents),
arrs AS (SELECT doc_id, regexp_split_to_array(text, chr(10)) AS arr
         FROM planted),
paras AS (SELECT doc_id, i - 1 AS para_idx, arr[i] AS para
          FROM arrs, unnest(range(1, len(arr) + 1)) AS t(i)),
g AS (SELECT doc_id, para_idx, para,
             row_number() OVER (PARTITION BY md5(para)
                                ORDER BY doc_id, para_idx) AS rn,
             count(*) OVER (PARTITION BY md5(para)) AS n_copies
      FROM paras)
SELECT doc_id, para_idx, para, n_copies::BIGINT AS n_copies
FROM g WHERE rn = 1""",
        "dedup_last_writer": """
SELECT user_id, event_id, ts, event_type, value FROM events
QUALIFY row_number() OVER (PARTITION BY user_id
                           ORDER BY ts DESC, event_id DESC) = 1""",
        "ngram_jaccard_pairs": """
WITH dd AS (SELECT doc_id,
            list_filter(regexp_split_to_array(text, '\\s+'),
                        x -> x <> '') AS arr FROM documents),
sh AS (SELECT doc_id, arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2] AS shingle
       FROM dd, unnest(range(1, len(arr) - 1)) AS t(i)
       UNION ALL  -- <3-token docs: one whole-doc shingle (hashing.shingles)
       SELECT doc_id, array_to_string(arr, ' ') FROM dd
       WHERE len(arr) BETWEEN 1 AND 2),
p AS (SELECT DISTINCT doc_id, shingle FROM sh),
sz AS (SELECT doc_id, count(*)::BIGINT AS n FROM p GROUP BY 1),
inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS c
          FROM p a JOIN p b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
SELECT doc_a, doc_b,
       round(c::DOUBLE / (sa.n + sb.n - c), 6) AS jaccard
FROM inter JOIN sz sa ON doc_a = sa.doc_id JOIN sz sb ON doc_b = sb.doc_id
WHERE c::DOUBLE / (sa.n + sb.n - c) >= {th}""".format(th=JACCARD_THRESHOLD),
        # minhash verify emits (pair, exact jaccard >= 0.5); with the
        # fixture corpora's near-dup pairs all far above the LSH recall
        # knee (128 perms / 16 bands), the candidate set provably
        # contains every pair >= 0.5 — so exact-jaccard SQL is a sound
        # oracle (verified at sf0.01 and sf0.1; tests pin agreement)
        "minhash_dedup_pairs": (
            "WITH " + _JACCARD_PAIRS_CTE
            + "\nSELECT doc_a, doc_b, jaccard FROM vpairs"
        ),
        # connected components over the verified pair graph, in SQL via
        # a recursive reachability CTE (pairs are few; UNION dedups, so
        # the recursion terminates); cluster_id = component min
        "dup_clusters": (
            "WITH RECURSIVE " + _JACCARD_PAIRS_CTE + """,
e AS (SELECT doc_a AS a, doc_b AS b FROM vpairs
      UNION SELECT doc_b, doc_a FROM vpairs),
reach(a, b) AS (SELECT a, b FROM e
                UNION SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a)
SELECT a::BIGINT AS doc_id, least(a, min(b))::BIGINT AS cluster_id
FROM reach GROUP BY a"""
        ),
        # duplicate-graph dashboard: components of the verified pair
        # graph summarized to one row
        "dup_graph_stats": (
            "WITH RECURSIVE " + _JACCARD_PAIRS_CTE + """,
e AS (SELECT doc_a AS a, doc_b AS b FROM vpairs
      UNION SELECT doc_b, doc_a FROM vpairs),
reach(a, b) AS (SELECT a, b FROM e
                UNION SELECT r.a, e.b
                FROM reach r JOIN e ON r.b = e.a),
cl AS (SELECT a::BIGINT AS doc_id,
              least(a, min(b))::BIGINT AS cluster_id
       FROM reach GROUP BY a),
csz AS (SELECT cluster_id, count(*)::BIGINT AS csize FROM cl
        GROUP BY 1)
SELECT (SELECT count(*) FROM cl)::BIGINT AS n_dup_docs,
       count(*)::BIGINT AS n_clusters,
       max(csize)::BIGINT AS max_cluster,
       ((SELECT count(*) FROM cl) - count(*))::BIGINT AS removable
FROM csz"""
        ),
        "dedup_keep_representative": (
            "WITH RECURSIVE " + _JACCARD_PAIRS_CTE + """,
e AS (SELECT doc_a AS a, doc_b AS b FROM vpairs
      UNION SELECT doc_b, doc_a FROM vpairs),
reach(a, b) AS (SELECT a, b FROM e
                UNION SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a),
losers AS (SELECT a FROM reach GROUP BY a HAVING least(a, min(b)) < a)
SELECT doc_id FROM documents
WHERE doc_id NOT IN (SELECT a FROM losers)"""
        ),
        "simhash_dup_pairs": _simhash_sql(max_hamming=3),
        "winnow_fingerprints": _winnow_sql(window=64, mod_bits=4),
        "lang_id": _lang_id_sql(),
        # LangId predictions vs stored labels, per-cell counts
        "langid_confusion": f"""
WITH pred AS ({_lang_id_sql()})
SELECT d.lang AS lang_true, p.lang_pred, count(*)::BIGINT AS n
FROM documents d JOIN pred p USING (doc_id)
GROUP BY 1, 2""",
        # Cohen's kappa over the same confusion matrix: exact integer
        # marginals, one float division per statistic
        "langid_kappa": f"""
WITH pred AS ({_lang_id_sql()}),
cm AS (SELECT d.lang AS lt, p.lang_pred AS lp,
              count(*)::BIGINT AS n
       FROM documents d JOIN pred p USING (doc_id)
       GROUP BY 1, 2),
tot AS (SELECT sum(n)::BIGINT AS n FROM cm),
dg AS (SELECT coalesce(sum(n), 0)::BIGINT AS d FROM cm
       WHERE lt = lp),
mg AS (SELECT coalesce(sum(coalesce(r.rn, 0) * coalesce(c.cn, 0)),
                       0)::BIGINT AS pe_num
       FROM (SELECT lt, sum(n)::BIGINT AS rn FROM cm GROUP BY 1) r
       FULL JOIN (SELECT lp, sum(n)::BIGINT AS cn FROM cm
                  GROUP BY 1) c
         ON r.lt = c.lp)
SELECT tot.n,
       round(dg.d * 1.0 / tot.n, 6) AS po,
       round(mg.pe_num * 1.0 / (tot.n * tot.n), 6) AS pe,
       round((dg.d * 1.0 / tot.n
              - mg.pe_num * 1.0 / (tot.n * tot.n))
             / (1 - mg.pe_num * 1.0 / (tot.n * tot.n)), 6) AS kappa
FROM tot CROSS JOIN dg CROSS JOIN mg""",
        "knn_cosine": """
WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
           FROM embeddings WHERE vec_id IN ({ids})),
c AS (SELECT q.query_id, e.vec_id AS neighbor_id,
             list_cosine_similarity(q.qe, CAST(e.embedding AS DOUBLE[])) AS raw
      FROM q, embeddings e WHERE e.vec_id <> q.query_id)
SELECT query_id, neighbor_id, round(raw, 6) AS cos FROM c
QUALIFY row_number() OVER (PARTITION BY query_id
                           ORDER BY raw DESC, neighbor_id) <= 10""".format(
            ids=", ".join(str(i) for i in KNN_QUERY_IDS)
        ),
        # int8 scalar quantization: per-dim corpus min/max, code =
        # floor(t*255+0.5), queries score the RECONSTRUCTED vectors
        "knn_cosine_sq": """
WITH x AS (SELECT vec_id, unnest(range(1, 65))::BIGINT AS dim,
                  unnest(CAST(embedding AS DOUBLE[])) AS v
           FROM embeddings),
st AS (SELECT dim, min(v) AS mn, max(v) AS mx FROM x GROUP BY 1),
rec AS (SELECT vec_id, x.dim,
               CASE WHEN mx = mn THEN mn
                    ELSE mn + floor((v - mn) / (mx - mn) * 255 + 0.5)
                             * (mx - mn) / 255 END AS r
        FROM x JOIN st USING (dim)),
rl AS (SELECT vec_id, list(r ORDER BY dim) AS re FROM rec GROUP BY 1),
q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
      FROM embeddings WHERE vec_id IN ({ids})),
c AS (SELECT q.query_id, e.vec_id AS neighbor_id,
             list_cosine_similarity(q.qe, e.re) AS raw
      FROM q, rl e WHERE e.vec_id <> q.query_id)
SELECT query_id, neighbor_id, round(raw, 6) AS cos FROM c
QUALIFY row_number() OVER (PARTITION BY query_id
                           ORDER BY raw DESC, neighbor_id) <= 10""".format(
            ids=", ".join(str(i) for i in KNN_QUERY_IDS)
        ),
        "knn_cosine_sq_rerank": """
WITH x AS (SELECT vec_id, unnest(range(1, 65))::BIGINT AS dim,
                  unnest(CAST(embedding AS DOUBLE[])) AS v
           FROM embeddings),
st AS (SELECT dim, min(v) AS mn, max(v) AS mx FROM x GROUP BY 1),
rec AS (SELECT vec_id, x.dim,
               CASE WHEN mx = mn THEN mn
                    ELSE mn + floor((v - mn) / (mx - mn) * 255 + 0.5)
                             * (mx - mn) / 255 END AS r
        FROM x JOIN st USING (dim)),
rl AS (SELECT vec_id, list(r ORDER BY dim) AS re FROM rec GROUP BY 1),
q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
      FROM embeddings WHERE vec_id IN ({ids})),
sl AS (SELECT q.query_id, e.vec_id AS neighbor_id
       FROM q, rl e WHERE e.vec_id <> q.query_id
       QUALIFY row_number() OVER (PARTITION BY q.query_id
           ORDER BY list_cosine_similarity(q.qe, e.re) DESC,
                    e.vec_id) <= 40),
ex AS (SELECT sl.query_id, sl.neighbor_id,
              list_cosine_similarity(q.qe,
                  CAST(e.embedding AS DOUBLE[])) AS raw
       FROM sl JOIN q USING (query_id)
            JOIN embeddings e ON e.vec_id = sl.neighbor_id)
SELECT query_id, neighbor_id, round(raw, 6) AS cos FROM ex
QUALIFY row_number() OVER (PARTITION BY query_id
                           ORDER BY raw DESC, neighbor_id) <= 10""".format(
            ids=", ".join(str(i) for i in KNN_QUERY_IDS)
        ),
        # full Lloyd k-means, SQL-unrolled: md5-twin init, argmin via
        # QUALIFY, per-iteration centroid rounding pins the fp state
        "kmeans_clusters": kmeans_oracle_sql(
            k=KMEANS_K, iters=KMEANS_ITERS, dim=64),
        # SemDeDup: k-means oracle nested as a CTE + within-cluster
        # exact-cosine pair join; keep = never the greater id of a pair
        "semdedup": semdedup_oracle_sql(
            k=KMEANS_K, iters=KMEANS_ITERS,
            threshold=COS_NEARDUP_THRESHOLD, dim=64),
        # Metzler-Croft sequential dependence: Dirichlet-smoothed
        # unigram + ordered-adjacent + unordered-window-8 features;
        # zero-collection-cf features dropped in BOTH engines
        "mrf_sd_scores": """
WITH arr AS (SELECT doc_id,
    list_filter(regexp_split_to_array(lower(text), '\\s+'),
                x -> x <> '') AS a FROM documents),
dl AS (SELECT doc_id, len(a)::BIGINT AS dl FROM arr
       WHERE len(a) > 0),
ct AS (SELECT sum(len(a))::DOUBLE AS c FROM arr),
pos AS (SELECT doc_id, i, a[i] AS w
        FROM arr, unnest(range(1, len(a) + 1)) AS t(i)),
qt(w) AS (VALUES ('merge'), ('spark'), ('window')),
qb(bg, wa, wb) AS (VALUES
    ('merge window', 'merge', 'window'),
    ('spark window', 'spark', 'window'),
    ('window merge', 'window', 'merge')),
tfd AS (SELECT p.doc_id, p.w, count(*)::BIGINT AS tf
        FROM pos p JOIN qt ON p.w = qt.w GROUP BY 1, 2),
cft AS (SELECT w, sum(tf)::BIGINT AS cf FROM tfd GROUP BY 1),
o1d AS (SELECT p1.doc_id, qb.bg, count(*)::BIGINT AS tf
        FROM pos p1
        JOIN pos p2 ON p2.doc_id = p1.doc_id AND p2.i = p1.i + 1
        JOIN qb ON p1.w = qb.wa AND p2.w = qb.wb
        GROUP BY 1, 2),
cfo AS (SELECT bg, sum(tf)::BIGINT AS cf FROM o1d GROUP BY 1),
uwd AS (SELECT p1.doc_id, qb.bg, count(*)::BIGINT AS tf
        FROM pos p1
        JOIN pos p2 ON p2.doc_id = p1.doc_id AND p2.i > p1.i
                   AND p2.i - p1.i < 8
        JOIN qb ON (p1.w = qb.wa AND p2.w = qb.wb)
                OR (p1.w = qb.wb AND p2.w = qb.wa)
        GROUP BY 1, 2),
cfu AS (SELECT bg, sum(tf)::BIGINT AS cf FROM uwd GROUP BY 1),
cand AS (SELECT DISTINCT doc_id FROM tfd),
feat AS (
    SELECT c.doc_id, 0.8 AS lam, coalesce(tfd.tf, 0) AS tf,
           cft.cf AS cf
    FROM cand c CROSS JOIN qt
    LEFT JOIN tfd ON tfd.doc_id = c.doc_id AND tfd.w = qt.w
    JOIN cft ON cft.w = qt.w
    UNION ALL
    SELECT c.doc_id, 0.1, coalesce(o1d.tf, 0), cfo.cf
    FROM cand c CROSS JOIN qb
    LEFT JOIN o1d ON o1d.doc_id = c.doc_id AND o1d.bg = qb.bg
    JOIN cfo ON cfo.bg = qb.bg
    UNION ALL
    SELECT c.doc_id, 0.1, coalesce(uwd.tf, 0), cfu.cf
    FROM cand c CROSS JOIN qb
    LEFT JOIN uwd ON uwd.doc_id = c.doc_id AND uwd.bg = qb.bg
    JOIN cfu ON cfu.bg = qb.bg),
sc AS (SELECT f.doc_id,
              sum(f.lam * ln((f.tf + 2000.0 * f.cf / ct.c)
                             / (d.dl + 2000.0))) AS raw
       FROM feat f JOIN dl d USING (doc_id) CROSS JOIN ct
       WHERE f.cf > 0
       GROUP BY 1)
SELECT doc_id, round(raw, 6) AS score FROM sc
ORDER BY raw DESC, doc_id LIMIT 20""",
        # single-pass Aho-Corasick multi-pattern counts; border-free
        # patterns make overlap-counting equal replace()-counting
        "multi_pattern_scan": """
WITH p(pattern) AS (VALUES {pats})
SELECT p.pattern,
       sum(CASE WHEN contains(d.text, p.pattern)
                THEN 1 ELSE 0 END)::BIGINT AS n_docs,
       sum((length(d.text)
            - length(replace(d.text, p.pattern, '')))
           // length(p.pattern))::BIGINT AS n_hits
FROM p CROSS JOIN documents d
WHERE d.text IS NOT NULL
GROUP BY 1""".format(pats=", ".join(
            "('{}')".format(p) for p in AC_PATTERNS)),
        # mean normalized first-occurrence position per term (lead
        # bias); per-doc ratio divided identically in both engines
        "lead_terms": """
WITH arr AS (SELECT doc_id,
    list_filter(regexp_split_to_array(lower(text), '\\s+'),
                x -> x <> '') AS a FROM documents),
pos AS (SELECT doc_id, i, a[i] AS w, len(a) AS l
        FROM arr, unnest(range(1, len(a) + 1)) AS t(i)),
fp AS (SELECT doc_id, w AS term, min(i) AS fpos, max(l) AS l
       FROM pos GROUP BY 1, 2),
ag AS (SELECT term, sum(fpos * 1.0 / l) AS s,
              count(*)::BIGINT AS df
       FROM fp GROUP BY 1)
SELECT term, df, round(s / df, 6) AS mean_first_pos
FROM ag WHERE df >= 10
QUALIFY row_number() OVER (ORDER BY round(s / df, 6), term) <= 20""",
        # Monroe log-odds with informative Dirichlet prior between two
        # sources; same float expression order as the engine
        "fightin_words": _TOKS + """,
lab AS (SELECT doc_id, source FROM documents),
tt AS (SELECT l.source AS src, t.term, count(*)::BIGINT AS tf
       FROM toks t JOIN lab l USING (doc_id)
       WHERE l.source IN ('src0', 'src1') GROUP BY 1, 2),
y AS (SELECT term,
             sum(CASE WHEN src = 'src0' THEN tf ELSE 0 END)::BIGINT
                 AS ya,
             sum(CASE WHEN src = 'src1' THEN tf ELSE 0 END)::BIGINT
                 AS yb
      FROM tt GROUP BY 1),
n AS (SELECT sum(ya)::BIGINT AS na, sum(yb)::BIGINT AS nb FROM y),
calc AS (SELECT y.term, y.ya, y.yb, n.na, n.nb,
                (10.0 * (y.ya + y.yb)) / (n.na + n.nb) AS alpha
         FROM y CROSS JOIN n),
zt AS (SELECT term, ya, yb,
              (ln((ya + alpha) / (na + 10.0 - ya - alpha))
               - ln((yb + alpha) / (nb + 10.0 - yb - alpha)))
              / sqrt(1.0 / (ya + alpha) + 1.0 / (yb + alpha)) AS z
       FROM calc)
SELECT term, ya AS count_a, yb AS count_b, round(z, 6) AS z
FROM zt
QUALIFY row_number() OVER (ORDER BY abs(z) DESC, term) <= 20""",
        # Otsu split of the doc-length histogram: exact integer
        # moments, identical float variance expression, ties -> min v
        "otsu_threshold": _TOKS + """,
dt AS (SELECT d.doc_id, count(t.term)::BIGINT AS v
       FROM documents d LEFT JOIN toks t USING (doc_id)
       GROUP BY 1),
h AS (SELECT v, count(*)::BIGINT AS c FROM dt GROUP BY 1),
tot AS (SELECT sum(c)::BIGINT AS n, sum(v * c)::BIGINT AS s FROM h),
cum AS (SELECT v, CAST(sum(c) OVER w AS BIGINT) AS w0,
               CAST(sum(v * c) OVER w AS BIGINT) AS s0
        FROM h WINDOW w AS (ORDER BY v ROWS UNBOUNDED PRECEDING)),
cand AS (SELECT cum.v, cum.w0, tot.n - cum.w0 AS w1,
                (cum.w0 * (tot.n - cum.w0))::DOUBLE
                * (((cum.s0 * 1.0 / cum.w0)
                    - ((tot.s - cum.s0) * 1.0 / (tot.n - cum.w0)))
                   * ((cum.s0 * 1.0 / cum.w0)
                      - ((tot.s - cum.s0)
                         * 1.0 / (tot.n - cum.w0)))) AS var
         FROM cum CROSS JOIN tot
         WHERE cum.w0 > 0 AND tot.n - cum.w0 > 0)
SELECT v AS threshold, w0 AS n_short, w1 AS n_long,
       round(var, 6) AS between_var
FROM cand
QUALIFY row_number() OVER (ORDER BY var DESC, v) = 1""",
        # Heaps fit: OLS of ln(cum_vocab) on ln(cum_tokens) over the
        # vocab_growth curve
        "heaps_fit": _TOKS + """,
nt AS (SELECT d.doc_id, count(t.term)::BIGINT AS nt
       FROM documents d LEFT JOIN toks t USING (doc_id)
       GROUP BY 1),
firsts AS (SELECT term, min(doc_id) AS fd FROM toks GROUP BY 1),
nv AS (SELECT fd AS doc_id, count(*)::BIGINT AS nv FROM firsts
       GROUP BY 1),
curve AS (SELECT nt.doc_id,
                 CAST(sum(nt.nt) OVER w AS BIGINT) AS ct,
                 CAST(sum(coalesce(nv.nv, 0)) OVER w AS BIGINT) AS cv
          FROM nt LEFT JOIN nv USING (doc_id)
          WINDOW w AS (ORDER BY nt.doc_id ROWS UNBOUNDED PRECEDING)),
pts AS (SELECT ln(ct * 1.0) AS x, ln(cv * 1.0) AS y FROM curve
        WHERE ct > 0 AND cv > 0),
m AS (SELECT count(*)::BIGINT AS n, sum(x) AS sx, sum(y) AS sy,
             sum(x * x) AS sxx, sum(x * y) AS sxy FROM pts)
SELECT n AS n_points,
       round(exp((sy - ((n * sxy - sx * sy)
                        / (n * sxx - sx * sx)) * sx) / n), 6) AS k,
       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS beta
FROM m""",
        # Burrows' Delta: z-scored relative top-30-term frequencies
        # across sources, mean |z_a - z_b| per pair
        "burrows_delta": _TOKS + """,
lab AS (SELECT doc_id, source FROM documents),
tt AS (SELECT l.source AS src, t.term, count(*)::BIGINT AS tf
       FROM toks t JOIN lab l USING (doc_id) GROUP BY 1, 2),
tot AS (SELECT l.source AS src, count(*)::BIGINT AS n
        FROM toks t JOIN lab l USING (doc_id) GROUP BY 1),
top AS (SELECT term FROM (SELECT term, sum(tf) AS tf FROM tt
                          GROUP BY 1)
        QUALIFY row_number() OVER (ORDER BY tf DESC, term) <= 30),
grid AS (SELECT s.src, tp.term
         FROM (SELECT DISTINCT src FROM tot) s CROSS JOIN top tp),
f AS (SELECT g.src, g.term,
             coalesce(tt.tf, 0) * 1.0 / tot.n AS f
      FROM grid g
      LEFT JOIN tt ON tt.src = g.src AND tt.term = g.term
      JOIN tot ON tot.src = g.src),
z AS (SELECT src, term,
             CASE WHEN stddev_pop(f) OVER (PARTITION BY term) > 0
                  THEN (f - avg(f) OVER (PARTITION BY term))
                       / stddev_pop(f) OVER (PARTITION BY term)
                  ELSE 0 END AS z
      FROM f)
SELECT a.src AS source_a, b.src AS source_b,
       round(avg(abs(a.z - b.z)), 6) AS delta
FROM z a JOIN z b ON a.term = b.term AND a.src < b.src
GROUP BY 1, 2""",
        # rank-biased overlap between two sources' top-50 term lists
        "rbo_source_drift": _TOKS + """,
lab AS (SELECT doc_id, source FROM documents),
tt AS (SELECT l.source AS src, t.term, count(*)::BIGINT AS tf
       FROM toks t JOIN lab l USING (doc_id)
       WHERE l.source IN ('src0', 'src1') GROUP BY 1, 2),
a AS (SELECT term, row_number() OVER (ORDER BY tf DESC, term) AS r
      FROM tt WHERE src = 'src0' QUALIFY r <= 50),
b AS (SELECT term, row_number() OVER (ORDER BY tf DESC, term) AS r
      FROM tt WHERE src = 'src1' QUALIFY r <= 50),
dd AS (SELECT unnest(range(1, 51))::BIGINT AS d),
ov AS (SELECT dd.d,
              (SELECT count(*) FROM a JOIN b USING (term)
               WHERE a.r <= dd.d AND b.r <= dd.d)::BIGINT AS c
       FROM dd)
SELECT 50::BIGINT AS depth,
       (SELECT c FROM ov WHERE d = 50) AS overlap_at_depth,
       round(sum(pow(0.9, d - 1) * c / d)
             / sum(pow(0.9, d - 1)), 6) AS rbo
FROM ov""",
        # Gini of per-source doc counts: integer numerator over counts
        # sorted (count, source), one float division
        "source_gini": """
WITH c AS (SELECT source, count(*)::BIGINT AS c
           FROM documents GROUP BY 1),
r AS (SELECT c, row_number() OVER (ORDER BY c, source) AS i FROM c),
s AS (SELECT count(*)::BIGINT AS n, sum(c)::BIGINT AS tot,
             sum((2 * i - (SELECT count(*) FROM r) - 1)
                 * c)::BIGINT AS num
      FROM r)
SELECT n AS n_groups, tot AS total,
       round(num * 1.0 / (n * tot), 6) AS gini FROM s""",
        # information gain of term presence w.r.t. source: split
        # entropy over present/absent partitions, natural log
        "info_gain_terms": _TOKS + """,
lab AS (SELECT doc_id, source FROM documents),
nl AS (SELECT source, count(*)::BIGINT AS n FROM documents
       GROUP BY 1),
nn AS (SELECT count(*)::DOUBLE AS n FROM documents),
hb AS (SELECT -sum((nl.n / nn.n) * ln(nl.n / nn.n)) AS h
       FROM nl CROSS JOIN nn),
tp AS (SELECT t.term, l.source,
              count(DISTINCT t.doc_id)::BIGINT AS m
       FROM toks t JOIN lab l USING (doc_id) GROUP BY 1, 2),
tdf AS (SELECT term, sum(m)::DOUBLE AS df FROM tp GROUP BY 1),
hp AS (SELECT tp.term,
              -sum((tp.m / tdf.df) * ln(tp.m / tdf.df)) AS h
       FROM tp JOIN tdf USING (term) GROUP BY tp.term),
ab AS (SELECT tdf.term, nl.source,
              (nl.n - coalesce(tp.m, 0))::DOUBLE AS m,
              nn.n - tdf.df AS na
       FROM tdf CROSS JOIN nl
       LEFT JOIN tp ON tp.term = tdf.term
                   AND tp.source = nl.source
       CROSS JOIN nn),
ha AS (SELECT term,
              CASE WHEN max(na) > 0
                   THEN -sum(CASE WHEN m > 0
                                  THEN (m / na) * ln(m / na)
                                  ELSE 0 END)
                   ELSE 0 END AS h
       FROM ab GROUP BY term)
SELECT tdf.term, tdf.df::BIGINT AS df,
       round(hb.h - (tdf.df / nn.n) * hp.h
             - ((nn.n - tdf.df) / nn.n) * ha.h, 6) AS info_gain
FROM tdf JOIN hp USING (term) JOIN ha USING (term)
CROSS JOIN hb CROSS JOIN nn
ORDER BY (hb.h - (tdf.df / nn.n) * hp.h
          - ((nn.n - tdf.df) / nn.n) * ha.h) DESC, tdf.term
LIMIT 20""",
        # WebDataset sink stats: the routed content per tar shard
        "webdataset_shards": """
SELECT (doc_id % 8)::BIGINT AS shard,
       count(*)::BIGINT AS n_docs,
       sum(length(coalesce(text, '')))::BIGINT AS n_text_chars
FROM documents GROUP BY 1""",
        # multinomial NB self-classification: add-1 smoothing over the
        # corpus vocabulary, argmax tie-break by label asc
        "nb_classify": _TOKS + """,
dt AS (SELECT doc_id, term, count(*)::BIGINT AS tf
       FROM toks GROUP BY 1, 2),
lab AS (SELECT doc_id, source FROM documents),
cnt AS (SELECT l.source, t.term, count(*)::BIGINT AS c
        FROM toks t JOIN lab l USING (doc_id) GROUP BY 1, 2),
ctot AS (SELECT source, sum(c)::DOUBLE AS n FROM cnt GROUP BY 1),
vv AS (SELECT count(DISTINCT term)::DOUBLE AS v FROM toks),
pri AS (SELECT source, count(*)::BIGINT AS dc
        FROM documents GROUP BY 1),
nd AS (SELECT count(*)::DOUBLE AS n FROM documents),
sc AS (SELECT dt.doc_id, ct.source,
              ln(pri.dc / nd.n)
              + sum(dt.tf * ln((coalesce(cnt.c, 0) + 1.0)
                               / (ct.n + vv.v))) AS score
       FROM dt CROSS JOIN ctot ct
       LEFT JOIN cnt ON cnt.source = ct.source
                    AND cnt.term = dt.term
       JOIN pri ON pri.source = ct.source
       CROSS JOIN vv CROSS JOIN nd
       GROUP BY dt.doc_id, ct.source, ct.n, pri.dc, nd.n)
SELECT doc_id, source AS predicted, round(score, 6) AS score
FROM sc
QUALIFY row_number() OVER (PARTITION BY doc_id
                           ORDER BY score DESC, source) = 1""",
        "embedding_centroids": """
WITH x AS (SELECT label, unnest(range(1, 65))::BIGINT AS dim,
                  unnest(CAST(embedding AS DOUBLE[])) AS v
           FROM embeddings)
SELECT label, dim, round(sum(v) / count(*), 6) AS centroid
FROM x GROUP BY label, dim""",
        "cosine_neardup_pairs": """
SELECT least(a.vec_id, b.vec_id)::BIGINT AS vec_a,
       greatest(a.vec_id, b.vec_id)::BIGINT AS vec_b,
       round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[])), 6) AS cos
FROM embeddings a JOIN embeddings b
  ON a.label = b.label AND a.vec_id < b.vec_id
WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                             CAST(b.embedding AS DOUBLE[])) >= {th}""".format(
            th=COS_NEARDUP_THRESHOLD
        ),
        "pricing_summary": """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       sum(round(l_extendedprice * 100)::BIGINT) / 100.0
           AS sum_base_price,
       (sum(round(l_extendedprice * (1.0 - l_discount)
                  * 10000)::BIGINT) + 50) // 100 / 100.0
           AS sum_disc_price,
       count(*)::BIGINT AS count_order,
       round(sum(l_quantity) / count(*), 6) AS avg_qty
FROM lineitem WHERE l_shipdate < TIMESTAMP '1998-09-01'
GROUP BY l_returnflag, l_linestatus""",
        "top_orders": """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
        "revenue_filter": """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""",
        "semi_join_customers": """
SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400)""",
        "orders_by_segment": """
SELECT c_mktsegment, count(*)::BIGINT AS n_orders,
       round(sum(o_totalprice), 2) AS total_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment""",
        "window_agg": """
SELECT event_type, date_trunc('hour', ts) AS window_start,
       count(*)::BIGINT AS n_events, round(sum(value), 2) AS sum_value
FROM events GROUP BY event_type, date_trunc('hour', ts)""",
        # watermark semantics: md5-rank arrival replay, running-max
        # watermark minus allowed lateness, closed-window rows dropped;
        # generated from the SAME specs the engine call uses
        "window_agg_late": window_agg_late_oracle_sql(
            window=LATE_WINDOW, lateness=LATE_ALLOWED),
        "hopping_window_agg": """
WITH b AS (SELECT date_trunc('hour', min(ts)) AS lo, max(ts) AS hi
           FROM events),
g AS (SELECT unnest(generate_series(
          (SELECT lo FROM b) - INTERVAL 2 HOUR,
          (SELECT hi FROM b), INTERVAL 1 HOUR)) AS window_start)
SELECT e.event_type, g.window_start,
       count(*)::BIGINT AS n_events, round(sum(e.value), 2) AS sum_value
FROM events e JOIN g ON e.ts >= g.window_start
                    AND e.ts < g.window_start + INTERVAL 3 HOUR
GROUP BY e.event_type, g.window_start""",
        "asof_last_purchase": """
SELECT e.event_id, e.user_id, e.event_type, e.value,
       p.value AS last_purchase_value
FROM events e ASOF LEFT JOIN (
    SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
) p ON e.user_id = p.user_id AND e.ts >= p.ts""",
        "asof_last_purchase_partitioned": """
SELECT e.event_id, e.user_id, e.event_type, e.value,
       p.value AS last_purchase_value
FROM events e ASOF LEFT JOIN (
    SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
) p ON e.user_id = p.user_id AND e.ts >= p.ts""",
        "orders_customer_join": """
SELECT o_orderkey, o_custkey, o_totalprice, c_mktsegment
FROM orders JOIN customer ON o_custkey = c_custkey""",
        "orders_customer_left_join": """
SELECT o_orderkey, o_custkey, c.c_mktsegment
FROM orders LEFT JOIN (SELECT * FROM customer
                       WHERE c_mktsegment = 'BUILDING') c
     ON o_custkey = c_custkey""",
        "train_val_split": """
SELECT doc_id, lang,
       CASE WHEN md5_number_lower(CAST(doc_id AS VARCHAR)) % 100 < 10
            THEN 'val' ELSE 'train' END AS split
FROM documents""",
        "top_docs_per_lang": """
SELECT doc_id, lang, n_chars FROM documents
QUALIFY row_number() OVER (
    PARTITION BY lang ORDER BY n_chars DESC, doc_id) <= 2""",
        # gap-based sessionization: ORDER BY ts, event_id pins the tie
        # order; only the first row of a tied-ts block can carry a
        # session boundary (intra-block gaps are 0), so the grouping is
        # order-invariant — the same argument that makes the Ray side's
        # lexsort deterministic.
        "sessions": """
WITH o AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
              OR ts - lag(ts) OVER w > INTERVAL 1440 MINUTE
              THEN 1 ELSE 0 END AS is_new
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id, ts, value,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS sid
  FROM o
)
SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
       count(*)::BIGINT AS n_events, round(sum(value), 6) AS total_value
FROM s GROUP BY user_id, sid""",
        # containment join against the same session spans: BETWEEN on
        # (key-matched) non-overlapping intervals
        "session_attribution": """
WITH o AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
              OR ts - lag(ts) OVER w > INTERVAL 1440 MINUTE
              THEN 1 ELSE 0 END AS is_new
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id, ts,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS sid
  FROM o
), spans AS (
  SELECT user_id, min(ts) AS session_start, max(ts) AS session_end
  FROM s GROUP BY user_id, sid
)
SELECT e.event_id, e.user_id, e.ts, sp.session_start
FROM events e JOIN spans sp
  ON e.user_id = sp.user_id
 AND e.ts BETWEEN sp.session_start AND sp.session_end""",
        # quantile_cont == numpy's default linear-interpolation estimator
        "group_quantiles": """
SELECT l_returnflag,
       round(quantile_cont(l_extendedprice, 0.25), 6) AS q25,
       round(quantile_cont(l_extendedprice, 0.50), 6) AS q50,
       round(quantile_cont(l_extendedprice, 0.75), 6) AS q75,
       round(quantile_cont(l_extendedprice, 0.95), 6) AS q95
FROM lineitem GROUP BY l_returnflag""",
        "customers_without_orders": """
SELECT c_custkey, c_mktsegment FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_totalprice > 300000)""",
        "tfidf_topk": _TOKS + """,
p AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2),
d AS (SELECT term, count(*)::BIGINT AS df FROM p GROUP BY 1),
n AS (SELECT count(*)::DOUBLE AS n_docs FROM documents),
sc AS (SELECT doc_id, term, round(tf * ln(n_docs / df), 6) AS score
       FROM p JOIN d USING (term) CROSS JOIN n)
SELECT doc_id, term, score FROM sc
QUALIFY row_number() OVER (
    PARTITION BY doc_id ORDER BY score DESC, term) <= 3""",
        # GPT-style sequence packing: global token prefix sum in doc_id
        # order, sequence boundary every 512 tokens
        "pack_sequences": _TOKS + """,
dl AS (SELECT d.doc_id, count(t.term)::BIGINT AS n_tokens
       FROM documents d LEFT JOIN toks t USING (doc_id) GROUP BY 1),
pre AS (SELECT doc_id, n_tokens,
        coalesce(sum(n_tokens) OVER (ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS st
        FROM dl)
SELECT doc_id, n_tokens, (st // 512)::BIGINT AS seq_id,
       (st % 512)::BIGINT AS seq_offset FROM pre""",
        "bigram_counts": """
WITH arr AS (SELECT doc_id,
    list_filter(regexp_split_to_array(lower(text), '\\s+'),
                x -> x <> '') AS a FROM documents),
bg AS (SELECT a[i] || ' ' || a[i+1] AS bigram
       FROM arr, unnest(range(1, len(a))) AS t(i)),
c AS (SELECT bigram, count(*)::BIGINT AS n FROM bg GROUP BY 1)
SELECT bigram, n FROM c ORDER BY n DESC, bigram LIMIT 50""",
        # boolean-AND retrieval: same scores CTE, restricted to docs
        # matching EVERY distinct query term
        "bm25_conjunctive": _BM25_CTES_CONJ + """,
hits AS (SELECT p.doc_id FROM p JOIN q USING (term)
         GROUP BY 1
         HAVING count(DISTINCT p.term) = (SELECT count(*) FROM q))
SELECT s.doc_id, round(s.raw, 6) AS score
FROM scores s JOIN hits USING (doc_id)
ORDER BY s.raw DESC, s.doc_id LIMIT 20""",
        # minimum-should-match: docs with >= 2 distinct query terms,
        # scored by the contributions of the terms they have (the
        # scores CTE already sums only present terms)
        "bm25_msm": _BM25_CTES_CONJ + """,
hits AS (SELECT p.doc_id FROM p JOIN q USING (term)
         GROUP BY 1
         HAVING count(DISTINCT p.term) >= 2)
SELECT s.doc_id, round(s.raw, 6) AS score
FROM scores s JOIN hits USING (doc_id)
ORDER BY s.raw DESC, s.doc_id LIMIT 20""",
        # classic VSM: tf·idf vectors, TRUE cosine (doc norm over ALL
        # the doc's terms); w = tf * ln(N/df)
        "vsm_cosine_topk": _TOKS + f""",
p AS (SELECT term, doc_id, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2),
s AS (SELECT count(*)::DOUBLE AS n FROM documents),
d AS (SELECT term, count(*)::DOUBLE AS df FROM p GROUP BY 1),
w AS MATERIALIZED (SELECT p.doc_id, p.term, p.tf * ln(s.n / d.df) AS w
     FROM p JOIN d USING (term) CROSS JOIN s),
nrm AS (SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM w GROUP BY 1),
q(term, qtf) AS (VALUES {BM25_QUERY_SQL_TERMS}),
qw AS (SELECT q.term, q.qtf * ln(s.n / d.df) AS wq
       FROM q JOIN d USING (term) CROSS JOIN s),
qn AS (SELECT sqrt(sum(wq * wq)) AS qn FROM qw),
dots AS (SELECT w.doc_id, sum(w.w * qw.wq) AS dot
         FROM w JOIN qw USING (term) GROUP BY 1)
SELECT dots.doc_id, round(dot / (nrm.nrm * qn.qn), 6) AS score
FROM dots JOIN nrm USING (doc_id) CROSS JOIN qn
ORDER BY score DESC, dots.doc_id LIMIT 20""",
        # per-doc OOV rate vs the corpus top-20 terms by total tf
        "oov_rate": _TOKS + """,
tot AS (SELECT term, count(*)::BIGINT AS c FROM toks GROUP BY 1),
vocab AS (SELECT term FROM tot ORDER BY c DESC, term LIMIT 20)
SELECT doc_id, count(*)::BIGINT AS n_tokens,
       round(avg(CASE WHEN term IN (SELECT term FROM vocab)
                 THEN 0.0 ELSE 1.0 END), 6) AS oov_rate
FROM toks GROUP BY 1""",
        # boolean-NOT retrieval (MUST_NOT): same scores CTE, minus any
        # doc containing an excluded term; idf/avgdl stay full-corpus
        "bm25_not": _BM25_CTES + f""",
nq(term) AS (VALUES {NOT_TERMS_SQL}),
ex AS (SELECT DISTINCT toks.doc_id FROM toks JOIN nq USING (term))
SELECT s.doc_id, round(s.raw, 6) AS score
FROM scores s ANTI JOIN ex ON s.doc_id = ex.doc_id
ORDER BY s.raw DESC, s.doc_id LIMIT 20""",
        # tombstone deletes (Lucene semantics): scores keep full-corpus
        # stats; deleted docs are masked from the result set
        "bm25_with_deletes": _BM25_CTES + f"""
SELECT doc_id, round(raw, 6) AS score FROM scores
WHERE doc_id NOT IN ({', '.join(str(i) for i in DELETE_DOC_IDS)})""",
        # compaction: deletes EXPUNGED, stats recomputed — the whole
        # scores CTE re-derives from the filtered corpus (contrast
        # bm25_with_deletes, where stats stay stale)
        "bm25_after_compact": _BM25_CTES.replace(
            "FROM documents",
            "FROM (SELECT * FROM documents WHERE doc_id NOT IN "
            f"({', '.join(str(i) for i in DELETE_DOC_IDS)}))") + """
SELECT doc_id, round(raw, 6) AS score FROM scores""",
        # positional compaction (round-4 VERDICT item 7): phrase
        # search over the positions=True index after delete+compact —
        # positions are rewritten for EVERY surviving doc, so the
        # result is phrase_match minus the deleted ids
        "phrase_after_compact": """
WITH arr AS (SELECT doc_id,
    list_filter(regexp_split_to_array(lower(text), '\\s+'),
                x -> x <> '') AS a FROM documents
    WHERE doc_id NOT IN (%s))
SELECT doc_id, count(*)::BIGINT AS n_matches
FROM arr, unnest(range(1, len(a))) AS t(i)
WHERE a[i] = 'hash' AND a[i+1] = 'join'
GROUP BY 1""" % ", ".join(str(i) for i in DELETE_DOC_IDS),
        # lifecycle round trip: delete -> compact -> refresh re-adds
        # the deleted docs, so the index must score the FULL corpus
        # exactly like a never-touched build
        "bm25_after_compact_refresh": _BM25_CTES + """
SELECT doc_id, round(raw, 6) AS score FROM scores""",
        # attribute-filtered top-k: full-corpus idf/avgdl, candidate
        # set restricted by the attribute join
        "bm25_filtered": _BM25_CTES + f"""
SELECT s.doc_id, round(s.raw, 6) AS score
FROM scores s JOIN documents d ON s.doc_id = d.doc_id
WHERE d.lang = '{FILTER_LANG}'
ORDER BY s.raw DESC, s.doc_id LIMIT 20""",
        # more-like-this: the source doc's top-5 tf*idf terms (ties by
        # term asc) become an OR query with qtf=1; source doc excluded
        "more_like_this": _TOKS + f""",
p AS (SELECT term, doc_id, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks GROUP BY 1),
s AS (SELECT count(*)::DOUBLE AS n, sum(dl)::DOUBLE / count(*) AS avgdl FROM dl),
d AS (SELECT term, count(*)::DOUBLE AS df FROM p GROUP BY 1),
sel AS (SELECT p.term,
               ROW_NUMBER() OVER (
                 ORDER BY p.tf * ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5))
                          DESC, p.term ASC) AS rn
        FROM p JOIN d USING (term) CROSS JOIN s
        WHERE p.doc_id = {MLT_DOC_ID}),
q AS (SELECT term, 1::BIGINT AS qtf FROM sel WHERE rn <= 5),
scores AS (
  SELECT p.doc_id,
         sum(q.qtf * ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5)) *
             (p.tf * (1.2 + 1)) /
             (p.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl))) AS raw
  FROM p JOIN q USING (term) JOIN d USING (term)
       JOIN dl ON p.doc_id = dl.doc_id CROSS JOIN s
  GROUP BY p.doc_id)
SELECT doc_id, round(raw, 6) AS score FROM scores
WHERE doc_id <> {MLT_DOC_ID}
ORDER BY raw DESC, doc_id LIMIT 20""",
        # wildcard retrieval: q = every distinct corpus term LIKE
        # '{p}%' with qtf=1 (the dictionary expansion the index-side
        # range scan performs), then the standard BM25 scores CTE
        "prefix_search": _TOKS + f""",
p AS (SELECT term, doc_id, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks GROUP BY 1),
s AS (SELECT count(*)::DOUBLE AS n, sum(dl)::DOUBLE / count(*) AS avgdl FROM dl),
d AS (SELECT term, count(*)::DOUBLE AS df FROM p GROUP BY 1),
q AS (SELECT term, 1::BIGINT AS qtf FROM d
      WHERE term LIKE '{PREFIX_QUERY}%'),
scores AS (
  SELECT p.doc_id,
         sum(q.qtf * ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5)) *
             (p.tf * (1.2 + 1)) /
             (p.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl))) AS raw
  FROM p JOIN q USING (term) JOIN d USING (term)
       JOIN dl ON p.doc_id = dl.doc_id CROSS JOIN s
  GROUP BY p.doc_id)
SELECT doc_id, round(raw, 6) AS score
FROM scores ORDER BY raw DESC, doc_id LIMIT 20""",
        # fuzzy dictionary lookup: vocabulary terms within edit
        # distance 1 of each typo probe (the SQL form is the O(V x P)
        # cross join the SymSpell deletion-key path avoids)
        "fuzzy_terms": _TOKS + f""",
v AS (SELECT DISTINCT term FROM toks),
probes(probe) AS (VALUES {FUZZY_PROBES_SQL})
SELECT probe, term, levenshtein(probe, term)::BIGINT AS dist
FROM probes CROSS JOIN v
WHERE levenshtein(probe, term) <= 1""",
        # exact token-sequence occurrences (overlaps count); only docs
        # with >= 1 match
        "phrase_match": """
WITH arr AS (SELECT doc_id,
    list_filter(regexp_split_to_array(lower(text), '\\s+'),
                x -> x <> '') AS a FROM documents)
SELECT doc_id, count(*)::BIGINT AS n_matches
FROM arr, unnest(range(1, len(a))) AS t(i)
WHERE a[i] = 'hash' AND a[i+1] = 'join'
GROUP BY 1""",
        # faceted search: matching-doc counts per (lang, source)
        "facet_counts": _TOKS + """,
hits AS (SELECT DISTINCT doc_id FROM toks
         WHERE term IN ('hash', 'join'))
SELECT lang, source, count(*)::BIGINT AS n
FROM documents JOIN hits USING (doc_id)
GROUP BY 1, 2""",
        # keyword-in-context: first query-term position (0-based) and
        # the +-3-token window around it, space-joined; DuckDB slices
        # are 1-based inclusive and clamp, matching the Python max/min
        "kwic_snippets": """
WITH arr AS (SELECT doc_id,
    list_filter(regexp_split_to_array(lower(text), '\\s+'),
                x -> x <> '') AS a FROM documents),
hit AS (SELECT doc_id, min(i) AS i0
        FROM arr, unnest(range(1, len(a) + 1)) AS t(i)
        WHERE a[i] IN ('hash', 'join') GROUP BY 1)
SELECT arr.doc_id, (i0 - 1)::BIGINT AS pos,
       array_to_string(a[greatest(1, i0 - 3):(i0 + 3)], ' ') AS snippet
FROM arr JOIN hit USING (doc_id)""",
        # ordered span-near: a-positions with a b within slop gaps
        "span_near": """
WITH arr AS (SELECT doc_id,
    list_filter(regexp_split_to_array(lower(text), '\\s+'),
                x -> x <> '') AS a FROM documents),
pos AS (SELECT doc_id, i, a[i] AS w
        FROM arr, unnest(range(1, len(a) + 1)) AS t(i)),
hits AS (SELECT DISTINCT pa.doc_id, pa.i
         FROM pos pa JOIN pos pb ON pa.doc_id = pb.doc_id
         WHERE pa.w = 'hash' AND pb.w = 'join'
           AND pb.i > pa.i AND pb.i - pa.i <= 4)
SELECT doc_id, count(*)::BIGINT AS n_spans FROM hits GROUP BY 1""",
        # wildcard-slot phrase "a * b": b exactly gap+1 = 2 ahead of a
        "phrase_gap": """
WITH arr AS (SELECT doc_id,
    list_filter(regexp_split_to_array(lower(text), '\\s+'),
                x -> x <> '') AS a FROM documents),
pos AS (SELECT doc_id, i, a[i] AS w
        FROM arr, unnest(range(1, len(a) + 1)) AS t(i)),
hits AS (SELECT pa.doc_id, pa.i
         FROM pos pa JOIN pos pb ON pa.doc_id = pb.doc_id
         WHERE pa.w = 'hash' AND pb.w = 'join'
           AND pb.i = pa.i + 2)
SELECT doc_id, count(*)::BIGINT AS n_spans FROM hits GROUP BY 1""",
        # min |pos_a - pos_b| per doc containing both terms
        "term_proximity": """
WITH arr AS (SELECT doc_id,
    list_filter(regexp_split_to_array(lower(text), '\\s+'),
                x -> x <> '') AS a FROM documents),
pos AS (SELECT doc_id, i, a[i] AS w
        FROM arr, unnest(range(1, len(a) + 1)) AS t(i))
SELECT pa.doc_id, min(abs(pa.i - pb.i))::BIGINT AS min_dist
FROM pos pa JOIN pos pb ON pa.doc_id = pb.doc_id
WHERE pa.w = 'hash' AND pb.w = 'join'
GROUP BY 1""",
        # per-doc unigram Shannon entropy; LEFT JOIN keeps zero-token
        # docs (entropy 0) that the toks CTE drops
        "token_entropy": _TOKS + """
, c AS (SELECT doc_id, term, count(*)::DOUBLE AS c FROM toks GROUP BY 1, 2),
n AS (SELECT doc_id, sum(c) AS n FROM c GROUP BY 1),
e AS (SELECT c.doc_id, -sum((c.c / n.n) * ln(c.c / n.n)) AS ent
      FROM c JOIN n USING (doc_id) GROUP BY 1)
SELECT d.doc_id, coalesce(n.n, 0)::BIGINT AS n_tokens,
       coalesce(round(e.ent, 6), 0.0) AS entropy
FROM documents d LEFT JOIN n ON d.doc_id = n.doc_id
                 LEFT JOIN e ON d.doc_id = e.doc_id""",
        # per-doc KL(p_doc || p_corpus) over unigrams (DSIR-style)
        "corpus_divergence": _TOKS + """
, c AS (SELECT doc_id, term, count(*)::DOUBLE AS c FROM toks GROUP BY 1, 2),
n AS (SELECT doc_id, sum(c) AS n FROM c GROUP BY 1),
g AS (SELECT term, count(*)::DOUBLE AS gc FROM toks GROUP BY 1),
t AS (SELECT count(*)::DOUBLE AS total FROM toks),
k AS (SELECT c.doc_id,
             sum((c.c / n.n) * ln((c.c / n.n) / (g.gc / t.total))) AS kl
      FROM c JOIN n USING (doc_id) JOIN g USING (term) CROSS JOIN t
      GROUP BY 1)
SELECT d.doc_id, coalesce(n.n, 0)::BIGINT AS n_tokens,
       coalesce(round(k.kl, 6), 0.0) AS kl
FROM documents d LEFT JOIN n ON d.doc_id = n.doc_id
                 LEFT JOIN k ON d.doc_id = k.doc_id""",
        # (center, context) pairs at distance 1..2, both directions
        "skipgram_counts": """
WITH arr AS (SELECT doc_id,
    list_filter(regexp_split_to_array(lower(text), '\\s+'),
                x -> x <> '') AS a FROM documents),
pairs AS (
  SELECT a[i] || ' ' || a[i+1] AS sg
  FROM arr, unnest(range(1, len(a))) AS t(i)
  UNION ALL
  SELECT a[i+1] || ' ' || a[i]
  FROM arr, unnest(range(1, len(a))) AS t(i)
  UNION ALL
  SELECT a[i] || ' ' || a[i+2]
  FROM arr, unnest(range(1, len(a) - 1)) AS t(i)
  UNION ALL
  SELECT a[i+2] || ' ' || a[i]
  FROM arr, unnest(range(1, len(a) - 1)) AS t(i))
SELECT sg AS skipgram, count(*)::BIGINT AS n FROM pairs
GROUP BY 1 ORDER BY n DESC, skipgram LIMIT 50""",
        # Church & Hanks PMI over bigrams with a count floor; rank on
        # the ROUNDED pmi so ties break identically on both sides
        "pmi_topk": """
WITH arr AS (SELECT doc_id,
    list_filter(regexp_split_to_array(lower(text), '\\s+'),
                x -> x <> '') AS a FROM documents),
bg AS (SELECT a[i] AS w1, a[i+1] AS w2
       FROM arr, unnest(range(1, len(a))) AS t(i)),
cb AS (SELECT w1, w2, count(*)::BIGINT AS n FROM bg GROUP BY 1, 2),
cu AS (SELECT unnest(a) AS w FROM arr),
cuc AS (SELECT w, count(*)::DOUBLE AS c FROM cu GROUP BY 1),
n1 AS (SELECT count(*)::DOUBLE AS n FROM cu),
n2 AS (SELECT sum(n)::DOUBLE AS n FROM cb)
SELECT cb.w1 || ' ' || cb.w2 AS bigram, cb.n AS n,
       round(ln((cb.n / n2.n) / ((ua.c / n1.n) * (ub.c / n1.n))), 6)
           AS pmi
FROM cb JOIN cuc ua ON cb.w1 = ua.w JOIN cuc ub ON cb.w2 = ub.w
CROSS JOIN n1 CROSS JOIN n2
WHERE cb.n >= 5
ORDER BY pmi DESC, bigram LIMIT 50""",
        # deterministic epoch shuffle: pos = rank of the md5 twin
        "epoch_shuffle": """
SELECT doc_id, lang,
       (row_number() OVER (
            ORDER BY md5_number_lower('3-' || CAST(doc_id AS VARCHAR)),
                     doc_id) - 1)::BIGINT AS pos
FROM documents""",
        # benchmark decontamination: distinct 3-gram shingles shared
        # with the doc_id%25==0 'eval set' (same shingle convention as
        # the Jaccard family: case-preserved, whole-doc when <3 tokens)
        "decontaminate": """
WITH dd AS (SELECT doc_id,
            list_filter(regexp_split_to_array(text, '\\s+'),
                        x -> x <> '') AS arr FROM documents),
sh AS (SELECT doc_id, arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2] AS shingle
       FROM dd, unnest(range(1, len(arr) - 1)) AS t(i)
       UNION ALL
       SELECT doc_id, array_to_string(arr, ' ') FROM dd
       WHERE len(arr) BETWEEN 1 AND 2),
p AS (SELECT DISTINCT doc_id, shingle FROM sh),
bench AS (SELECT DISTINCT shingle FROM p WHERE doc_id % 25 = 0),
hits AS (SELECT c.doc_id, count(*)::BIGINT AS n_hits
         FROM p c JOIN bench b USING (shingle)
         WHERE c.doc_id % 25 <> 0 GROUP BY 1)
SELECT d.doc_id, coalesce(h.n_hits, 0)::BIGINT AS n_hits,
       (coalesce(h.n_hits, 0) > 0)::BIGINT AS contaminated
FROM (SELECT doc_id FROM documents WHERE doc_id % 25 <> 0) d
LEFT JOIN hits h USING (doc_id)""",
        # duplicate-span detection (substring dedup, Lee et al. 2022
        # shape): maximal spans whose k-char grams occur >=2 times in
        # the corpus; islands merged when consecutive dup positions are
        # <= k apart (adjacent/overlapping coverage windows)
        "dup_spans": _DUP_SPANS_SQL,
        # per-doc duplicate coverage: sum of (disjoint) maximal span
        # lengths, LEFT-joined back so clean docs report 0
        "dup_span_stats": f"""
SELECT d.doc_id, length(d.text)::BIGINT AS orig_len,
       coalesce(s.dup_chars, 0)::BIGINT AS dup_chars,
       (length(d.text) - coalesce(s.dup_chars, 0))::BIGINT AS clean_len
FROM documents d
LEFT JOIN (SELECT doc_id, sum(span_len)::BIGINT AS dup_chars
           FROM ({_DUP_SPANS_SQL}) GROUP BY doc_id) s USING (doc_id)""",
        # regex pattern scan (PII presets + two corpus-firing patterns);
        # counts on the ORIGINAL text, redacted_len cascades replaces in
        # sorted-name order (a_word, email, ipv4, sk_word) exactly as
        # the Ray side does
        "pattern_scan": f"""
SELECT doc_id,
  len(regexp_extract_all(coalesce(text, ''),
      '{SCAN_PATTERNS["a_word"]}'))::BIGINT AS n_a_word,
  len(regexp_extract_all(coalesce(text, ''),
      '{SCAN_PATTERNS["email"]}'))::BIGINT AS n_email,
  len(regexp_extract_all(coalesce(text, ''),
      '{SCAN_PATTERNS["ipv4"]}'))::BIGINT AS n_ipv4,
  len(regexp_extract_all(coalesce(text, ''),
      '{SCAN_PATTERNS["sk_word"]}'))::BIGINT AS n_sk_word,
  length(
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(coalesce(text, ''),
            '{SCAN_PATTERNS["a_word"]}', '<A_WORD>', 'g'),
          '{SCAN_PATTERNS["email"]}', '<EMAIL>', 'g'),
        '{SCAN_PATTERNS["ipv4"]}', '<IPV4>', 'g'),
      '{SCAN_PATTERNS["sk_word"]}', '<SK_WORD>', 'g'))::BIGINT
    AS redacted_len
FROM documents""",
        # deterministic per-stratum sampling: content-keyed md5 gate,
        # per-language permille rates (en capped, fr boosted)
        "stratified_sample": f"""
SELECT doc_id, text, lang, source, n_chars FROM documents
WHERE lang IS NOT NULL AND
      md5_number_lower('strat|' || lang || '|' ||
                       CAST(doc_id AS VARCHAR)) % 1000 <
      (CASE lang WHEN 'en' THEN {STRAT_RATES["en"]}
                 WHEN 'fr' THEN {STRAT_RATES["fr"]}
                 ELSE {STRAT_DEFAULT} END)""",
        # absolute per-group cap by md5-twin rank (nested samples)
        "lang_quota_sample": f"""
SELECT doc_id, lang FROM documents WHERE lang IS NOT NULL
QUALIFY row_number() OVER (
    PARTITION BY lang
    ORDER BY md5_number_lower('quota|' || lang || '|' ||
                              CAST(doc_id AS VARCHAR)), doc_id)
    <= {LANG_QUOTA}""",
        # format-breadth reads: oracles run over the PARQUET twin, so
        # a hash match proves the JSONL/CSV read path exactly
        "jsonl_source_counts": """
SELECT lang, source, count(*)::BIGINT AS n_docs
FROM documents GROUP BY 1, 2""",
        "csv_source_window_agg": """
SELECT event_type, date_trunc('hour', ts) AS window_start,
       count(*)::BIGINT AS n_events, round(sum(value), 2) AS sum_value
FROM events GROUP BY event_type, date_trunc('hour', ts)""",
        # cross-snapshot anti-join on text identity
        "incremental_dedup": """
SELECT d.doc_id FROM documents d
WHERE d.doc_id % 3 = 0
  AND NOT EXISTS (SELECT 1 FROM documents o
                  WHERE o.doc_id % 10 != 0 AND o.text = d.text)""",
        # population covariance of the embedding matrix, 1-based dims;
        # FLOAT values promote to DOUBLE in both engines before the
        # multiply, so E[xi*xj] agrees to rounding
        # JL sparse projection through the pinned splitmix matrix
        # (_rp_matrix_path writes it; all 1024 entries ship so every
        # (vec_id, dim) group exists even where r is 0)
        "funnel_counts": _funnel_sql(),
        # Markov transition counts over per-user event sequences
        "event_transitions": """
WITH e AS (SELECT user_id, event_type, ts, event_id FROM events
           WHERE user_id IS NOT NULL AND ts IS NOT NULL
             AND event_id IS NOT NULL AND event_type IS NOT NULL),
p AS (SELECT event_type AS from_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS to_type
      FROM e)
SELECT from_type, to_type, count(*)::BIGINT AS n
FROM p WHERE to_type IS NOT NULL GROUP BY 1, 2""",
        # per-group standardization, closed-form population std on
        # both engines (not stddev_pop's streaming algorithm)
        "value_zscores": """
WITH e AS (SELECT event_id, event_type, value FROM events
           WHERE event_id IS NOT NULL AND event_type IS NOT NULL
             AND value IS NOT NULL),
m AS (SELECT event_type, count(*)::DOUBLE AS n, sum(value)::DOUBLE AS s,
             sum(value * value)::DOUBLE AS ss FROM e GROUP BY 1),
st AS (SELECT event_type, s / n AS mean,
              sqrt(greatest(ss / n - (s / n) * (s / n), 0)) AS std FROM m)
SELECT e.event_id, e.event_type,
       round(CASE WHEN st.std > 0 THEN (e.value - st.mean) / st.std
                  ELSE 0 END, 6) AS z
FROM e JOIN st USING (event_type)""",
        # weekly active users + churn vs the following week
        "weekly_churn": """
WITH act AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS wk
             FROM events
             WHERE user_id IS NOT NULL AND ts IS NOT NULL)
SELECT CAST(a.wk AS TIMESTAMP) AS week, count(*)::BIGINT AS active,
       (count(*) FILTER (WHERE b.user_id IS NULL))::BIGINT AS churned
FROM act a LEFT JOIN act b
  ON b.user_id = a.user_id AND b.wk = a.wk + INTERVAL 7 DAY
GROUP BY 1""",
        # cohort = Monday-truncated week of the user's first event;
        # users = distinct users active `week_offset` weeks later
        "retention_cohorts": """
WITH act AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS wk
             FROM events
             WHERE user_id IS NOT NULL AND ts IS NOT NULL),
firsts AS (SELECT user_id, min(wk) AS cohort FROM act GROUP BY 1)
SELECT CAST(cohort AS TIMESTAMP) AS cohort,
       CAST(date_diff('day', cohort, wk) / 7 AS BIGINT) AS week_offset,
       count(*)::BIGINT AS users
FROM act JOIN firsts USING (user_id)
GROUP BY 1, 2""",
        # user-journey distribution: first-5 event-type path per user
        # (ts then event_id as the total order), counted
        "event_paths": """
WITH ranked AS (SELECT user_id, event_type,
                       row_number() OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS rn
                FROM events WHERE user_id IS NOT NULL),
paths AS (SELECT user_id,
                 string_agg(event_type, '>' ORDER BY rn) AS path
          FROM ranked WHERE rn <= 5 GROUP BY 1)
SELECT path, count(*)::BIGINT AS n_users FROM paths GROUP BY 1""",
        # Efraimidis-Spirakis weighted sample: race = ln(u)/w, u from
        # the md5 twin hash, top-n race keys win (12dp + doc_id pin
        # the order on both engines)
        "weighted_sample": """
WITH k AS (SELECT doc_id,
       round(ln((CAST(md5_number_lower('ws0|' || CAST(doc_id AS VARCHAR))
                      AS DOUBLE) + 1) / 18446744073709551616.0)
             / n_chars, 12) AS race
    FROM documents WHERE n_chars > 0)
SELECT doc_id, race FROM k ORDER BY race DESC, doc_id LIMIT 100""",
        # the same race, run independently per language (top-30 each)
        "weighted_sample_by_group": """
WITH k AS (SELECT lang, doc_id,
       round(ln((CAST(md5_number_lower('ws0|' || CAST(doc_id AS VARCHAR))
                      AS DOUBLE) + 1) / 18446744073709551616.0)
             / n_chars, 12) AS race
    FROM documents WHERE n_chars > 0)
SELECT lang, doc_id, race FROM k
QUALIFY row_number() OVER (PARTITION BY lang
                           ORDER BY race DESC, doc_id) <= 30""",
        # time-RANGE rolling frame, cent-exact sum contract (values
        # round half-away to int64 cents before summing on BOTH sides)
        "rolling_time_window": """
SELECT event_id, user_id,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER w
            AS BIGINT) AS w_cents,
       count(*) OVER w AS w_cnt
FROM events
WHERE event_id IS NOT NULL AND ts IS NOT NULL
      AND user_id IS NOT NULL AND value IS NOT NULL
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 24 HOURS PRECEDING
                   AND CURRENT ROW)""",
        "random_projection": f"""
WITH r AS (SELECT i, j, r FROM read_parquet('{_rp_matrix_path()}')),
x AS (SELECT vec_id, i, embedding[i]::DOUBLE AS xi
      FROM embeddings, unnest(range(1, {RP_D_IN + 1})) AS t(i))
SELECT x.vec_id, r.j AS dim, round(sum(x.xi * r.r), 6) AS val
FROM x JOIN r USING (i) GROUP BY 1, 2""",
        "embedding_covariance": """
WITH x AS (SELECT vec_id, i, embedding[i]::DOUBLE AS xi
           FROM embeddings, unnest(range(1, 65)) AS t(i)),
m AS (SELECT i, avg(xi) AS mu FROM x GROUP BY 1),
pairs AS (SELECT a.i AS i, b.i AS j, avg(a.xi * b.xi) AS exy
          FROM x a JOIN x b USING (vec_id) GROUP BY 1, 2)
SELECT p.i::BIGINT AS i, p.j::BIGINT AS j,
       round(p.exy - ma.mu * mb.mu, 6) AS cov
FROM pairs p JOIN m ma ON p.i = ma.i JOIN m mb ON p.j = mb.i""",
        # corpus-refresh diff between two derived snapshots (adds,
        # removals, content rewrites); unchanged rows omitted
        "snapshot_diff": """
WITH old AS (SELECT doc_id, text, 1 AS has_o FROM documents
             WHERE doc_id % 10 <> 0),
new AS (SELECT doc_id,
               CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END
                   AS text, 1 AS has_n
        FROM documents WHERE doc_id % 10 <> 1)
SELECT doc_id,
       CASE WHEN has_o IS NULL THEN 'added'
            WHEN has_n IS NULL THEN 'removed'
            ELSE 'changed' END AS status
FROM old o FULL OUTER JOIN new n USING (doc_id)
WHERE has_o IS NULL OR has_n IS NULL
      OR coalesce(o.text, '') <> coalesce(n.text, '')""",
        # corpus-trained add-one bigram LM, per-doc cross entropy:
        # P(w2|w1) = (c(w1 w2)+1)/(c_pred(w1)+V), V = distinct tokens
        "doc_lm_score": """
WITH dd AS (SELECT doc_id,
       list_filter(regexp_split_to_array(lower(text), '\\s+'),
                   x -> x <> '') AS arr
     FROM documents),
bg AS (SELECT doc_id, arr[i] AS w1, arr[i+1] AS w2
       FROM dd, unnest(range(1, len(arr))) AS t(i)),
cb AS (SELECT w1, w2, count(*)::DOUBLE AS cb FROM bg GROUP BY 1, 2),
cp AS (SELECT w1, count(*)::DOUBLE AS cp FROM bg GROUP BY 1),
v AS (SELECT count(DISTINCT term)::DOUBLE AS v FROM
      (SELECT unnest(arr) AS term FROM dd)),
sc AS (SELECT bg.doc_id, count(*)::BIGINT AS n_bigrams,
              round(avg(-ln((cb.cb + 1) / (cp.cp + v.v))), 6)
                  AS cross_entropy
       FROM bg JOIN cb USING (w1, w2) JOIN cp USING (w1) CROSS JOIN v
       GROUP BY bg.doc_id)
SELECT d.doc_id, coalesce(sc.n_bigrams, 0)::BIGINT AS n_bigrams,
       coalesce(sc.cross_entropy, 0)::DOUBLE AS cross_entropy
FROM documents d LEFT JOIN sc USING (doc_id)""",
        # CCNet-style per-language NTILE buckets over the LM score
        "lm_quality_buckets": """
WITH dd AS (SELECT doc_id,
       list_filter(regexp_split_to_array(lower(text), '\\s+'),
                   x -> x <> '') AS arr
     FROM documents),
bg AS (SELECT doc_id, arr[i] AS w1, arr[i+1] AS w2
       FROM dd, unnest(range(1, len(arr))) AS t(i)),
cb AS (SELECT w1, w2, count(*)::DOUBLE AS cb FROM bg GROUP BY 1, 2),
cp AS (SELECT w1, count(*)::DOUBLE AS cp FROM bg GROUP BY 1),
v AS (SELECT count(DISTINCT term)::DOUBLE AS v FROM
      (SELECT unnest(arr) AS term FROM dd)),
sc AS (SELECT bg.doc_id,
              round(avg(-ln((cb.cb + 1) / (cp.cp + v.v))), 6)
                  AS cross_entropy
       FROM bg JOIN cb USING (w1, w2) JOIN cp USING (w1) CROSS JOIN v
       GROUP BY bg.doc_id),
s AS (SELECT d.doc_id, d.lang,
             coalesce(sc.cross_entropy, 0)::DOUBLE AS cross_entropy
      FROM documents d LEFT JOIN sc USING (doc_id))
SELECT doc_id, lang, cross_entropy,
       row_number() OVER w::BIGINT AS rank,
       ntile(3) OVER w::BIGINT AS bucket
FROM s WINDOW w AS (PARTITION BY lang ORDER BY cross_entropy, doc_id)""",
        # exact global ranking by n_chars desc, doc_id tie-break
        "quality_rank": """
SELECT doc_id, n_chars,
       row_number() OVER (ORDER BY n_chars DESC, doc_id)::BIGINT AS rank
FROM documents""",
        "quality_ntile": """
SELECT doc_id, n_chars,
       row_number() OVER w::BIGINT AS rank,
       ntile(4) OVER w::BIGINT AS tile
FROM documents WINDOW w AS (ORDER BY n_chars DESC, doc_id)""",
        # Gopher-style repetition filters
        "repetition_scores": """
WITH arr AS (SELECT doc_id,
    list_filter(regexp_split_to_array(lower(text), '\\s+'),
                x -> x <> '') AS a FROM documents),
bg AS (SELECT doc_id, a[i] || ' ' || a[i+1] AS g
       FROM arr, unnest(range(1, len(a))) AS t(i)),
bc AS (SELECT doc_id, g, count(*)::BIGINT AS c FROM bg GROUP BY 1, 2),
b AS (SELECT doc_id, round(max(c)::DOUBLE / sum(c), 6) AS top_bigram_frac
      FROM bc GROUP BY 1),
tg AS (SELECT doc_id, a[i] || ' ' || a[i+1] || ' ' || a[i+2] AS g
       FROM arr, unnest(range(1, len(a) - 1)) AS t(i)),
tt AS (SELECT doc_id,
       round(1 - count(DISTINCT g)::DOUBLE / count(*), 6)
           AS dup_trigram_frac
       FROM tg GROUP BY 1)
SELECT d.doc_id, coalesce(b.top_bigram_frac, 0) AS top_bigram_frac,
       coalesce(tt.dup_trigram_frac, 0) AS dup_trigram_frac
FROM documents d LEFT JOIN b USING (doc_id) LEFT JOIN tt USING (doc_id)""",
        # the HLL twin is GENERATED from the estimator's own constants
        # (pipelines/sketch.hll_oracle_sql) — same hash, same rank,
        # same corrections, so the ESTIMATE matches exactly, not just
        # approximately
        # BPE encode under the pinned merge list: one chained
        # non-overlapping replace per merge over double-space-joined
        # symbols == the left-to-right greedy merge pass (equivalence
        # argument in rse_ray/pipelines/bpe.py)
        "bpe_token_counts": bpe_encode_oracle_sql(
            list(BPE_PINNED_MERGES)),
        "approx_ndistinct_users": hll_oracle_sql("user_id", "events"),
        "approx_ndistinct_by_type": hll_group_oracle_sql(
            "event_type", "user_id", "events"),
        # sliding 3h/1h-hop HLL: each event explodes into its 3
        # windows; register-max over a union IS the union's registers,
        # so the direct per-window hash equals the engine's hour-merge
        "hll_sliding": hll_group_oracle_sql(
            "window_start", "user_id",
            "(SELECT date_trunc('hour', e.ts) - to_hours(k.k) "
            "AS window_start, e.user_id FROM events e "
            "CROSS JOIN (VALUES (0), (1), (2)) k(k)) we"),
        "video_frame_sample": """
SELECT media_id, frame_idx, n_values, v_mean, v_std, v_min, v_max,
       width, height
FROM read_parquet('{golden}')""".format(
            golden=os.path.join(VIDEO_DIR, "golden_frames.parquet")),
        "image_resize": """
SELECT media_id, n_values, v_mean, v_std, v_min, v_max, width, height
FROM read_parquet('{golden}')""".format(
            golden=os.path.join(VIDEO_DIR, "golden_resized.parquet")),
        "heavy_hitter_terms": """
WITH toks0 AS (SELECT unnest(regexp_split_to_array(lower(text), '\\s+'))
                   AS term FROM documents),
toks AS (SELECT term FROM toks0 WHERE term <> '')
SELECT term, count(*)::BIGINT AS n FROM toks GROUP BY 1
HAVING count(*) >= 200 ORDER BY n DESC, term""",
        "recency_filter": """
SELECT event_id, ts, event_type FROM events
WHERE ts < TIMESTAMP '{as_of}' - INTERVAL {days} DAY""".format(
            as_of=RECENCY_AS_OF, days=RECENCY_DELAY_DAYS
        ),
        "distinct_lang_source": "SELECT DISTINCT lang, source FROM documents",
        # the sink's manifests must account for every event exactly
        # once under part = user_id % 16 (empty partitions included)
        "partitioned_sink": """
WITH p AS (SELECT unnest(range(0, 16))::BIGINT AS partition),
c AS (SELECT user_id % 16 AS part, count(*)::BIGINT AS n FROM events
      GROUP BY 1)
SELECT p.partition, coalesce(c.n, 0)::BIGINT AS n_rows
FROM p LEFT JOIN c ON c.part = p.partition""",
        # ROLLUP grains marked with the 'ALL' sentinel (GROUPING() — a
        # real NULL key would not be conflated with a rollup row)
        "rollup_counts": """
SELECT CASE WHEN GROUPING(lang) = 1 THEN 'ALL' ELSE lang END AS lang,
       CASE WHEN GROUPING(source) = 1 THEN 'ALL' ELSE source END AS source,
       count(*)::BIGINT AS n_docs,
       sum(n_chars)::BIGINT AS sum_chars
FROM documents GROUP BY ROLLUP(lang, source)""",
        "cube_counts": """
SELECT CASE WHEN GROUPING(lang) = 1 THEN 'ALL' ELSE lang END AS lang,
       CASE WHEN GROUPING(source) = 1 THEN 'ALL' ELSE source END AS source,
       count(*)::BIGINT AS n_docs,
       sum(n_chars)::BIGINT AS sum_chars
FROM documents GROUP BY CUBE(lang, source)""",
        # FULL OUTER with both unmatched directions non-empty
        "user_customer_full_join": """
WITH pu AS (SELECT user_id, count(*)::BIGINT AS n_events FROM events
            GROUP BY 1),
c AS (SELECT c_custkey, c_acctbal FROM customer WHERE c_custkey % 2 = 0)
SELECT coalesce(pu.user_id, c.c_custkey)::BIGINT AS join_key,
       pu.n_events, c.c_acctbal
FROM pu FULL OUTER JOIN c ON pu.user_id = c.c_custkey""",
        # adaptive per-source threshold: keep docs at/above their own
        # source's median length (round-6 pins the interpolated median)
        "above_group_median": """
WITH m AS (SELECT source, round(quantile_cont(n_chars, 0.5), 6) AS med
           FROM documents GROUP BY 1)
SELECT d.doc_id, d.source, d.n_chars
FROM documents d JOIN m USING (source)
WHERE d.n_chars >= m.med""",
        # within-doc chunk windows: size 64, stride 48, final partial
        # chunk kept; zero-token docs emit nothing
        "doc_chunks": _TOKS + """,
dl AS (SELECT doc_id, count(*)::BIGINT AS n FROM toks GROUP BY 1),
nc AS (SELECT doc_id, n,
              greatest(ceil(greatest(n - 16, 1)::DOUBLE / 48),
                       1)::BIGINT AS k
       FROM dl)
SELECT doc_id, i::BIGINT AS chunk_id, (i * 48)::BIGINT AS start_tok,
       least(64, n - i * 48)::BIGINT AS n_tokens
FROM nc, unnest(range(0, k)) AS t(i)""",
        # gap-filled hourly windows: every hour between min and max
        # gets a row, empty ones zeroed
        "dense_window_agg": """
WITH rng AS (SELECT date_trunc('hour', min(ts)) AS lo,
                    date_trunc('hour', max(ts)) AS hi FROM events),
spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR))
                 AS window_start FROM rng),
c AS (SELECT date_trunc('hour', ts) AS window_start,
             count(*)::BIGINT AS n, round(sum(value), 2) AS sv
      FROM events GROUP BY 1)
SELECT s.window_start, coalesce(c.n, 0)::BIGINT AS n_events,
       coalesce(c.sv, 0.0) AS sum_value
FROM spine s LEFT JOIN c USING (window_start)""",
        # composed pipeline: lang filter -> exact dedup (keep min id
        # per text) -> 512-token sequence packing over survivors
        "pretrain_pack": """
WITH base AS (SELECT min(doc_id) AS doc_id
              FROM documents WHERE lang = 'en' GROUP BY text),
docs2 AS (SELECT d.doc_id, d.text FROM documents d JOIN base USING (doc_id)),
toks0 AS (SELECT doc_id,
                 unnest(regexp_split_to_array(lower(text), '\\s+')) AS term
          FROM docs2),
toks AS (SELECT doc_id, term FROM toks0 WHERE term <> ''),
dl AS (SELECT d.doc_id, count(t.term)::BIGINT AS n_tokens
       FROM docs2 d LEFT JOIN toks t USING (doc_id) GROUP BY 1),
pre AS (SELECT doc_id, n_tokens,
        coalesce(sum(n_tokens) OVER (ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS st
        FROM dl)
SELECT doc_id, n_tokens, (st // 512)::BIGINT AS seq_id,
       (st % 512)::BIGINT AS seq_offset FROM pre""",
        # PIVOT with a declared column set (CASE-sum form — stable
        # schema regardless of which types appear)
        "event_type_pivot": """
SELECT user_id,
       count(*) FILTER (event_type = 'click')::BIGINT AS n_click,
       count(*) FILTER (event_type = 'error')::BIGINT AS n_error,
       count(*) FILTER (event_type = 'purchase')::BIGINT AS n_purchase,
       count(*) FILTER (event_type = 'signup')::BIGINT AS n_signup,
       count(*) FILTER (event_type = 'view')::BIGINT AS n_view
FROM events GROUP BY 1""",
        # PIVOT -> UNPIVOT round trip: ANSI form (declared-label cross
        # join + CASE pick) so declared-but-absent combos keep their
        # zero rows, exactly like the operator
        "event_type_unpivot": """
WITH pv AS (
SELECT user_id,
       count(*) FILTER (event_type = 'click')::BIGINT AS n_click,
       count(*) FILTER (event_type = 'error')::BIGINT AS n_error,
       count(*) FILTER (event_type = 'purchase')::BIGINT AS n_purchase,
       count(*) FILTER (event_type = 'signup')::BIGINT AS n_signup,
       count(*) FILTER (event_type = 'view')::BIGINT AS n_view
FROM events GROUP BY 1),
m(name) AS (VALUES ('click'), ('error'), ('purchase'), ('signup'),
                   ('view'))
SELECT pv.user_id, m.name AS event_type,
       CASE m.name WHEN 'click' THEN n_click WHEN 'error' THEN n_error
            WHEN 'purchase' THEN n_purchase WHEN 'signup' THEN n_signup
            ELSE n_view END AS n
FROM pv CROSS JOIN m""",
        # ranking window-function family over the (group, value)
        # histogram — ties share ranks exactly as the SQL definitions
        "rank_funcs": """
SELECT doc_id, lang, n_chars,
       rank() OVER w AS "rank", dense_rank() OVER w AS dense_rank,
       round(percent_rank() OVER w, 6) AS percent_rank,
       round(cume_dist() OVER w, 6) AS cume_dist
FROM documents
WINDOW w AS (PARTITION BY lang ORDER BY n_chars DESC)""",
        # long-format column profile; min/max only for numerics
        "profile_events": """
SELECT 'event_id' AS "column",
       count(*) FILTER (event_id IS NULL)::BIGINT AS n_nulls,
       count(DISTINCT event_id)::BIGINT AS n_distinct,
       round(min(event_id)::DOUBLE, 6) AS min_val,
       round(max(event_id)::DOUBLE, 6) AS max_val FROM events
UNION ALL
SELECT 'event_type', count(*) FILTER (event_type IS NULL)::BIGINT,
       count(DISTINCT event_type)::BIGINT, NULL, NULL FROM events
UNION ALL
SELECT 'ts', count(*) FILTER (ts IS NULL)::BIGINT,
       count(DISTINCT ts)::BIGINT, NULL, NULL FROM events
UNION ALL
SELECT 'user_id', count(*) FILTER (user_id IS NULL)::BIGINT,
       count(DISTINCT user_id)::BIGINT,
       round(min(user_id)::DOUBLE, 6), round(max(user_id)::DOUBLE, 6)
FROM events
UNION ALL
SELECT 'value', count(*) FILTER (value IS NULL)::BIGINT,
       count(DISTINCT value)::BIGINT,
       round(min(value)::DOUBLE, 6), round(max(value)::DOUBLE, 6)
FROM events""",
        # fixed-bin histogram over [0, 500) in 20 bins; the top edge
        # closes the last bin; empty bins emitted with n = 0
        "value_histogram": """
WITH b AS (SELECT unnest(range(0, 20))::BIGINT AS bin),
c AS (SELECT least(greatest(floor(value / 25.0), 0), 19)::BIGINT AS bin,
             count(*)::BIGINT AS n
      FROM events WHERE value IS NOT NULL GROUP BY 1)
SELECT b.bin, round(b.bin * 25.0, 6) AS bin_lo,
       coalesce(c.n, 0)::BIGINT AS n
FROM b LEFT JOIN c USING (bin)""",
        # row-frame window functions over each user's (ts, event_id)
        # order; value_delta is null on each user's first row
        "user_window_funcs": """
SELECT user_id, event_id,
       round(sum(value) OVER w, 6) AS cum_value,
       round(avg(value) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id
                              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
             6) AS moving_avg3,
       round(value - lag(value) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id),
             6) AS value_delta
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS UNBOUNDED PRECEDING)""",
        "json_props_sum": """
SELECT event_type,
       sum(CAST(json_extract_string(props, '$.k') AS BIGINT))::BIGINT AS sum_k
FROM events GROUP BY event_type""",
        "reference_relevance": _TOKS + """
, p AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2),
q(term, qtf) AS (VALUES {terms})
SELECT doc_id, sum(q.qtf * p.tf)::BIGINT AS relevance
FROM p JOIN q USING (term) GROUP BY doc_id""".format(
            terms=BM25_QUERY_SQL_TERMS
        ),
        # link-graph trio: oracled against the GENERATOR's golden
        # links/text (what the fixture planted, independent of the
        # extraction pipeline) via read_parquet
        "link_extract": """
SELECT src_url, dst_url
FROM read_parquet('{links}')""".format(
            links=os.path.join(LINKGRAPH_DIR, "golden_links.parquet")
        ),
        "backlink_counts": """
SELECT dst_url, count(*)::BIGINT AS n_backlinks
FROM read_parquet('{links}') GROUP BY dst_url""".format(
            links=os.path.join(LINKGRAPH_DIR, "golden_links.parquet")
        ),
        # double-sweep diameter bound: two recursive-CTE BFS passes
        # ((v, dep) UNION-dedup keeps the frontier polynomial)
        "diameter_estimate": """
WITH RECURSIVE e AS (
    SELECT DISTINCT src_url AS s, dst_url AS d
    FROM read_parquet('{links}')
    WHERE src_url IS NOT NULL AND dst_url IS NOT NULL),
seed AS (SELECT min(s) AS v FROM e),
b1(v, dep) AS (
    SELECT seed.v, 0 FROM seed
    UNION
    SELECT e.d, b1.dep + 1 FROM b1 JOIN e ON e.s = b1.v
    WHERE b1.dep < 32),
d1 AS (SELECT v, min(dep)::BIGINT AS depth FROM b1 GROUP BY 1),
far AS (SELECT v FROM d1 ORDER BY depth DESC, v LIMIT 1),
b2(v, dep) AS (
    SELECT far.v, 0 FROM far
    UNION
    SELECT e.d, b2.dep + 1 FROM b2 JOIN e ON e.s = b2.v
    WHERE b2.dep < 32),
d2 AS (SELECT v, min(dep)::BIGINT AS depth FROM b2 GROUP BY 1)
SELECT (SELECT v FROM seed) AS seed,
       (SELECT v FROM far) AS far_node,
       (SELECT max(depth) FROM d1)::BIGINT AS ecc1,
       (SELECT max(depth) FROM d2)::BIGINT AS diameter_lb,
       (SELECT count(*) FROM d1)::BIGINT AS n_reached1,
       (SELECT count(*) FROM d2)::BIGINT AS n_reached2""".format(
            links=os.path.join(LINKGRAPH_DIR,
                               "golden_links.parquet")),
        # Hamilton largest-remainder crawl-budget apportionment over
        # hosts — all-integer, ties by host asc
        "crawl_budget": """
WITH h AS (SELECT regexp_replace(url, '^[a-z]+://([^/]*).*$',
                                 '\\1') AS host,
                  count(*)::BIGINT AS n
           FROM read_parquet({pages}) GROUP BY 1),
t AS (SELECT sum(n)::BIGINT AS nn FROM h),
b AS (SELECT h.host, h.n, (1000 * h.n) // t.nn AS base,
             (1000 * h.n) % t.nn AS rem
      FROM h CROSS JOIN t),
lr AS (SELECT *, row_number() OVER (ORDER BY rem DESC, host) AS rk
       FROM b),
lft AS (SELECT 1000 - sum(base)::BIGINT AS l FROM b)
SELECT host, n AS n_pages,
       (base + CASE WHEN rk <= lft.l THEN 1 ELSE 0 END)::BIGINT
           AS alloc
FROM lr CROSS JOIN lft""".format(
            pages=repr(_linkgraph_pages_paths())),
        # URL template mining: path-segment digit runs collapse to
        # {{n}} (hosts keep their names)
        "url_templates": """
SELECT regexp_replace(url, '/[0-9]+', '/{{n}}', 'g') AS template,
       count(*)::BIGINT AS n_urls, min(url) AS example
FROM read_parquet({pages})
GROUP BY 1""".format(pages=repr(_linkgraph_pages_paths())),
        # content + anchor evidence fusion at w=0.25
        "anchor_boosted_rank": _anchor_boost_sql(),
        # anchor-text index: tokenize the generator's golden anchor
        # rows (planted pre-html) with the query tokenizer contract
        "anchor_terms": """
WITH a AS (SELECT dst_url,
             unnest(regexp_split_to_array(lower(anchor_text), '\\s+')) AS term
           FROM read_parquet('{anchors}')),
t AS (SELECT dst_url, term FROM a WHERE term <> '')
SELECT dst_url, term, count(*)::BIGINT AS n_mentions
FROM t GROUP BY 1, 2""".format(
            anchors=os.path.join(LINKGRAPH_DIR, "golden_anchors.parquet")
        ),
        "domain_counts": """
SELECT split_part(url, '/', 3) AS host, count(*)::BIGINT AS n_pages,
       sum(octet_length(html))::BIGINT AS html_bytes
FROM read_parquet('{pages}') GROUP BY 1""".format(
            pages=os.path.join(LINKGRAPH_DIR, "pages_*.parquet")),
        "reference_rank": _reference_rank_sql(),
        "pagerank": _pagerank_sql(),
        "host_pagerank": _host_pagerank_sql(),
        "hits_scores": _hits_sql(),
        "pagerank_personalized": _ppr_sql(),
        "related_pages": _related_pages_sql(),
        "adamic_adar": _adamic_adar_sql(),
        "jaccard_links": _jaccard_links_sql(),
        "bloom_semi_join": """
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
       o_orderdate, o_orderpriority
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer
                    WHERE c_mktsegment = 'BUILDING')""",
        "connected_components": _connected_components_sql(),
        # out-degree histogram over src ∪ dst (sink-only nodes are the
        # degree-0 row)
        "degree_distribution": f"""
WITH links AS (SELECT src_url, dst_url
               FROM read_parquet('{GRAPH_LINKS}')),
nodes AS (SELECT src_url AS url FROM links UNION SELECT dst_url FROM links),
deg AS (SELECT n.url, count(l.src_url)::BIGINT AS out_degree
        FROM nodes n LEFT JOIN links l ON l.src_url = n.url GROUP BY 1)
SELECT out_degree, count(*)::BIGINT AS n_nodes FROM deg GROUP BY 1""",
        # mutual links: both directions present, self-loops excluded
        "reciprocal_links": f"""
WITH e AS (SELECT DISTINCT src_url, dst_url
           FROM read_parquet('{GRAPH_LINKS}'))
SELECT e1.src_url AS url_a, e1.dst_url AS url_b
FROM e e1 JOIN e e2 ON e1.src_url = e2.dst_url
                   AND e1.dst_url = e2.src_url
WHERE e1.src_url < e1.dst_url""",
        # triangles in the undirected simple graph, each counted once
        # via the canonical u < v < w edge triple
        "triangle_count": f"""
WITH ue AS (SELECT DISTINCT least(src_url, dst_url) AS u,
                   greatest(src_url, dst_url) AS v
            FROM read_parquet('{GRAPH_LINKS}')
            WHERE src_url <> dst_url)
SELECT count(*)::BIGINT AS n_triangles
FROM ue e1 JOIN ue e2 ON e2.u = e1.u AND e2.v > e1.v
     JOIN ue e3 ON e3.u = e1.v AND e3.v = e2.v""",
        # k-core decomposition: unrolled simultaneous-peel rounds per
        # level over the planted coreness-spectrum fixture
        "coreness": _coreness_sql(),
        # ground truth: transitive closure both ways, scc_id = min
        # mutual-reachability witness (reach includes (v, v))
        "scc": f"""
WITH RECURSIVE e AS (SELECT DISTINCT src_url AS src, dst_url AS dst
                     FROM read_parquet('{GRAPH_SCC_LINKS}')),
nodes AS (SELECT src AS url FROM e UNION SELECT dst FROM e),
reach(a, b) AS (
  SELECT url, url FROM nodes
  UNION
  SELECT r.a, e.dst FROM reach r JOIN e ON r.b = e.src)
SELECT r1.a AS url, min(r1.b) AS scc_id
FROM reach r1 JOIN reach r2 ON r1.a = r2.b AND r1.b = r2.a
GROUP BY 1""",
        # robots.txt precedence (longest prefix, allow wins ties)
        "robots_filter": _robots_sql(),
        # url canonicalization contract replayed with string/list ops
        "canonical_urls": _canonical_urls_sql(),
        # crawl-loop tail: links - visited, robots, politeness waves
        "frontier_prep": _frontier_prep_sql(),
        # DDL field-width quarantine (init_db.sql:4-7 limits)
        "ddl_quarantine": _ddl_quarantine_sql(),
        # BFS min-hop depth from an md5-gated seed set; the recursive
        # term is depth-capped so link cycles terminate, min() collapses
        # revisits to the true BFS depth
        "crawl_depth": """
WITH RECURSIVE edges AS (SELECT src_url AS src, dst_url AS dst
                         FROM read_parquet('{links}')),
nodes AS (SELECT src AS url FROM edges UNION SELECT dst FROM edges),
seeds AS (SELECT url FROM nodes
          WHERE md5_number_lower(url) % {mod} = 0),
r(url, depth) AS (
  SELECT url, 0 FROM seeds
  UNION
  SELECT e.dst, r.depth + 1 FROM r JOIN edges e ON e.src = r.url
  WHERE r.depth < {maxd}
)
SELECT url, min(depth)::BIGINT AS depth FROM r GROUP BY url""".format(
            links=os.path.join(LINKGRAPH_DIR, "golden_links.parquet"),
            mod=CRAWL_SEED_MOD, maxd=CRAWL_MAX_DEPTH),
        # real-decode round trip: golden features computed by the
        # generator from the raw arrays BEFORE encoding
        "media_features": """
SELECT media_id, kind, n_values, v_mean, v_std, v_min, v_max,
       width, height
FROM read_parquet('{golden}')""".format(
            golden=os.path.join(MEDIA_DIR, "golden_features.parquet")
        ),
        # decode->re-encode must land on the pre-write transcode
        "image_transcode": """
SELECT media_id, in_fmt, in_bytes, out_bytes, width, height, out_crc32
FROM read_parquet('{golden}')""".format(
            golden=os.path.join(MEDIA_DIR, "golden_transcode.parquet")
        ),
        # decode->RMS must reproduce the pre-encode golden frames
        "audio_rms_windows": """
SELECT media_id, frame_idx, rms FROM read_parquet('{golden}')""".format(
            golden=os.path.join(MEDIA_DIR, "golden_rms.parquet")
        ),
        # decode->pHash must reproduce the pre-encode golden hashes
        "image_phash": """
SELECT media_id, phash FROM read_parquet('{golden}')""".format(
            golden=os.path.join(PHASH_DIR, "golden_phash.parquet")
        ),
        # connected components over the golden-phash pair graph
        "image_dup_clusters": """
WITH RECURSIVE g AS (SELECT media_id, phash FROM read_parquet('{golden}')),
vpairs AS (SELECT a.media_id AS ma, b.media_id AS mb
           FROM g a JOIN g b ON a.media_id < b.media_id
           WHERE bit_count(xor(a.phash, b.phash)) <= {maxh}),
e AS (SELECT ma AS a, mb AS b FROM vpairs
      UNION SELECT mb, ma FROM vpairs),
reach(a, b) AS (SELECT a, b FROM e
                UNION SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a)
SELECT a::BIGINT AS media_id, least(a, min(b))::BIGINT AS cluster_id
FROM reach GROUP BY a""".format(
            golden=os.path.join(PHASH_DIR, "golden_phash.parquet"),
            maxh=PHASH_MAX_HAMMING,
        ),
        # perceptual near-dup pairs: exact O(n^2) popcount over the
        # golden hashes — the banded engine must find exactly these
        "image_dup_pairs": """
WITH g AS (SELECT media_id, phash FROM read_parquet('{golden}'))
SELECT a.media_id AS media_a, b.media_id AS media_b,
       bit_count(xor(a.phash, b.phash))::BIGINT AS hamming
FROM g a JOIN g b ON a.media_id < b.media_id
WHERE bit_count(xor(a.phash, b.phash)) <= {maxh}""".format(
            golden=os.path.join(PHASH_DIR, "golden_phash.parquet"),
            maxh=PHASH_MAX_HAMMING,
        ),
        # rows-only (genuinely non-SQL-expressible): knn_cosine_lsh and
        # knn_cosine_ivf — APPROXIMATE searches whose probe sets depend
        # on seeded hyperplanes / trained centroids (pytest recall
        # oracles instead)
    }
    # IVF at nprobe=nlist probes every list -> provably exact: same
    # oracle as brute-force knn (round-2 VERDICT item #3)
    sql["knn_cosine_ivf_exact"] = sql["knn_cosine"]
    # the positional-index phrase path must reproduce the corpus-scan
    # phrase_match exactly — one oracle, two execution engines
    sql["phrase_match_indexed"] = sql["phrase_match"]
    sql["term_proximity_indexed"] = sql["term_proximity"]
    # MaxScore is rank/score-identical to the exhaustive top-k scorer
    sql["bm25_topk_maxscore"] = sql["bm25_topk"]
    sql["canonical_dedup"] = ("WITH c AS (" + _canonical_urls_sql()
                              + ") SELECT canonical_url, "
                              "min(url) AS rep_url, "
                              "count(*)::BIGINT AS n_variants "
                              "FROM c GROUP BY 1")
    return sql
