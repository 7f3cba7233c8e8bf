"""rse_ray — a Ray-Data-native fulltext indexing + data-processing engine.

A from-scratch rebuild of the capabilities of the reference search engine
(BastianAsmussen/RSE, "GSE"): inverted-index construction + BM25 top-k
retrieval over Common-Crawl-style web pages, expressed Ray-Data-first
(``ray.data.Dataset`` -> ``map_batches`` over zero-copy Arrow batches,
actor pools for stateful stages, explicit shuffles for the wide steps),
plus the large-scale training-data operators (dedup family, similarity
search, text analysis, multimodal plumbing).

Layout:
    functions/  pure kernels, no Ray: tokenizer (Porter), codec
                (delta+varint posting blocks), HTML extraction, hashing
    stages/     map_batches-ready batch transforms and actor classes
    sources/    readers + deterministic fixture generators
    pipelines/  end-to-end Dataset pipelines (build, search, dedup, ann,
                text analysis, relational ops)
    state/      checkpoint manifests + resume planning
"""

__version__ = "0.1.0"
