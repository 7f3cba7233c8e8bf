"""End-to-end Ray Data pipelines: index build, BM25 search, dedup
family, similarity search, text analysis, relational operators."""
