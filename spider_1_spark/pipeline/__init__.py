"""Large-scale training-data pipeline operators (dedup, similarity
search, text analysis, multimodal plumbing) over the documents /
embeddings tables — the 100 TB data-curation surface layered on the
same engine primitives (SURVEY §2B + task brief)."""
