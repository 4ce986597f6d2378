"""Distributed operators: relational extras (as-of/range joins, top-k),
dedup family, similarity search, text analysis, multimodal plumbing."""
