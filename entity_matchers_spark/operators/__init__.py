"""Relational operators: blocking, scoring, matching, clustering, evaluation,
deduplication, similarity search, text analysis, multimodal plumbing."""
