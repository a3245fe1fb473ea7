"""Engine operators beyond plain relational algebra: dedup, similarity
search, as-of joins, multimodal plumbing."""
