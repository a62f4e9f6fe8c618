"""Relational + linkage operators: blocking, pair generation, scoring,
connected-components clustering, dedup, similarity search, text stats."""
