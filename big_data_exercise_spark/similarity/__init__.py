"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the correctness baseline; IVF-style
partitioned search and label-blocked near-dup as the scale paths.
"""
