"""Deduplication operators for training-data pipelines.

Four strategies, increasing in fuzziness:

* ``exact``   — md5 fingerprint of normalized text; hash groupBy.
* ``minhash`` — MinHash signatures + LSH banding for near-dup
  candidate generation at sub-quadratic cost, with exact Jaccard
  verification of candidates only.
* ``simhash`` — 64-bit SimHash + banded Hamming-distance candidates.
* ``ngram``   — n-gram shingle Jaccard (the exact-but-quadratic
  baseline the approximate methods are checked against).

None of these exist in the reference (it has no dedup at all); they
are the north-star extensions (BASELINE.json) designed for 100 TB:
every method is candidate-generation-by-bucketing (shuffle on bucket
key) + verification-within-bucket, never an all-pairs comparison.
"""
