"""LLM-training-data pipeline operators: deduplication (exact, fingerprint,
MinHash-LSH, SimHash, n-gram Jaccard), text analysis (language ID, quality
scoring, token counting, fingerprinting), embedding similarity search, and
multimodal binary-column plumbing.

These are the extensions the north star mandates beyond the reference's own
surface (BASELINE.json; SURVEY §7 Phase 3) — built Spark-first: built-in
higher-order functions wherever expressible, Arrow-batched pandas only where
a kernel genuinely cannot be (none of the dedup/text ops need Python at all).
"""
