"""LLM-training-data pipeline operators: deduplication (exact,
MinHash-LSH, SimHash, n-gram Jaccard), similarity search over
embedding columns, text analysis (language-ID, quality scoring,
token counting, fingerprinting), and multimodal binary-column
plumbing.

These extend the reference's surface (BASELINE.json north star);
every operator is designed partition-parallel for 100 TB: no
driver-side loops, candidate generation via hash bucketing instead
of quadratic comparison, and broadcast query sides for search.
"""
