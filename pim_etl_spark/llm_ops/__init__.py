"""Large-scale training-data pipeline operators (SURVEY §2.10).

Beyond-reference surface mandated by BASELINE.json: deduplication
(exact, MinHash-LSH, SimHash, n-gram Jaccard), similarity search over
embeddings, text analysis, and multimodal binary-column plumbing —
each designed for 100 TB (shuffle on compact keys/hashes only, Arrow
batches for the few places Python is unavoidable).
"""
