"""LLM-training-data pipeline operators.

Deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard),
similarity search (exact cosine top-k, LSH-bucketed ANN), text
analysis (language ID, quality scoring, token stats, fingerprinting)
and multimodal binary-column plumbing — all designed for 100 TB scale:
LSH/banding instead of O(n²) joins, JVM built-ins in hot paths,
Arrow-batched Pandas UDFs where Python is unavoidable.
"""
