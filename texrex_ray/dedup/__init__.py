"""Deduplication operators: exact, tender (shingle pair-count), MinHash-LSH,
SimHash, n-gram Jaccard, embedding-cosine."""
