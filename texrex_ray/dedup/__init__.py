"""Deduplication operators: exact, tender (shingle pair-count), MinHash-LSH,
SimHash, n-gram Jaccard, embedding-cosine (brute KNN / NN, LSH-ANN and
IVF-ANN scale paths), and connected-component duplicate clusters."""
