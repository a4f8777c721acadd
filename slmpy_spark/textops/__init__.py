"""Training-data pipeline operators over the documents/embeddings
tables: token stats, quality scoring, language ID, exact & near
deduplication (MinHash-LSH, SimHash, n-gram Jaccard), similarity
search (brute-force + LSH-bucketed ANN), multimodal plumbing."""
