"""Distributed operators: dedup (exact / MinHash-LSH / SimHash /
n-gram Jaccard), similarity search over embeddings, as-of joins,
EAV melt/pivot, validation, multimodal plumbing."""
