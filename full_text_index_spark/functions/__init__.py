"""Training-data-pipeline operators layered on the same tokenizer/corpus
model as the index engine: deduplication (exact, minhash-LSH, simhash,
n-gram jaccard), similarity search (brute cosine + LSH-bucketed),
text analysis (vocabulary, entropy, quality, language-ID, fingerprints,
token counts) and multimodal binary-column plumbing.

Everything here is built from JVM-side DataFrame expressions (higher-order
array functions — no Python on the hot path) except the multimodal decode
stub, which is an Arrow-batched mapInPandas by design.
"""
