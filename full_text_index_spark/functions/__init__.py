"""Training-data-pipeline operators layered on the same tokenizer/corpus
model as the index engine: deduplication (exact, minhash-LSH, simhash,
n-gram jaccard; pair→cluster resolution via connected components),
similarity search (brute cosine, multiprobe LSH, corpus-adaptive IVF),
text analysis (vocabulary, entropy, quality, language-ID, fingerprints,
token counts, n-gram heads, boilerplate removal, grouped quantile
profiling), curation dataflow (fused gate pipeline, deterministic
train/val/test split, per-group quota sampling), event-time ops (as-of
join, binned range join) and multimodal binary-column decode.

Everything here is built from JVM-side DataFrame expressions (higher-order
array functions — no Python on the hot path) except the multimodal decode
and the Arrow similarity kernels, which are Arrow-batched by design.
"""
