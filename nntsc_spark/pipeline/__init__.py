"""Large-scale training-data pipeline operators.

First-class extensions beyond the reference's surface (charter/BASELINE.json):
deduplication (exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding
cosine, near-dup clustering with survivor election, train/eval
contamination), similarity search (brute-force + LSH-bucketed + IVF-Flat
ANN), text analysis (language-ID, quality scoring, token counting,
fingerprinting, repetition filters, PII scrubbing, deterministic
sampling), sequence packing, and multimodal column plumbing.  Streaming
incremental dedup lives in ``streaming.dedup`` (persistent LSH band
index).

Design rules shared by every operator here:
- all hashing is md5-based so the DuckDB oracle can reproduce results
  bit-for-bit (no engine-specific hash functions in comparable outputs);
- everything is expression-level DataFrame code (JVM-side, codegen-friendly);
  Python appears only in the multimodal mapInPandas decode path;
- candidate generation always happens before pairwise work so the pairwise
  stage is bucket-local, never a full cross join at scale.
"""
