"""Training-data-pipeline operations over generic document / embedding
tables (the driver's ``documents`` / ``embeddings`` / ``events``
parquet tables and any table of the same shape).

These are first-class engine components beyond the reference's own
operator set (SURVEY.md §2 covers the reference; this package covers
the large-scale-training-data ops the task mandates): deduplication
(exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine),
similarity search (brute-force cosine top-k + LSH-bucketed), text
analysis (token counting, quality scoring, language-ID heuristic,
fingerprinting), and multimodal decode plumbing (stubbed decode,
real Ray-side schema/actor layout).

Every public function takes an already-constructed
``ray.data.Dataset`` (or an ``sf_dir``-style path) and returns a
``Dataset`` — lazy, streaming, no ``ray.init`` anywhere.
"""
