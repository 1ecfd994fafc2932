"""Training-data pipeline operators (the north-star extensions).

Each module pairs a scale-path implementation (LSH / banding /
broadcast) with an exact baseline that the DuckDB oracle can check:

  dedup        exact, n-gram Jaccard (exact), MinHash+LSH, SimHash
  similarity   brute-force cosine top-k (oracle), IVF approximate
  text         language-ID, quality scoring, token counting, fingerprints
  multimodal   binary columns + Arrow-batched decode plumbing (stubbed)
"""
