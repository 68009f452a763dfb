"""Large-scale training-data-pipeline operators (the north-star extensions
beyond the reference's own surface — BASELINE.json):

- ``dedup``      — exact (fingerprint groupBy), MinHash-LSH, SimHash
- ``similarity`` — brute-force cosine top-k + LSH-bucketed ANN
- ``text``       — language ID, quality scoring, token counting, rolling
                   document fingerprints
- ``multimodal`` — opaque binary payload columns with typed metadata and
                   Arrow-batched decode plumbing (decode kernels stubbed:
                   image/audio libs are not in this container)

Every operator is designed shuffle-first for 100 TB: candidate generation
is always a bucketed equi-join (LSH bands, SimHash chunks, ANN buckets),
never an n² cross product; exact verification runs only on candidates.
"""
