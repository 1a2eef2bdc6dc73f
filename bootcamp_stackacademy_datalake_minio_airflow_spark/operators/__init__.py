"""Relational + ML-data operators.

- ``pivot``       grouped pivot-sum (reference A1)
- ``joins``       star left-join chains with broadcast hints (J1-J4)
- ``dedup``       exact / MinHash-LSH / SimHash / n-gram-Jaccard /
                  embedding-cosine deduplication
- ``similarity``  embedding similarity search (brute-force + LSH path)
- ``text``        language-ID, quality scoring, token counts, fingerprints
- ``multimodal``  binary media columns: schema + mapInPandas plumbing
"""
