"""Reusable JVM-side expression builders (no Python UDFs).

Submodules:
  text    — normalization, tokenization, shingling, hashing, minhash/simhash
  vectors — dot product / cosine via strict left-fold (cross-engine exact)
"""
