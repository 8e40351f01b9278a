"""Scalar/vectorized functions: codecs, hashing, signatures, text analysis."""
