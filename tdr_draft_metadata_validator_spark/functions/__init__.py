"""Scalar helper functions: audio codecs, text analysis, hashing."""
