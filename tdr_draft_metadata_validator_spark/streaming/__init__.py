"""Structured Streaming variant of the validation pipeline."""
