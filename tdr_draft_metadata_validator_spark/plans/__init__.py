"""Validation plan builder, per-partition metrics, checkpoint/resume."""
