"""Validation operators: gates, rule compiler, relational checks, stats."""
