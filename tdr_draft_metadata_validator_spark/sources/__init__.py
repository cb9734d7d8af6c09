"""Table sources: parquet, CSV-with-header-mapping, Iceberg (import-try)."""
