"""Engine operators beyond plain SQL: DML on parquet tables, bulk
ingest alignment, dedup, similarity search, text analysis, multimodal
plumbing."""
