"""Sources: deterministic page-table generator + parquet IO helpers."""
