"""Dataset sources: parquet tables + synthetic page feeds."""
