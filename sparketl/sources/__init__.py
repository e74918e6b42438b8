"""Sources package: csv/jsonl ingest + partitioned parquet sink queries."""
