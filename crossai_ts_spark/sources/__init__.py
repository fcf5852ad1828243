"""Sources & sinks: Iceberg-or-parquet storage abstraction + tokenizer."""
