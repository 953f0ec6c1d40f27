"""Sources: file tables (parquet/csv/json) and the Kafka envelope source."""
