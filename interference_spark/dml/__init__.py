"""DML surface: managed parquet store, upsert/delete, PROCESS runner."""
