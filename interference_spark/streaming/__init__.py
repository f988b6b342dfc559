"""SELECT STREAM / CEP via Structured Streaming."""
