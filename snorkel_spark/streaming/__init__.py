"""Structured Streaming operators (the reference has no streaming —
SURVEY.md §2.10; these are the Spark-native streaming shapes a
continuous corpus-ingest pipeline needs)."""
