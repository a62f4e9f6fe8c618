"""Structured Streaming operators (events ingestion path)."""
