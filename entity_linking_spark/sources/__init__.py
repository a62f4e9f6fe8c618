"""Source readers (fixture/corpus formats beyond parquet)."""
