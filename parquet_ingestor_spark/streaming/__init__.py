"""Structured Streaming surface: windowed aggregations, watermarks,
streaming dedup — the streaming twins of the batch query inventory."""
