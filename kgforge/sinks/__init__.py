"""Property-graph sinks: parquet graph tables + FalkorDB-compatible export."""
