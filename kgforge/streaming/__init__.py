"""Structured Streaming face of the batch pipeline (SURVEY §2.9)."""
