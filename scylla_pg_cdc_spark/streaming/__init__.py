"""Structured Streaming pipelines (CDC consumer, DLQ, windowed rates)."""
