"""Structured Streaming: ingest, rollup maintenance, live export plumbing."""
