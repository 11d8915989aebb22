"""Structured-Streaming services: incremental MV maintenance, change
tail, TTL retention, scheduled refresh."""
