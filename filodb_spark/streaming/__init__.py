"""Structured Streaming ingestion + downsampling jobs."""
