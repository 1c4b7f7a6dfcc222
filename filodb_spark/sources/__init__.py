"""Ingestion source parsers and loaders."""
