"""Structured Streaming assembly of the file-transfer pipeline."""
