"""Deduplication queries over the documents table (filled in phase 3)."""
