"""Embedding-similarity queries over the embeddings table (phase 4)."""
