"""Structured Streaming jobs mirroring the batch event operators."""
