"""Structured-Streaming surface (optional; reference is batch-only)."""
