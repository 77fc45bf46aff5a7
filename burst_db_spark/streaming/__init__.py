"""Structured Streaming analogs of the reference's incremental-batch
conventions (SURVEY.md §2.9)."""
