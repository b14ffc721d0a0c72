"""Structured Streaming surface: near-real-time add/remove (SURVEY.md §2.7)."""
