"""Structured Streaming operators (SURVEY.md §2.9 notes the reference
has none — this is the engine's extension surface for event streams)."""
