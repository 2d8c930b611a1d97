"""Relational + data-pipeline operators (SURVEY.md §2.2-§2.8 plus the
training-data extension family)."""
