"""Composed pipelines: the flagship query and the star-schema warehouse
build (SURVEY.md §3 EP2, §7)."""
