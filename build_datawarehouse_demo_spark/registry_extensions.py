"""Training-data-pipeline extension operators (BASELINE.json north
star): dedup, similarity search, text analysis, multimodal plumbing.

Filled in module-by-module; each op registers a query + oracle over the
driver's documents/embeddings/events tables.
"""

from __future__ import annotations


def register_extensions() -> None:
    pass
