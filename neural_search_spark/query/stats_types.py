"""Small helper to accept either a CorpusStats or a bare avgdl."""

from __future__ import annotations


def resolve_stats(avgdl, stats) -> float:
    if avgdl is not None:
        return float(avgdl)
    if stats is not None:
        return float(stats.avgdl)
    raise ValueError("provide avgdl or stats")
