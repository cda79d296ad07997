"""Deterministic synthetic sources (transcripts, conformance corpus)."""

from .transcripts import (
    TRANSCRIPT_SCHEMA_JSON,
    generate_transcripts,
    transcripts_path,
)

__all__ = ["TRANSCRIPT_SCHEMA_JSON", "generate_transcripts", "transcripts_path"]
