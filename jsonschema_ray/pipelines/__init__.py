"""End-to-end pipelines."""

from .validate_pipeline import transcript_violations, validate_transcripts

__all__ = ["transcript_violations", "validate_transcripts"]
