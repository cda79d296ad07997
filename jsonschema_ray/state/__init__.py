"""Checkpoint/resume state: per-partition manifests and lineage."""

from .manifest import run_resumable

__all__ = ["run_resumable"]
