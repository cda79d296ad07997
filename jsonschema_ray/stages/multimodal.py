"""Multimodal (binary payload) stage plumbing.

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata.  The Ray-side plumbing here is real — schema handling, actor-pool
decode stage, small-batch sizing for wide rows, output layout — while the
codec itself is gated: the container has no image/audio libraries, so
``DecodeStage`` uses a clearly-marked deterministic fake unless Pillow (or
an equivalent) is importable, and ``decode="strict"`` raises
``NotImplementedError`` instead.

At 100 TB the operative knobs are: ``batch_size`` small (rows are MBs, a
batch × pool must fit worker heap), ``num_cpus`` per actor matched to codec
threading, and Arrow ``binary`` kept zero-copy end to end (never pandas —
object dtype would copy every payload).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["attach_payload", "DecodeStage", "decode_features"]


def attach_payload(ds, text_col="text", id_col="doc_id"):
    """Demo adapter: wrap a text column as an opaque binary payload column
    with media metadata (media_type, n_bytes) — the shape a real ingest of
    image bytes would have."""

    def wrap(t: pa.Table) -> pa.Table:
        payloads = [(s or "").encode() for s in t[text_col].to_pylist()]
        return pa.table(
            {
                id_col: t[id_col],
                "payload": pa.array(payloads, pa.binary()),
                "media_type": pa.array(["application/fake-image"] * len(payloads)),
                "n_bytes": pa.array(
                    np.asarray([len(p) for p in payloads], dtype=np.int64)
                ),
            }
        )

    return ds.map_batches(wrap, batch_format="pyarrow")


class DecodeStage:
    """Actor-pool decode: codec state initialised once per actor.

    ``mode="fake"`` (default): deterministic stand-in features derived from
    the payload bytes — real plumbing, fake codec.
    ``mode="strict"``: requires a real codec; raises ``NotImplementedError``
    in this container (no image/audio libraries are installed).
    """

    def __init__(self, mode: str = "fake", id_col: str = "doc_id") -> None:
        self.id_col = id_col
        self.mode = mode
        self.codec = None
        if mode == "strict":
            try:
                import PIL.Image  # noqa: F401  (not installed here)

                self.codec = "pillow"
            except ImportError:
                raise NotImplementedError(
                    "real image decode needs Pillow/libvips; this container "
                    "ships neither — use mode='fake' for plumbing tests"
                )

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t["payload"].to_pylist()
        width = np.zeros(len(payloads), dtype=np.int32)
        height = np.zeros(len(payloads), dtype=np.int32)
        checksum = np.zeros(len(payloads), dtype=np.int64)
        for i, p in enumerate(payloads):
            if not p:
                continue
            # FAKE DECODE: dimensions and checksum derived deterministically
            # from the bytes (stand-in for codec output).
            width[i] = 16 + (p[0] % 64) * 8
            height[i] = 16 + (p[-1] % 64) * 8
            checksum[i] = int(np.frombuffer(p[:8].ljust(8, b"\0"), dtype="<u8")[0]) & 0x7FFFFFFFFFFFFFFF
        return pa.table(
            {
                self.id_col: t[self.id_col],
                "width": pa.array(width),
                "height": pa.array(height),
                "checksum": pa.array(checksum),
            }
        )


def decode_features(ds, batch_size: int = 64, concurrency=(1, 4), mode: str = "fake"):
    """Binary payloads → per-item features via an actor-pool decode stage.

    ``batch_size`` is deliberately small: with MB-scale payloads a batch ×
    pool size must fit the worker heap (ray_guide: memory-aware sizing)."""
    return ds.map_batches(
        DecodeStage,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs=dict(mode=mode),
    )
