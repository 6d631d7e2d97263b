"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with typed metadata, processed by actor-pool ``map_batches`` stages.

The real codec libraries (PIL/cv2/ffmpeg) are NOT in this container, so
the decode kernels are stubbed (per the build contract): real codecs
raise ``NotImplementedError``; a deterministic FAKE container format
(``FAKEMM1`` header, see below) exercises the full Ray-side plumbing —
schema, batch sizing for large binary payloads, actor signature, output
layout — which IS real and tested.

Fake container layout (little-endian):
    b"FAKEMM1" | kind:u8 (0=image,1=audio,2=video) |
    w:u32 | h:u32 | n_frames:u32 | payload bytes

Large-binary guidance (SURVEY.md §4 memory pressure): callers should use
small ``batch_size`` (e.g. 16) for multi-MB payloads so
batch × concurrency fits the worker heap; blocks containing binary
columns stay in ``batch_format="pyarrow"`` end-to-end (pandas would
object-box every payload).
"""

from __future__ import annotations

import hashlib
import struct

import pyarrow as pa

FAKE_MAGIC = b"FAKEMM1"
_HEADER = struct.Struct("<B3I")


def encode_fake_media(kind: int, w: int, h: int, n_frames: int, payload: bytes) -> bytes:
    return FAKE_MAGIC + _HEADER.pack(kind, w, h, n_frames) + payload


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# JPEG start-of-frame markers that carry dimensions (baseline,
# progressive, lossless, arithmetic variants)
_JPEG_SOF = frozenset(
    {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}
)


def parse_image_dimensions(raw: bytes) -> tuple[int, int] | None:
    """REAL image-header metadata, stdlib-only: (width, height) for
    PNG / GIF / JPEG payloads, None otherwise.  Header parsing — not
    pixel decoding — is the common 100-TB filtering op (drop tiny
    images/thumbnails before any expensive stage), and it needs no
    codec library: PNG IHDR is 8 bytes past the signature (big-endian
    u32 pair), GIF's logical screen descriptor is little-endian u16 at
    offset 6, JPEG requires a marker-segment walk to the first SOFn."""
    if raw.startswith(_PNG_SIG) and len(raw) >= 24 and raw[12:16] == b"IHDR":
        w, h = struct.unpack(">II", raw[16:24])
        return int(w), int(h)
    if raw[:6] in (b"GIF87a", b"GIF89a") and len(raw) >= 10:
        w, h = struct.unpack("<HH", raw[6:10])
        return int(w), int(h)
    if raw.startswith(b"\xff\xd8"):
        i, n = 2, len(raw)
        while i + 9 < n:
            if raw[i] != 0xFF:
                break
            marker = raw[i + 1]
            if marker in _JPEG_SOF:
                h, w = struct.unpack(">HH", raw[i + 5:i + 9])
                return int(w), int(h)
            if marker == 0x01 or 0xD0 <= marker <= 0xD8:  # bare markers
                i += 2
                continue
            seg = int.from_bytes(raw[i + 2:i + 4], "big")
            if seg < 2:
                break
            i += 2 + seg
    return None


def decode_media(raw: bytes) -> dict:
    """Decode one media payload's metadata.  Fake container → full
    metadata; REAL PNG/GIF/JPEG headers → genuine dimensions (stdlib
    parse, no codec needed); anything else → NotImplementedError (the
    honest pixel-decode boundary: PIL/cv2/ffmpeg are not in this
    environment)."""
    if raw is None:
        raise NotImplementedError("null payload")
    if raw.startswith(FAKE_MAGIC):
        kind, w, h, n_frames = _HEADER.unpack_from(raw, len(FAKE_MAGIC))
        payload = raw[len(FAKE_MAGIC) + _HEADER.size:]
        return {
            "kind": int(kind),
            "width": int(w),
            "height": int(h),
            "n_frames": int(n_frames),
            "n_bytes": len(payload),
            "checksum": hashlib.blake2b(payload, digest_size=8).hexdigest(),
        }
    dims = parse_image_dimensions(raw)
    if dims is not None:
        return {
            "kind": 0,
            "width": dims[0],
            "height": dims[1],
            "n_frames": 1,
            "n_bytes": len(raw),
            "checksum": hashlib.blake2b(raw, digest_size=8).hexdigest(),
        }
    raise NotImplementedError(
        "pixel decoding requires codec libraries (PIL/cv2/ffmpeg) not "
        "available in this environment; supported here: FAKEMM1 container "
        "+ real PNG/GIF/JPEG header metadata"
    )


class MediaDecode:
    """Actor stage: binary media column → typed metadata columns.
    ``strict=False`` maps undecodable payloads to nulls instead of
    failing the batch (poison-pill tolerance for web-scale corpora)."""

    def __init__(self, media_col: str = "media", strict: bool = False) -> None:
        self.media_col = media_col
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        metas = []
        for raw in batch[self.media_col].to_pylist():
            try:
                metas.append(decode_media(raw))
            except NotImplementedError:
                if self.strict:
                    raise
                metas.append(None)
        def col(name, typ):
            return pa.array([m[name] if m else None for m in metas], typ)
        batch = batch.drop_columns([self.media_col])
        for name, typ in [("kind", pa.int32()), ("width", pa.int64()),
                          ("height", pa.int64()), ("n_frames", pa.int64()),
                          ("n_bytes", pa.int64()), ("checksum", pa.string())]:
            batch = batch.append_column(name, col(name, typ))
        return batch


class FrameSample:
    """Actor stage: sample every ``stride``-th frame of fake video
    payloads into one row per sampled frame (``flat_map``-shaped:
    a batch of videos → a longer batch of frames)."""

    def __init__(self, media_col: str = "media", id_col: str = "media_id", stride: int = 10):
        self.media_col, self.id_col, self.stride = media_col, id_col, stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_id, out_frame, out_check = [], [], []
        for mid, raw in zip(batch[self.id_col].to_pylist(), batch[self.media_col].to_pylist()):
            try:
                meta = decode_media(raw)
            except NotImplementedError:
                continue
            if meta["kind"] != 2:
                continue
            payload = raw[len(FAKE_MAGIC) + _HEADER.size:]
            n, per = meta["n_frames"], max(1, meta["n_bytes"] // max(1, meta["n_frames"]))
            for f in range(0, n, self.stride):
                frame = payload[f * per: (f + 1) * per]
                out_id.append(mid)
                out_frame.append(f)
                out_check.append(hashlib.blake2b(frame, digest_size=8).hexdigest())
        return pa.table(
            {
                "media_id": pa.array(out_id, pa.int64()),
                "frame_index": pa.array(out_frame, pa.int64()),
                "frame_checksum": pa.array(out_check, pa.string()),
            }
        )


class Resize:
    """Actor stage: binary media column → resized binary media column
    (plus emitted width/height columns).  For the FAKEMM1 container the
    resize is REAL at the plumbing level — a new container is produced
    with the target dimensions and a payload resampled to the implied
    byte budget (nearest-index byte sampling: deterministic, size-
    proportional, checksum-stable for identical inputs).  Real codec
    resampling (PIL/cv2) would slot into ``_resize_one`` with zero
    changes to the Ray-side schema, batch sizing, or actor signature;
    with ``strict=False`` non-fake payloads pass through unchanged
    (web-scale poison tolerance), ``strict=True`` raises."""

    def __init__(self, media_col: str = "media", target_w: int = 256,
                 target_h: int = 256, strict: bool = False) -> None:
        self.media_col = media_col
        self.target_w, self.target_h = int(target_w), int(target_h)
        self.strict = strict

    def _resize_one(self, raw: bytes) -> bytes | None:
        if raw is None or not raw.startswith(FAKE_MAGIC):
            if self.strict:
                raise NotImplementedError(
                    "real codec resize requires PIL/cv2 (not in this "
                    "environment); supported here: FAKEMM1 container")
            return raw
        kind, w, h, n_frames = _HEADER.unpack_from(raw, len(FAKE_MAGIC))
        payload = raw[len(FAKE_MAGIC) + _HEADER.size:]
        # byte budget scales with the area ratio (the real op's memory
        # shape); nearest-index sampling keeps it deterministic
        if w and h and len(payload):
            n_out = max(1, (len(payload) * self.target_w * self.target_h)
                        // (w * h))
            idx = [(i * len(payload)) // n_out for i in range(n_out)]
            payload = bytes(payload[i] for i in idx)
        return encode_fake_media(kind, self.target_w, self.target_h,
                                 n_frames, payload)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = [self._resize_one(raw)
               for raw in batch[self.media_col].to_pylist()]
        batch = batch.drop_columns([self.media_col])
        batch = batch.append_column(self.media_col,
                                    pa.array(out, pa.binary()))
        batch = batch.append_column(
            "width", pa.array([self.target_w] * batch.num_rows, pa.int64()))
        return batch.append_column(
            "height", pa.array([self.target_h] * batch.num_rows, pa.int64()))


class FeatureExtract:
    """Actor stage: binary media column → fixed-dim float feature
    vector (``list<float32>`` column) — the embedding step of an
    image/audio similarity pipeline.  The kernel here is a
    deterministic byte-histogram projection (256-bin histogram of the
    payload, L2-normalized, folded to ``dim``): a stand-in with the
    REAL model-stage shape — a heavyweight encoder would load its
    weights ONCE in ``__init__`` (the actor-pool contract) and replace
    ``_features`` only; schema, batch size, and downstream ANN
    compatibility (``similarity.knn_*`` consume list<float>) are
    unchanged."""

    def __init__(self, media_col: str = "media", dim: int = 64,
                 out_col: str = "embedding") -> None:
        import numpy as np

        self.media_col, self.dim, self.out_col = media_col, int(dim), out_col
        self._np = np

    def _features(self, raw: bytes):
        np = self._np
        if raw is None:
            return None
        body = raw[len(FAKE_MAGIC) + _HEADER.size:] \
            if raw.startswith(FAKE_MAGIC) else raw
        hist = np.bincount(
            np.frombuffer(body, dtype=np.uint8), minlength=256
        ).astype(np.float32) if len(body) else np.zeros(256, np.float32)
        folded = hist.reshape(self.dim, 256 // self.dim).sum(axis=1) \
            if 256 % self.dim == 0 else hist[: self.dim]
        n = float(np.linalg.norm(folded))
        return (folded / n if n else folded).tolist()

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [self._features(raw)
                 for raw in batch[self.media_col].to_pylist()]
        return batch.append_column(
            self.out_col, pa.array(feats, pa.list_(pa.float32())))


def decode_dataset(ds, media_col: str = "media", concurrency=None, batch_size: int = 16):
    """Media Dataset → metadata Dataset (actor pool, small batches for
    large binary payloads)."""
    from .util import default_pool

    return ds.map_batches(
        MediaDecode,
        fn_constructor_kwargs={"media_col": media_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency if concurrency is not None else default_pool(),
        num_cpus=1,
    )
