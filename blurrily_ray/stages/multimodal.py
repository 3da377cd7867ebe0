"""Multimodal (image/audio) column plumbing — actor-pool decode stages.

Media lands as opaque ``binary`` columns with typed metadata. Heavyweight
codecs (PIL / torchaudio / ffmpeg) don't exist in this container, so the
shipped decoder is a REAL pure-numpy BMP codec: 24-bit uncompressed BMP
(BITMAPINFOHEADER) is a fixed little-endian header plus BGR rows padded
to 4 bytes — decodable with ``np.frombuffer`` alone. Payloads the codec
does not recognize fall back to a clearly-marked deterministic stub, so
the pipeline stays total.

Everything Ray-side follows the stateful-stage pattern: callable-class
actor pool (setup once per actor in ``__init__``), small batch_size for
large payloads (batch_size × concurrency × payload ≤ worker heap), Arrow
in/out.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → 24-bit uncompressed BMP bytes (bottom-up
    rows, BGR order, 4-byte row padding) — the standard layout every BMP
    reader accepts."""
    h, w, _ = pixels.shape
    row_size = (w * 3 + 3) & ~3
    data_size = row_size * h
    header = struct.pack("<2sIHHI", b"BM", 54 + data_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, data_size,
                       2835, 2835, 0, 0)
    rows = np.zeros((h, row_size), dtype=np.uint8)
    bgr = pixels[::-1, :, ::-1]  # bottom-up, RGB→BGR
    rows[:, :w * 3] = bgr.reshape(h, w * 3)
    return header + info + rows.tobytes()


def decode_bmp(payload: bytes) -> np.ndarray | None:
    """24-bit uncompressed BMP bytes → (h, w, 3) uint8 RGB, or None when
    the payload isn't one (signature/format check, never an exception)."""
    if len(payload) < 54 or payload[:2] != b"BM":
        return None
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", payload, 14)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if hdr_size < 40 or bpp != 24 or compression != 0 or w <= 0 or h == 0:
        return None
    bottom_up = h > 0
    h = abs(h)
    row_size = (w * 3 + 3) & ~3
    if len(payload) < data_off + row_size * h:
        return None
    rows = np.frombuffer(payload, dtype=np.uint8,
                         count=row_size * h, offset=data_off)
    rows = rows.reshape(h, row_size)[:, :w * 3].reshape(h, w, 3)
    rgb = rows[:, :, ::-1]  # BGR→RGB
    return rgb[::-1] if bottom_up else rgb


def attach_binary_payload(docs, *, id_col: str = "doc_id",
                          text_col: str = "text"):
    """Test helper: derive a deterministic REAL 8×8 24-bit BMP payload
    from each doc's text (md5-seeded pixels) — a stand-in image source
    that the real decoder genuinely decodes."""

    def fn(batch: pa.Table) -> pa.Table:
        payloads = []
        for t in batch[text_col].to_pylist():
            seed = hashlib.md5((t or "").encode("utf-8")).digest()
            px = np.frombuffer((seed * 12)[:8 * 8 * 3], dtype=np.uint8)
            payloads.append(encode_bmp(px.reshape(8, 8, 3)))
        return pa.table({
            id_col: batch[id_col],
            "payload": pa.array(payloads, type=pa.binary()),
            "media_type": pa.array(["image/bmp"] * len(batch)),
        })

    return docs.map_batches(fn, batch_format="pyarrow")


class ImageFeatureExtractor:
    """Actor-pool stage: decode image bytes → (width, height, feature vec).

    ``__init__`` runs once per actor (codec/model init); ``__call__`` runs
    per batch. Use as::

        ds.map_batches(ImageFeatureExtractor, concurrency=(2, 8),
                       batch_size=64, num_cpus=1, batch_format="pyarrow")

    Small batch_size on purpose: batches of large binary payloads must fit
    worker heaps. Features: per-channel means + quadrant brightness —
    computed from REAL decoded pixels for BMP payloads; unrecognized
    payloads take the deterministic md5 stub (marked by width=height=-1
    plus stub features) so mixed media never crashes the stage.
    """

    FEATURE_DIM = 8

    def __init__(self):
        self.codec = "bmp24-numpy"  # stands in for model/codec load

    @staticmethod
    def _features(px: np.ndarray) -> np.ndarray:
        h, w, _ = px.shape
        f = np.empty(8, dtype=np.float64)
        f[0:3] = px.reshape(-1, 3).mean(axis=0) / 255.0  # channel means
        gray = px.mean(axis=2)
        h2, w2 = max(1, h // 2), max(1, w // 2)
        f[3] = gray[:h2, :w2].mean() / 255.0   # quadrant brightness
        f[4] = gray[:h2, w2:].mean() / 255.0 if w > w2 else f[3]
        f[5] = gray[h2:, :w2].mean() / 255.0 if h > h2 else f[3]
        f[6] = gray[h2:, w2:].mean() / 255.0 if (h > h2 and w > w2) else f[3]
        f[7] = gray.std() / 255.0
        return f

    @staticmethod
    def _decode_stub(payload: bytes) -> tuple[int, int, np.ndarray]:
        """Deterministic fallback for unrecognized payloads (STUB)."""
        d = hashlib.md5(payload).digest()
        feat = np.frombuffer(d[:8], dtype=np.uint8).astype(np.float64) / 255.0
        return -1, -1, feat

    def __call__(self, batch: pa.Table) -> pa.Table:
        widths, heights, feats = [], [], []
        for payload in batch["payload"].to_pylist():
            px = decode_bmp(payload or b"")
            if px is not None:
                h, w, _ = px.shape
                widths.append(w)
                heights.append(h)
                feats.append(self._features(px))
            else:
                w, h, f = self._decode_stub(payload or b"")
                widths.append(w)
                heights.append(h)
                feats.append(f)
        return pa.table({
            "doc_id": batch["doc_id"],
            "width": pa.array(widths, type=pa.int32()),
            "height": pa.array(heights, type=pa.int32()),
            "feature": pa.array([f.tolist() for f in feats],
                                type=pa.list_(pa.float64())),
        })


def extract_image_features(media, *, concurrency=(1, 4), batch_size: int = 64):
    """media (doc_id, payload, media_type) → (doc_id, width, height, feature)
    on an actor pool (stateful stage per SURVEY.md §2.4)."""
    return media.map_batches(ImageFeatureExtractor, concurrency=concurrency,
                             batch_size=batch_size, batch_format="pyarrow")
