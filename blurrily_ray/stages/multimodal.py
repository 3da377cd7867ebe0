"""Multimodal (image/audio) column plumbing — actor-pool decode stages.

Media lands as opaque ``binary`` columns with typed metadata. The decode /
feature-extract kernels would normally wrap PIL / torchaudio / ffmpeg —
none of which exist in this container — so the *decoder body* is a
clearly-marked deterministic STUB, while everything Ray-side is real and
tested: schema, callable-class actor pool (setup once per actor in
``__init__``), batch sizing for large payloads, and the output layout.

Swap ``_FAKE_DECODE = False`` + implement ``_decode_real`` to go live.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

_FAKE_DECODE = True  # no image libs in this container


def attach_binary_payload(docs, *, id_col: str = "doc_id",
                          text_col: str = "text"):
    """Test helper: derive a deterministic binary payload column from text
    (stand-in for real image bytes)."""

    def fn(batch: pa.Table) -> pa.Table:
        payloads = [t.encode("utf-8") if t is not None else b""
                    for t in batch[text_col].to_pylist()]
        return pa.table({
            id_col: batch[id_col],
            "payload": pa.array(payloads, type=pa.binary()),
            "media_type": pa.array(["image/fake"] * len(batch)),
        })

    return docs.map_batches(fn, batch_format="pyarrow")


class ImageFeatureExtractor:
    """Actor-pool stage: decode image bytes → (width, height, feature vec).

    ``__init__`` runs once per actor (model load / codec init — here a
    deterministic fake); ``__call__`` runs per batch. Use as::

        ds.map_batches(ImageFeatureExtractor, concurrency=(2, 8),
                       batch_size=64, num_cpus=1, batch_format="pyarrow")

    Small batch_size on purpose: batches of large binary payloads must fit
    worker heaps (batch_size × concurrency × payload ≤ heap).
    """

    FEATURE_DIM = 8

    def __init__(self):
        if _FAKE_DECODE:
            self._model = "fake-decoder-v1"  # stands in for model load
        else:  # pragma: no cover
            raise NotImplementedError("real image decode requires PIL/torch")

    @staticmethod
    def _decode_fake(payload: bytes) -> tuple[int, int, np.ndarray]:
        """Deterministic stand-in: md5(payload) → pseudo dims + features."""
        d = hashlib.md5(payload).digest()
        width = 64 + d[0]
        height = 64 + d[1]
        feat = np.frombuffer(d[:8], dtype=np.uint8).astype(np.float64) / 255.0
        return width, height, feat

    def __call__(self, batch: pa.Table) -> pa.Table:
        widths, heights, feats = [], [], []
        for payload in batch["payload"].to_pylist():
            w, h, f = self._decode_fake(payload or b"")
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
