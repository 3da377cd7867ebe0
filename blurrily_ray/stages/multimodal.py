"""Multimodal (image/audio/video) column plumbing — actor-pool decode stages.

Media lands as opaque ``binary`` columns with typed metadata. Heavyweight
codecs (PIL / torchaudio / ffmpeg) don't exist in this container, so the
shipped decoders are REAL pure-numpy codecs: 24-bit uncompressed BMP
(BITMAPINFOHEADER + padded BGR rows), 8-bit truecolor PNG (stdlib zlib
inflate + full scanline unfiltering incl. Paeth), mono 16-bit PCM WAV
(RIFF chunks), and a length-prefixed motion-BMP video container. Payloads
no codec recognizes fall back to a clearly-marked deterministic stub, so
the pipelines stay total.

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
                          text_col: str = "text", fmt: str = "bmp"):
    """Test helper: derive a deterministic REAL 8×8 image payload (24-bit
    BMP or 8-bit PNG per ``fmt``) from each doc's text (md5-seeded
    pixels) — a stand-in image source the real decoders genuinely
    decode."""
    enc = {"bmp": encode_bmp, "png": lambda px: encode_png(px)}[fmt]

    def fn(batch: pa.Table) -> pa.Table:
        payloads = []
        for t in batch[text_col].to_pylist():
            seed = hashlib.md5((t or "").encode("utf-8")).digest()
            px = np.frombuffer((seed * 12)[:8 * 8 * 3], dtype=np.uint8)
            payloads.append(enc(px.reshape(8, 8, 3)))
        return pa.table({
            id_col: batch[id_col],
            "payload": pa.array(payloads, type=pa.binary()),
            "media_type": pa.array([f"image/{fmt}"] * len(batch)),
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
    computed from REAL decoded pixels for BMP/PNG payloads; unrecognized
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
            px = decode_image(payload or b"")
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


def resize_nearest(px: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize of an (h, w, 3) uint8 image — index-gather
    only, no interpolation kernel needed for thumbnailing/feature prep."""
    h, w, _ = px.shape
    ri = (np.arange(out_h) * h) // out_h
    ci = (np.arange(out_w) * w) // out_w
    return px[ri][:, ci]


class ImageResizer:
    """Actor-pool stage: decode → nearest-neighbor resize → re-encode BMP.
    The resize transform every training-data image pipeline runs, with the
    same payload-in/payload-out schema so stages chain."""

    def __init__(self, out_h: int = 4, out_w: int = 4):
        self.out_h, self.out_w = out_h, out_w

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads, ok = [], []
        for payload in batch["payload"].to_pylist():
            px = decode_image(payload or b"")
            if px is None:
                payloads.append(payload)  # pass through undecodable media
                ok.append(False)
            else:
                payloads.append(encode_bmp(
                    resize_nearest(px, self.out_h, self.out_w)))
                ok.append(True)
        return pa.table({
            "doc_id": batch["doc_id"],
            "payload": pa.array(payloads, type=pa.binary()),
            "media_type": batch["media_type"],
            "resized": pa.array(ok, type=pa.bool_()),
        })


def resize_images(media, out_h: int = 4, out_w: int = 4, *,
                  concurrency=(1, 4), batch_size: int = 64):
    return media.map_batches(ImageResizer,
                             fn_constructor_args=(out_h, out_w),
                             concurrency=concurrency, batch_size=batch_size,
                             batch_format="pyarrow")


# --- audio: real RIFF/WAV PCM codec (pure numpy, like the BMP one) -------

def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """1-D int16 PCM samples → mono WAV bytes (RIFF + fmt + data)."""
    samples = np.ascontiguousarray(samples, dtype="<i2")
    data = samples.tobytes()
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 1, rate, rate * 2, 2, 16)
    hdr = struct.pack("<4sI4s", b"RIFF", 4 + len(fmt) + 8 + len(data), b"WAVE")
    return hdr + fmt + struct.pack("<4sI", b"data", len(data)) + data


def decode_wav(payload: bytes) -> tuple[np.ndarray, int] | None:
    """Mono 16-bit PCM WAV bytes → (samples int16, sample_rate), or None
    when the payload isn't one. Walks RIFF chunks (fmt may not directly
    precede data), never raises."""
    if len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    pos, rate, bps, channels, fmt_ok = 12, None, None, None, False
    while pos + 8 <= len(payload):
        cid, size = struct.unpack_from("<4sI", payload, pos)
        body = pos + 8
        if cid == b"fmt " and size >= 16:
            audio_fmt, channels, rate, _, _, bps = struct.unpack_from(
                "<HHIIHH", payload, body)
            fmt_ok = audio_fmt == 1 and channels == 1 and bps == 16
        elif cid == b"data":
            if not fmt_ok:
                return None
            n = min(size, len(payload) - body) // 2
            return np.frombuffer(payload, dtype="<i2", count=n,
                                 offset=body), rate
        pos = body + size + (size & 1)  # chunks are word-aligned
    return None


def attach_audio_payload(docs, *, id_col: str = "doc_id",
                         text_col: str = "text", rate: int = 8000):
    """Test helper: derive a deterministic REAL mono WAV payload from each
    doc's text — an md5-seeded sine mix the real decoder genuinely
    decodes (frequency/length/amplitude vary per doc)."""

    def fn(batch: pa.Table) -> pa.Table:
        payloads = []
        for t in batch[text_col].to_pylist():
            seed = hashlib.md5((t or "").encode("utf-8")).digest()
            freq = 100 + seed[0] * 8          # 100..2140 Hz
            n = rate // 8 + seed[1] * 16      # 1000..5080 samples
            amp = 4000 + seed[2] * 64         # avoid clipping
            tgrid = np.arange(n, dtype=np.float64) / rate
            wave = (amp * np.sin(2 * np.pi * freq * tgrid)).astype(np.int16)
            payloads.append(encode_wav(wave, rate))
        return pa.table({
            id_col: batch[id_col],
            "payload": pa.array(payloads, type=pa.binary()),
            "media_type": pa.array(["audio/wav"] * len(batch)),
        })

    return docs.map_batches(fn, batch_format="pyarrow")


class AudioFeatureExtractor:
    """Actor-pool stage: decode WAV bytes → (duration, rms, zero-crossing
    rate, peak). Same actor/batch discipline as ImageFeatureExtractor;
    unrecognized payloads take the md5 stub row (duration = -1)."""

    def __init__(self):
        self.codec = "wav-pcm16-numpy"

    def __call__(self, batch: pa.Table) -> pa.Table:
        dur, rms, zcr, peak = [], [], [], []
        for payload in batch["payload"].to_pylist():
            decoded = decode_wav(payload or b"")
            if decoded is None:
                d = hashlib.md5(payload or b"").digest()
                dur.append(-1.0)
                rms.append(d[0] / 255.0)
                zcr.append(d[1] / 255.0)
                peak.append(d[2] / 255.0)
                continue
            samples, rate = decoded
            x = samples.astype(np.float64) / 32768.0
            dur.append(len(x) / rate)
            rms.append(float(np.sqrt(np.mean(x * x))) if len(x) else 0.0)
            zcr.append(float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
                       if len(x) > 1 else 0.0)
            peak.append(float(np.max(np.abs(x))) if len(x) else 0.0)
        return pa.table({
            "doc_id": batch["doc_id"],
            "duration_sec": pa.array(dur, type=pa.float64()),
            "rms": pa.array(rms, type=pa.float64()),
            "zcr": pa.array(zcr, type=pa.float64()),
            "peak": pa.array(peak, type=pa.float64()),
        })


def extract_audio_features(media, *, concurrency=(1, 4), batch_size: int = 64):
    """media (doc_id, payload, media_type) → per-clip acoustic features on
    an actor pool."""
    return media.map_batches(AudioFeatureExtractor, concurrency=concurrency,
                             batch_size=batch_size, batch_format="pyarrow")


# --- video: motion-BMP container + frame sampling (real, pure numpy) -----

VIDEO_MAGIC = b"BMV1"


def encode_video(frames: list[np.ndarray], fps: int = 8) -> bytes:
    """List of (h, w, 3) uint8 RGB frames → length-prefixed motion-BMP
    container (magic, u32 n_frames, u32 fps, then per frame u32 length +
    BMP bytes). A deliberately trivial but REAL container: every frame is
    independently decodable with the BMP codec above, which is what lets
    frame sampling skip undecoded frames entirely — the sampler reads the
    length prefix and seeks, it never touches unsampled frame bytes
    (exactly the property ffmpeg keyframe-seeking gives a real pipeline)."""
    parts = [VIDEO_MAGIC, struct.pack("<II", len(frames), fps)]
    for px in frames:
        b = encode_bmp(px)
        parts.append(struct.pack("<I", len(b)))
        parts.append(b)
    return b"".join(parts)


def decode_video_index(payload: bytes) -> tuple[list[tuple[int, int]], int] | None:
    """Container bytes → ([(frame_offset, frame_len), ...], fps) WITHOUT
    decoding any pixels, or None when the payload isn't a motion-BMP."""
    if len(payload) < 12 or payload[:4] != VIDEO_MAGIC:
        return None
    n, fps = struct.unpack_from("<II", payload, 4)
    pos, idx = 12, []
    for _ in range(n):
        if pos + 4 > len(payload):
            return None
        (ln,) = struct.unpack_from("<I", payload, pos)
        pos += 4
        if pos + ln > len(payload):
            return None
        idx.append((pos, ln))
        pos += ln
    return idx, fps


def attach_video_payload(docs, *, id_col: str = "doc_id",
                         text_col: str = "text", fps: int = 8):
    """Test helper: deterministic REAL motion-BMP payload per doc —
    4..15 frames (md5 byte 3 of the text), each frame an 8×8 BMP whose
    pixels derive from the md5 chain so frames differ."""

    def fn(batch: pa.Table) -> pa.Table:
        payloads = []
        for t in batch[text_col].to_pylist():
            seed = hashlib.md5((t or "").encode("utf-8")).digest()
            n_frames = 4 + seed[3] % 12
            frames = []
            for f in range(n_frames):
                fseed = hashlib.md5(seed + bytes([f])).digest()
                px = np.frombuffer((fseed * 12)[:8 * 8 * 3], dtype=np.uint8)
                frames.append(px.reshape(8, 8, 3))
            payloads.append(encode_video(frames, fps))
        return pa.table({
            id_col: batch[id_col],
            "payload": pa.array(payloads, type=pa.binary()),
            "media_type": pa.array(["video/x-motion-bmp"] * len(batch)),
        })

    return docs.map_batches(fn, batch_format="pyarrow")


class FrameSampler:
    """Actor-pool stage: sample every ``stride``-th frame of each video and
    decode ONLY those (the container index makes skipping free). Emits one
    row per sampled frame — (doc_id, frame_idx, width, height, mean_r/g/b)
    — the fan-out shape a frame-level training pipeline consumes.
    Unrecognized payloads emit a single stub row (frame_idx = -1)."""

    def __init__(self, stride: int = 2):
        if stride < 1:
            raise ValueError("stride must be >= 1")
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, fidx, ws, hs, mr, mg, mb = [], [], [], [], [], [], []
        doc_ids = batch["doc_id"].to_pylist()
        for doc_id, payload in zip(doc_ids, batch["payload"].to_pylist()):
            payload = payload or b""
            parsed = decode_video_index(payload)
            if parsed is None:
                d = hashlib.md5(payload).digest()
                ids.append(doc_id)
                fidx.append(-1)
                ws.append(-1)
                hs.append(-1)
                mr.append(d[0] / 255.0)
                mg.append(d[1] / 255.0)
                mb.append(d[2] / 255.0)
                continue
            index, _fps = parsed
            for f in range(0, len(index), self.stride):
                off, ln = index[f]
                px = decode_bmp(payload[off:off + ln])
                if px is None:
                    continue
                h, w, _ = px.shape
                means = px.reshape(-1, 3).mean(axis=0) / 255.0
                ids.append(doc_id)
                fidx.append(f)
                ws.append(w)
                hs.append(h)
                mr.append(float(means[0]))
                mg.append(float(means[1]))
                mb.append(float(means[2]))
        return pa.table({
            "doc_id": pa.array(ids, type=batch["doc_id"].type),
            "frame_idx": pa.array(fidx, type=pa.int64()),
            "width": pa.array(ws, type=pa.int32()),
            "height": pa.array(hs, type=pa.int32()),
            "mean_r": pa.array(mr, type=pa.float64()),
            "mean_g": pa.array(mg, type=pa.float64()),
            "mean_b": pa.array(mb, type=pa.float64()),
        })


def sample_video_frames(media, stride: int = 2, *, concurrency=(1, 4),
                        batch_size: int = 32):
    """media (doc_id, payload, media_type) → one row per sampled frame on
    an actor pool. batch_size is smaller than the image stages': each row
    fans out to n_frames/stride output rows of decoded pixels."""
    return media.map_batches(FrameSampler, fn_constructor_args=(stride,),
                             concurrency=concurrency, batch_size=batch_size,
                             batch_format="pyarrow")


# --- PNG: real stdlib-zlib + numpy codec (8-bit RGB/RGBA, no interlace) --

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def encode_png(pixels: np.ndarray) -> bytes:
    """(h, w, 3|4) uint8 → PNG bytes (8-bit color, filter 0 scanlines,
    one zlib IDAT). Standard layout every PNG reader accepts."""
    import zlib

    h, w, ch = pixels.shape
    color_type = {3: 2, 4: 6}[ch]
    raw = np.zeros((h, 1 + w * ch), dtype=np.uint8)
    raw[:, 1:] = pixels.reshape(h, w * ch)  # filter byte 0 per scanline
    idat = zlib.compress(raw.tobytes(), 6)

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (_PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat)
            + chunk(b"IEND", b""))


def decode_png(payload: bytes) -> np.ndarray | None:
    """PNG bytes → (h, w, 3|4) uint8, or None if not an 8-bit truecolor
    non-interlaced PNG. Full filter support (None/Sub/Up/Average/Paeth):
    Sub/Average/Paeth carry a within-row dependency, so rows decode in a
    numpy loop over scanlines with vectorized column math — O(h) Python
    iterations, not O(h·w)."""
    import zlib

    if len(payload) < 45 or payload[:8] != _PNG_SIG:
        return None
    pos, w = 8, None
    idat = []
    h = bit_depth = color_type = interlace = None
    while pos + 8 <= len(payload):
        (ln,), tag = struct.unpack_from(">I", payload, pos), \
            payload[pos + 4:pos + 8]
        body = payload[pos + 8:pos + 8 + ln]
        if tag == b"IHDR":
            w, h, bit_depth, color_type, _, _, interlace = \
                struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if (w is None or bit_depth != 8 or color_type not in (2, 6)
            or interlace != 0 or not idat):
        return None
    ch = 3 if color_type == 2 else 4
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error:
        return None
    stride = 1 + w * ch
    if len(raw) != stride * h:
        return None
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride)
    filters = rows[:, 0]
    out = np.zeros((h, w * ch), dtype=np.uint8)
    for y in range(h):
        cur = rows[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else np.zeros(w * ch, np.int32)
        f = filters[y]
        if f == 0:
            line = cur
        elif f == 2:  # Up
            line = (cur + prev) & 0xFF
        elif f in (1, 3, 4):
            # left-dependent filters: per-pixel recurrence along the row
            line = np.empty(w * ch, dtype=np.int32)
            left = np.zeros(ch, dtype=np.int32)
            for x in range(w):
                s = slice(x * ch, (x + 1) * ch)
                up = prev[s]
                if f == 1:
                    line[s] = (cur[s] + left) & 0xFF
                elif f == 3:
                    line[s] = (cur[s] + ((left + up) >> 1)) & 0xFF
                else:  # Paeth
                    ul = (prev[s.start - ch:s.start] if x
                          else np.zeros(ch, np.int32))
                    p = left + up - ul
                    pa_, pb_, pc_ = (np.abs(p - left), np.abs(p - up),
                                     np.abs(p - ul))
                    pred = np.where((pa_ <= pb_) & (pa_ <= pc_), left,
                                    np.where(pb_ <= pc_, up, ul))
                    line[s] = (cur[s] + pred) & 0xFF
                left = line[s]
        else:
            return None
        out[y] = line.astype(np.uint8)
    return out.reshape(h, w, ch)


def decode_image(payload: bytes) -> np.ndarray | None:
    """Try every real codec (BMP, then PNG; alpha dropped) — the single
    entry the image stages use, so adding a codec upgrades them all."""
    px = decode_bmp(payload)
    if px is not None:
        return px
    px = decode_png(payload)
    if px is not None:
        return px[:, :, :3] if px.shape[2] == 4 else px
    return None


class ImagePHasher:
    """Actor-pool stage: decode → 60-bit average-hash (aHash) perceptual
    signature. The image is nearest-resized to a 6×10 grid (60 tiles —
    sized to the text SimHash's 60-bit band machinery, SIMHASH_BITS) and
    bit i is set iff tile i's INTEGER luminance sum beats the grid mean
    (compared cross-multiplied, ``60·v_i > Σv`` — no float, so the hash
    is bit-stable across platforms). Undecodable payloads fall back to
    the low 60 bits of md5(payload): unique-ish, so they never create
    false near-dup pairs. Output (id, simhash) feeds
    ``dedup.simhash_pairs(sigs=...)`` unchanged — IMAGE near-dup reuses
    the banded-Hamming text machinery."""

    GRID_H, GRID_W = 6, 10  # 60 tiles == SIMHASH_BITS

    def __call__(self, batch: pa.Table) -> pa.Table:
        import hashlib as _hl

        ids = batch["doc_id"]
        out = np.empty(len(batch), dtype=np.int64)
        for i, payload in enumerate(batch["payload"]):
            raw = payload.as_py()
            px = decode_image(raw)
            if px is None:
                out[i] = np.int64(int.from_bytes(
                    _hl.md5(raw).digest()[:8], "big") & ((1 << 60) - 1))
                continue
            small = resize_nearest(px, self.GRID_H, self.GRID_W)
            v = small.astype(np.int64).sum(axis=2).ravel()  # luminance sum
            bits = (len(v) * v) > v.sum()
            out[i] = np.int64(int.from_bytes(
                np.packbits(bits[::-1], bitorder="little").tobytes(),
                "little"))
        return pa.table({"doc_id": ids, "simhash": pa.array(out)})


def image_phash(media, *, concurrency=(1, 4), batch_size: int = 64):
    """(doc_id, simhash): perceptual signatures via the actor pool."""
    return media.map_batches(ImagePHasher, concurrency=concurrency,
                             batch_size=batch_size,
                             batch_format="pyarrow")


def phash_neardup_pairs(media, *, max_hamming: int = 3, n_bands: int = 4,
                        concurrency=(1, 4)):
    """Image near-dup pairs (a, b, hamming): pHash signatures → the text
    pipeline's banded-Hamming pair machinery (dedup.simhash_pairs with
    ``sigs=``) — exact recall at ≤ max_hamming by the same pigeonhole,
    one bucket shuffle, never all-pairs."""
    from blurrily_ray.stages.dedup import simhash_pairs

    sigs = image_phash(media, concurrency=concurrency)
    return simhash_pairs(None, max_hamming=max_hamming, n_bands=n_bands,
                         sigs=sigs)
