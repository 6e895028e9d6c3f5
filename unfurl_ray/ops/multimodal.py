"""Multimodal (image/audio/video) column plumbing.

Binary payloads ride as opaque ``binary`` columns with typed metadata;
decode/feature stages are actor-pool ``map_batches`` with SMALL batch
sizes (payload bytes, not row count, size the batch — ray_guide
"Memory-aware").  The sandbox has no codec LIBRARIES, but uncompressed
formats need none: ``decode_png`` (zlib + numpy unfiltering) and
``decode_bmp`` are real pure-Python decoders, so PNG/BMP payloads get
REAL pixels through ``DecodeBackend`` (features, pHash, resize); other
formats keep the deterministic chunk-fingerprint fallback, and
swapping in Pillow/ffmpeg remains a one-class change.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

from unfurl_ray.content.exif import sniff_image

IMAGE_META_TYPE = pa.struct(
    [("format", pa.string()), ("width", pa.int32()), ("height", pa.int32())]
)

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def decode_png(data: bytes):
    """Pure-Python/numpy PNG decode: 8-bit, non-interlaced gray / RGB /
    palette / gray+alpha / RGBA.  Returns an (H, W, C) uint8 array
    ((H, W) for grayscale), ``None`` when the bytes are not a PNG at
    all, and raises ``ValueError`` on unsupported variants (16-bit,
    interlaced) or truncation.  Filters 0/1/2 unfilter vectorized per
    scanline (sub is a per-channel cumsum); 3/4 (average/Paeth) fall
    back to a per-byte loop — fine at fixture scale, and encoders of
    synthetic/raw imagery overwhelmingly emit 0/2."""
    if len(data) < 8 or data[:8] != _PNG_SIG:
        return None
    pos, idat, plte, hdr = 8, [], None, None
    while pos + 8 <= len(data):
        ln = int.from_bytes(data[pos:pos + 4], "big")
        typ = data[pos + 4:pos + 8]
        chunk = data[pos + 8:pos + 8 + ln]
        pos += 12 + ln
        if typ == b"IHDR":
            hdr = (
                int.from_bytes(chunk[0:4], "big"),
                int.from_bytes(chunk[4:8], "big"),
                chunk[8], chunk[9], chunk[12],
            )
        elif typ == b"PLTE":
            plte = np.frombuffer(chunk, np.uint8).reshape(-1, 3)
        elif typ == b"IDAT":
            idat.append(chunk)
        elif typ == b"IEND":
            break
    if hdr is None or not idat:
        raise ValueError("truncated PNG (no IHDR/IDAT)")
    w, h, depth, ctype, interlace = hdr
    ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
    if depth != 8 or interlace != 0 or ch is None:
        raise ValueError(
            f"unsupported PNG variant (depth={depth} color={ctype} "
            f"interlace={interlace})"
        )
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), np.uint8)
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG data length mismatch")
    raw = raw.reshape(h, stride + 1)
    out = np.empty((h, stride), np.int64)
    prev = np.zeros(stride, np.int64)
    for y in range(h):
        f = int(raw[y, 0])
        line = raw[y, 1:].astype(np.int64)
        if f == 0:
            rec = line
        elif f == 1:  # sub: per-channel prefix sum along the row
            rec = line.reshape(w, ch).cumsum(axis=0).reshape(stride)
        elif f == 2:  # up
            rec = line + prev
        elif f in (3, 4):  # average / Paeth: sequential in x
            rec = np.empty(stride, np.int64)
            for x in range(stride):
                a = rec[x - ch] if x >= ch else 0
                b = prev[x]
                if f == 3:
                    pred = (a + b) // 2
                else:
                    c = prev[x - ch] if x >= ch else 0
                    p = a + b - c
                    da, db, dc = abs(p - a), abs(p - b), abs(p - c)
                    pred = (
                        a if (da <= db and da <= dc)
                        else (b if db <= dc else c)
                    )
                rec[x] = (line[x] + pred) % 256
        else:
            raise ValueError(f"bad PNG filter {f}")
        rec = rec % 256
        out[y] = rec
        prev = rec
    px = out.astype(np.uint8).reshape(h, w, ch)
    if ctype == 3:
        if plte is None:
            raise ValueError("palette PNG without PLTE")
        px = plte[px[..., 0]]
    if px.shape[2] == 1:
        px = px[..., 0]
    return px


def decode_bmp(data: bytes):
    """Uncompressed 24/32-bit BMP decode (BGR(A) -> RGB(A), bottom-up
    or top-down).  Returns (H, W, C) uint8, ``None`` when not a BMP,
    ``ValueError`` for compressed/other bit depths."""
    if len(data) < 54 or data[:2] != b"BM":
        return None
    off = int.from_bytes(data[10:14], "little")
    w = int.from_bytes(data[18:22], "little", signed=True)
    h = int.from_bytes(data[22:26], "little", signed=True)
    bpp = int.from_bytes(data[28:30], "little")
    comp = int.from_bytes(data[30:34], "little")
    if comp != 0 or bpp not in (24, 32) or w <= 0 or h == 0:
        raise ValueError(
            f"unsupported BMP (bpp={bpp} compression={comp})"
        )
    topdown, h = h < 0, abs(h)
    nb = bpp // 8
    rowsz = (w * nb + 3) // 4 * 4
    if off + rowsz * h > len(data):
        raise ValueError("truncated BMP")
    px = (
        np.frombuffer(data[off:off + rowsz * h], np.uint8)
        .reshape(h, rowsz)[:, : w * nb]
        .reshape(h, w, nb)
    )
    px = px[..., [2, 1, 0]] if nb == 3 else px[..., [2, 1, 0, 3]]
    if not topdown:
        px = px[::-1]
    return np.ascontiguousarray(px)


def decode_image(data: bytes):
    """PNG-or-BMP pixel decode; None when bytes are neither format."""
    px = decode_png(data)
    if px is None:
        px = decode_bmp(data)
    return px


def _pooled_gray(px: np.ndarray, side: int) -> np.ndarray:
    """side x side average-pooled grayscale in [0, 1] — the real
    pixel feature grid (aHash's thumbnail when side=8)."""
    g = (
        px[..., :3].mean(axis=2) if px.ndim == 3
        else px.astype(np.float64)
    )
    hh, ww = g.shape
    ridx = (np.arange(hh) * side) // hh
    cidx = (np.arange(ww) * side) // ww
    cell = (ridx[:, None] * side + cidx[None, :]).ravel()
    sums = np.bincount(cell, weights=g.ravel(), minlength=side * side)
    cnts = np.maximum(np.bincount(cell, minlength=side * side), 1)
    return (sums / cnts / 255.0).astype(np.float32)


class DecodeBackend:
    """Pluggable decode kernel.  The default sniffs dims/format from
    headers (real) and decodes REAL pixels for PNG/BMP payloads (pure
    zlib + numpy, no codec library); for other formats the feature
    vector falls back to a deterministic chunk-fingerprint fake and
    ``decode_pixels`` raises."""

    def sniff(self, data: bytes) -> dict | None:
        return sniff_image(data)

    def features(self, data: bytes, dim: int = 16) -> np.ndarray:
        if not data:
            return np.zeros(dim, dtype=np.float32)
        side = int(round(dim ** 0.5))
        if side * side == dim:
            try:
                px = decode_image(data)
            except (ValueError, zlib.error):
                px = None  # malformed PNG/BMP: fingerprint fallback
            if px is not None:
                return _pooled_gray(px, side)
        # Deterministic stand-in for a visual embedding: chunked crc32s.
        step = max(1, len(data) // dim)
        vals = [
            zlib.crc32(data[i * step: (i + 1) * step]) % 10_000 / 10_000
            for i in range(dim)
        ]
        return np.asarray(vals, dtype=np.float32)

    def decode_pixels(self, data: bytes):
        px = decode_image(data)
        if px is None:
            raise NotImplementedError(
                "pixel decode for non-PNG/BMP formats needs an image "
                "codec (Pillow/libvips), not available in this "
                "sandbox; PNG (8-bit) and uncompressed BMP decode "
                "natively"
            )
        return px


class ImageMeta:
    """Actor-pool stage: binary column -> typed image metadata struct."""

    def __init__(self, column: str = "content"):
        self.column = column
        self.backend = DecodeBackend()

    def __call__(self, batch: pa.Table) -> pa.Table:
        metas = []
        for data in batch.column(self.column).to_pylist():
            meta = self.backend.sniff(data or b"") or {}
            metas.append(
                {
                    "format": meta.get("format"),
                    "width": meta.get("width"),
                    "height": meta.get("height"),
                }
            )
        return batch.append_column(
            "image_meta", pa.array(metas, IMAGE_META_TYPE)
        )


class ImageFeatures:
    """Actor-pool stage: binary column -> fixed-dim feature vector."""

    def __init__(self, column: str = "content", dim: int = 16):
        self.column = column
        self.dim = dim
        self.backend = DecodeBackend()

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [
            self.backend.features(data or b"", self.dim).tolist()
            for data in batch.column(self.column).to_pylist()
        ]
        return batch.append_column(
            "features", pa.array(feats, pa.list_(pa.float32()))
        )


def image_meta_pipeline(ds, concurrency: int = 2, batch_size: int = 32):
    """Small batch_size: rows are megabyte-scale binaries; batch bytes =
    batch_size x payload must fit the actor heap."""
    return ds.map_batches(
        ImageMeta,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def sniff_wav(data: bytes) -> dict | None:
    """Real WAV (RIFF/WAVE) header parse: rate, channels, bits, duration.

    Walks the chunk list (fmt / data may come in any order after the
    RIFF header); no codec needed for PCM metadata.
    """
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        return None
    out: dict = {"format": "audio/wav"}
    pos = 12
    byte_rate = data_size = None
    while pos + 8 <= len(data):
        cid = data[pos: pos + 4]
        size = int.from_bytes(data[pos + 4: pos + 8], "little")
        body = data[pos + 8: pos + 8 + size]
        if cid == b"fmt " and len(body) >= 16:
            out["channels"] = int.from_bytes(body[2:4], "little")
            out["sample_rate"] = int.from_bytes(body[4:8], "little")
            byte_rate = int.from_bytes(body[8:12], "little")
            out["bits_per_sample"] = int.from_bytes(body[14:16], "little")
        elif cid == b"data":
            data_size = size
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if byte_rate and data_size is not None:
        out["duration_ms"] = int(round(data_size / byte_rate * 1000))
    return out if "sample_rate" in out else None


AUDIO_META_TYPE = pa.struct(
    [
        ("format", pa.string()),
        ("sample_rate", pa.int32()),
        ("channels", pa.int32()),
        ("bits_per_sample", pa.int32()),
        ("duration_ms", pa.int64()),
    ]
)


class AudioMeta:
    """Actor-pool stage: audio binary column -> typed metadata struct
    (WAV header parse is real; other containers -> nulls)."""

    def __init__(self, column: str = "content"):
        self.column = column

    def __call__(self, batch: pa.Table) -> pa.Table:
        metas = []
        for data in batch.column(self.column).to_pylist():
            meta = sniff_wav(data or b"") or {}
            metas.append(
                {k: meta.get(k) for k in (
                    "format", "sample_rate", "channels",
                    "bits_per_sample", "duration_ms")}
            )
        return batch.append_column(
            "audio_meta", pa.array(metas, AUDIO_META_TYPE)
        )


FRAME_TYPE = pa.list_(
    pa.struct([("frame_idx", pa.int32()), ("ts_ms", pa.int64()),
               ("data", pa.binary())])
)


class FrameSample:
    """Actor-pool stage: video binary -> n sampled "frames".

    Real frame decode needs ffmpeg (absent here) — the sampler is a
    clearly-marked deterministic fake (fixed-stride byte windows with
    synthetic timestamps) so the Ray plumbing (list<struct> layout,
    per-frame bytes, batch sizing by payload) is exercised for real.
    Swap ``_cut`` for an ffmpeg-backed keyframe extractor in prod.
    """

    def __init__(self, column: str = "content", n_frames: int = 4,
                 frame_bytes: int = 64, fps_ms: int = 40):
        self.column = column
        self.n = n_frames
        self.frame_bytes = frame_bytes
        self.fps_ms = fps_ms

    def _cut(self, data: bytes) -> list[dict]:
        if not data:
            return []
        step = max(1, len(data) // self.n)
        return [
            {
                "frame_idx": i,
                "ts_ms": i * step * self.fps_ms // max(1, self.frame_bytes),
                "data": data[i * step: i * step + self.frame_bytes],
            }
            for i in range(min(self.n, (len(data) + step - 1) // step))
        ]

    def __call__(self, batch: pa.Table) -> pa.Table:
        frames = [
            self._cut(d or b"")
            for d in batch.column(self.column).to_pylist()
        ]
        return batch.append_column("frames", pa.array(frames, FRAME_TYPE))


class ImageResize:
    """Actor-pool stage signature for image resize.

    Pixel work needs a codec (Pillow/libvips — absent in this sandbox):
    ``DecodeBackend.decode_pixels`` raises NotImplementedError, and this
    stage surfaces that unless given a fake backend.  The schema
    contract (adds ``resized: binary`` + ``resized_meta`` struct) and
    batch plumbing are real and covered by tests via the fake.
    """

    def __init__(self, column: str = "content", width: int = 64,
                 height: int = 64, backend: DecodeBackend | None = None):
        self.column = column
        self.width = width
        self.height = height
        self.backend = backend or DecodeBackend()

    def _resize_one(self, data: bytes) -> bytes:
        # PNG/BMP decode natively (ndarray) -> real nearest-neighbor
        # sample to (height, width); other formats raise unless an
        # injected backend supplies bytes, kept for plumbing tests
        pixels = self.backend.decode_pixels(data)
        if isinstance(pixels, np.ndarray):
            hh, ww = pixels.shape[:2]
            ridx = (np.arange(self.height) * hh) // self.height
            cidx = (np.arange(self.width) * ww) // self.width
            return pixels[ridx][:, cidx].astype(np.uint8).tobytes()
        return bytes(pixels)[: self.width * self.height]

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = [self._resize_one(d or b"")
               for d in batch.column(self.column).to_pylist()]
        meta = [{"format": "image/raw", "width": self.width,
                 "height": self.height} for _ in out]
        return batch.append_column(
            "resized", pa.array(out, pa.binary())
        ).append_column("resized_meta", pa.array(meta, IMAGE_META_TYPE))


def audio_meta_pipeline(ds, concurrency: int = 2, batch_size: int = 64):
    return ds.map_batches(
        AudioMeta, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1,
    )


def frame_sample_pipeline(ds, concurrency: int = 2, batch_size: int = 16,
                          n_frames: int = 4):
    """Tiny batch_size: each row may be a multi-MB video blob and the
    output multiplies it by n_frames."""
    return ds.map_batches(
        FrameSample, fn_constructor_kwargs={"n_frames": n_frames},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1,
    )


class ImagePHash:
    """Actor-pool stage: binary column -> 64-bit perceptual hash.

    aHash: a 64-d feature vector per image — the REAL 8x8
    average-pooled gray thumbnail for PNG/BMP payloads (native
    decoders above), the deterministic chunk fingerprint for formats
    needing a codec — thresholded at its own median and packed to one
    int64, so near-identical pixels flip few bits and Hamming
    distance measures visual similarity.  Re-encodings of the same
    pixels (different compression/filters, PNG vs BMP) hash
    identically on the real path (pytest-pinned)."""

    def __init__(self, column: str = "content",
                 backend: DecodeBackend | None = None):
        self.column = column
        self.backend = backend or DecodeBackend()

    def __call__(self, batch: pa.Table) -> pa.Table:
        hashes = []
        for data in batch.column(self.column).to_pylist():
            f = self.backend.features(data or b"", dim=64)
            bits = f > np.median(f)
            h = np.uint64(0)
            for b in bits:
                h = (h << np.uint64(1)) | np.uint64(bool(b))
            hashes.append(np.int64(h.astype(np.int64)))
        return batch.append_column(
            "phash", pa.array(hashes, pa.int64())
        )


def _popcount64(v: np.ndarray) -> np.ndarray:
    """Vectorized popcount of int64 values via the uint8 view."""
    b = v.astype(np.uint64).view(np.uint8).reshape(len(v), 8)
    return np.unpackbits(b, axis=1).sum(axis=1)


def phash_hamming_pairs(ds, id_col: str = "doc_id",
                        max_dist: int = 4):
    """Near-duplicate image pairs by banded perceptual-hash Hamming
    distance: each 64-bit phash splits into four 16-bit bands; two
    hashes within Hamming ``max_dist`` <= 15 must agree on at least
    one full band (pigeonhole over 4 bands), so candidate generation
    is a band-bucket groupby — no all-pairs — and the exact popcount
    check runs vectorized inside each bucket.  Same LSH shape as
    SimHash text dedup (ops/dedup.py)."""
    import pandas as pd

    from ray.data.aggregate import Min

    def fan_bands(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        ph = batch.column("phash").to_numpy(zero_copy_only=False)
        n = len(ids)
        band = np.tile(np.arange(4, dtype=np.int64), n)
        vals = (
            np.repeat(ph, 4).astype(np.uint64)
            >> (band.astype(np.uint64) * np.uint64(16))
        ) & np.uint64(0xFFFF)
        return pa.table(
            {
                id_col: pa.array(np.repeat(ids, 4), pa.int64()),
                "phash": pa.array(np.repeat(ph, 4), pa.int64()),
                "band_key": pa.array(
                    (band << np.int64(16))
                    | vals.astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    def pairs_in_bucket(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop_duplicates(id_col).sort_values(id_col)
        ids = g[id_col].to_numpy()
        ph = g["phash"].to_numpy()
        if len(g) < 2:
            return pd.DataFrame(
                {"id_a": [], "id_b": [], "dist": []}
            ).astype({"id_a": "int64", "id_b": "int64",
                      "dist": "int64"})
        ia, ib = np.triu_indices(len(g), k=1)
        x = np.bitwise_xor(
            ph[ia].astype(np.uint64), ph[ib].astype(np.uint64)
        ).astype(np.int64)
        d = _popcount64(x)
        keep = d <= max_dist
        return pd.DataFrame(
            {
                "id_a": ids[ia[keep]].astype(np.int64),
                "id_b": ids[ib[keep]].astype(np.int64),
                "dist": d[keep].astype(np.int64),
            }
        )

    pairs = (
        ds.map_batches(fan_bands, batch_format="pyarrow")
        .groupby("band_key")
        .map_groups(pairs_in_bucket, batch_format="pandas")
    )
    # pairs found via several agreeing bands dedupe on the tiny table
    return pairs.groupby(["id_a", "id_b"]).aggregate(
        Min("dist", alias_name="dist")
    )
