"""Multimodal (image/audio/video) column plumbing.

Binary payloads ride as opaque ``binary`` columns with typed metadata;
decode/feature stages are actor-pool ``map_batches`` with SMALL batch
sizes (payload bytes, not row count, size the batch — ray_guide
"Memory-aware").  The sandbox has no codec libraries, so the *decode*
kernels are deterministic fakes behind ``DecodeBackend`` — the Ray-side
plumbing (schemas, actor signatures, batch sizing, output layout) is
real and tested; swapping in Pillow/ffmpeg is a one-class change.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

from unfurl_ray.content.exif import sniff_image

IMAGE_META_TYPE = pa.struct(
    [("format", pa.string()), ("width", pa.int32()), ("height", pa.int32())]
)


class DecodeBackend:
    """Pluggable decode kernel.  The default is header-sniff only (real:
    dims/format from bytes) plus a deterministic fake pixel-feature
    vector; a real backend would return decoded arrays."""

    def sniff(self, data: bytes) -> dict | None:
        return sniff_image(data)

    def features(self, data: bytes, dim: int = 16) -> np.ndarray:
        # Deterministic stand-in for a visual embedding: chunked crc32s.
        if not data:
            return np.zeros(dim, dtype=np.float32)
        step = max(1, len(data) // dim)
        vals = [
            zlib.crc32(data[i * step: (i + 1) * step]) % 10_000 / 10_000
            for i in range(dim)
        ]
        return np.asarray(vals, dtype=np.float32)

    def decode_pixels(self, data: bytes):  # pragma: no cover - stub
        raise NotImplementedError(
            "pixel decode needs an image codec (Pillow/libvips); "
            "not available in this sandbox"
        )


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
