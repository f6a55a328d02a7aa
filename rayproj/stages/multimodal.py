"""Multimodal (image/audio/video) stages — Ray plumbing real, decode stubbed.

Binary payloads are opaque ``binary`` columns with typed metadata. The
decode kernels would require image/audio libraries not present in this
container, so they are STUBS: a deterministic fake decoder is used when
``fake=True`` (tests), otherwise NotImplementedError. Everything Ray-
side — schema, batch sizing for large payloads, actor signature,
output layout — is real and tested.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


class ImageDecodeStage:
    """Actor-pool stage: binary image column → (height, width, channels)
    metadata + fixed-size feature vector.

    Pass the CLASS to map_batches with small batch_size (large payloads:
    batch_size × concurrency must fit worker heap — see SURVEY.md §4).
    """

    def __init__(self, bin_col: str = "payload", feature_dim: int = 16, fake: bool = False):
        self.bin_col = bin_col
        self.feature_dim = feature_dim
        self.fake = fake
        # real implementation would load the codec/model here, once per actor

    def _decode(self, blob: bytes) -> tuple[int, int, int, np.ndarray]:
        if not self.fake:
            raise NotImplementedError(
                "image decoding requires an image library not present in this "
                "container; construct with fake=True for the deterministic stub"
            )
        # deterministic fake: dimensions + features from the content hash
        h = hashlib.md5(blob).digest()
        height = 16 + h[0]
        width = 16 + h[1]
        feat = np.frombuffer(hashlib.md5(blob + b"f").digest() * ((self.feature_dim * 8) // 16 + 1),
                             dtype=np.float64, count=self.feature_dim)
        return height, width, 3, np.ascontiguousarray(feat)

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch.column(self.bin_col).to_pylist()
        hs = np.empty(len(blobs), dtype=np.int32)
        ws = np.empty(len(blobs), dtype=np.int32)
        cs = np.empty(len(blobs), dtype=np.int32)
        feats = np.empty((len(blobs), self.feature_dim), dtype=np.float64)
        for i, b in enumerate(blobs):
            hs[i], ws[i], cs[i], feats[i] = self._decode(b or b"")
        out = batch.append_column("img_h", pa.array(hs))
        out = out.append_column("img_w", pa.array(ws))
        out = out.append_column("img_c", pa.array(cs))
        out = out.append_column(
            "features", pa.FixedSizeListArray.from_arrays(
                pa.array(feats.reshape(-1)), self.feature_dim
            )
        )
        return out


class FrameSampleStage:
    """Video frame sampling stub: binary video → every-nth-frame refs.
    Output is (url, frame_idx) rows — flat_map-shaped via map_batches."""

    def __init__(self, bin_col: str = "payload", key_col: str = "url",
                 every_n: int = 30, fake: bool = False):
        self.bin_col = bin_col
        self.key_col = key_col
        self.every_n = every_n
        self.fake = fake

    def _frame_count(self, blob: bytes) -> int:
        if not self.fake:
            raise NotImplementedError("video decoding requires a codec library")
        return 1 + hashlib.md5(blob).digest()[0]

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = batch.column(self.key_col).to_pylist()
        blobs = batch.column(self.bin_col).to_pylist()
        out_keys, out_frames = [], []
        for k, b in zip(keys, blobs):
            n = self._frame_count(b or b"")
            for f in range(0, n, self.every_n):
                out_keys.append(k)
                out_frames.append(f)
        return pa.table({
            self.key_col: pa.array(out_keys),
            "frame_idx": pa.array(out_frames, type=pa.int32()),
        })
