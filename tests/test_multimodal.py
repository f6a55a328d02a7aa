"""Multimodal stages: REAL header parsing on hand-constructed valid
PNG/GIF/BMP/JPEG/WAV/MP4 bytes (no codec libraries needed), plus the
deterministic fallback for unknown formats."""

import struct
import zlib

import numpy as np
import pyarrow as pa

from rayproj.stages.multimodal import (
    AudioMetaStage,
    FrameSampleStage,
    ImageDecodeStage,
    parse_image_dims,
    _binary_buffers,
)


def _png(w, h, color=2):
    ihdr = struct.pack(">II5B", w, h, 8, color, 0, 0, 0)
    chunk = b"IHDR" + ihdr
    return (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + chunk
            + struct.pack(">I", zlib.crc32(chunk)))


def _gif(w, h):
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00\x00\x00"


def _bmp(w, h):
    return b"BM" + b"\x00" * 12 + struct.pack("<IiiHH", 40, w, h, 1, 24) + b"\x00" * 8


def _jpeg(w, h, ncomp=3):
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof0 = b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, h, w, ncomp)
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def _wav(ch, rate, nsamp, bits=16):
    data_len = nsamp * ch * bits // 8
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * ch * bits // 8, ch * bits // 8, bits)
    return (b"RIFF" + struct.pack("<I", 36 + data_len) + b"WAVE"
            + b"fmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", data_len) + b"\x00" * min(data_len, 64))


def _box(typ, body):
    return struct.pack(">I", 8 + len(body)) + typ + body


def _mp4(nframes):
    stsz = _box(b"stsz", struct.pack(">BxxxII", 0, 0, nframes))
    inner = _box(b"moov", _box(b"trak", _box(b"mdia", _box(b"minf", _box(b"stbl", stsz)))))
    return _box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2") + inner


def test_image_dims_real_formats():
    blobs = [_png(640, 480), _gif(320, 200), _bmp(100, 50), _jpeg(1920, 1080), b"junk", b""]
    t = pa.table({"payload": pa.array(blobs, type=pa.binary())})
    out = ImageDecodeStage()(t)
    assert out.column("img_w").to_pylist()[:4] == [640, 320, 100, 1920]
    assert out.column("img_h").to_pylist()[:4] == [480, 200, 50, 1080]
    assert out.column("img_format").to_pylist() == [1, 2, 3, 4, 0, 0]
    # histogram features normalized by length
    feats = np.array(out.column("features").to_pylist())
    assert feats.shape == (6, 16)
    assert np.all(feats >= 0) and np.all(feats.sum(axis=1)[:5] > 0.99)


def test_image_dims_vectorized_matches_single():
    blobs = [_png(11, 22), _jpeg(33, 44, 1)]
    t = pa.array(blobs, type=pa.binary())
    data, off = _binary_buffers(t)
    h, w, c, fmt = parse_image_dims(data, off)
    assert list(h) == [22, 44] and list(w) == [11, 33]
    assert list(c) == [3, 1]


def test_audio_wav_parse():
    t = pa.table({"payload": pa.array([_wav(2, 44100, 1000), _wav(1, 8000, 5), b"x"],
                                      type=pa.binary())})
    out = AudioMetaStage()(t)
    assert out.column("audio_channels").to_pylist() == [2, 1, -1]
    assert out.column("audio_rate").to_pylist() == [44100, 8000, -1]
    assert out.column("audio_samples").to_pylist() == [1000, 5, -1]


def test_frame_sample_mp4_real_count():
    t = pa.table({"payload": pa.array([_mp4(90), _mp4(1)], type=pa.binary()),
                  "url": ["a", "b"]})
    out = FrameSampleStage(every_n=30)(t)
    df = out.to_pandas()
    assert df.query("url=='a'")["frame_idx"].tolist() == [0, 30, 60]
    assert df.query("url=='b'")["frame_idx"].tolist() == [0]


def test_frame_sample_fallback_deterministic():
    t = pa.table({"payload": pa.array([b"not-a-video"], type=pa.binary()), "url": ["x"]})
    a = FrameSampleStage(every_n=10)(t).to_pandas()
    b = FrameSampleStage(every_n=10)(t).to_pandas()
    assert a.equals(b) and len(a) >= 1


def test_png_pixel_stage_decodes_filters():
    """Real IDAT decode (round-5): zlib inflate + None/Sub/Up unfilter
    must reproduce the planted pixel sums; truncated/corrupt blobs get
    -1 sentinels."""
    import numpy as np
    import pyarrow as pa

    from rayproj.stages.multimodal import PngPixelStage, make_png

    w, h = 13, 9
    px = ((np.arange(w)[None, :] + 2 * np.arange(h)[:, None] + 5) % 256
          ).astype(np.uint8)
    blobs = [
        make_png(w, h, px, 0),                                   # all None
        make_png(w, h, px, 0, np.arange(h, dtype=np.uint8) % 3), # mixed
        make_png(w, h, ((np.arange(w * h * 3) * 7) % 256
                        ).astype(np.uint8), 2),                  # RGB
        b"not a png",
        make_png(w, h, px, 0)[:30],                              # truncated
    ]
    batch = pa.table({"payload": pa.array(blobs, type=pa.binary())})
    out = PngPixelStage()(batch)
    s = int(px.astype(np.int64).sum())
    s3 = int((((np.arange(w * h * 3) * 7) % 256).astype(np.int64)).sum())
    assert out.column("px_sum").to_pylist() == [s, s, s3, -1, -1]
    assert out.column("px_w").to_pylist() == [w, w, w, -1, -1]
    assert out.column("px_h").to_pylist() == [h, h, h, -1, -1]


def test_png_idat_crc_rejected():
    import numpy as np
    import pyarrow as pa

    from rayproj.stages.multimodal import PngPixelStage, make_png

    blob = bytearray(make_png(8, 8, np.zeros(64, np.uint8), 0))
    # flip one IDAT payload byte -> CRC mismatch -> sentinel
    idx = blob.index(b"IDAT") + 6
    blob[idx] ^= 0xFF
    out = PngPixelStage()(
        pa.table({"payload": pa.array([bytes(blob)], type=pa.binary())})
    )
    assert out.column("px_sum").to_pylist() == [-1]
