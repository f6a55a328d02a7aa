"""Minimal GeoTIFF grid reader (pure Python, from the TIFF 6.0 /
BigTIFF / GeoTIFF public specs).

Covers what the reference's Cloud-Optimized-GeoTIFF grid layer supports
(/root/reference/src/grids.cpp:357-1110, :2110-2296): classic + BigTIFF
in either byte order, strips and tiles, uncompressed / DEFLATE / LZW,
predictors 2 (horizontal) and 3 (floating point), int16/uint16/int32/
uint32/float32/float64 samples, contiguous or separate planar layout,
multiple IFDs (subgrids / overviews via NewSubfileType), GDAL_METADATA
channel descriptions (latitude_offset/longitude_offset,
geoid_undulation/vertical_offset, UNITTYPE, positive_value,
scale/offset, grid_name/parent_grid_name) and GDAL_NODATA.

Unlike the reference's tile-at-a-time LRU cache, whole grids decode
into NumPy arrays once per actor (grids are MBs; batches are vectorized).
"""

from __future__ import annotations

import re
import struct
import zlib

import numpy as np

from ..core.constants import DEG_TO_RAD, M_PI
from ..core.errors import ERR_FAILED_TO_LOAD_GRID, ProjError

SEC_TO_RAD = DEG_TO_RAD / 3600.0

# tag ids
T_NEWSUBFILETYPE = 254
T_WIDTH = 256
T_LENGTH = 257
T_BITSPERSAMPLE = 258
T_COMPRESSION = 259
T_PHOTOMETRIC = 262
T_STRIPOFFSETS = 273
T_SAMPLESPERPIXEL = 277
T_ROWSPERSTRIP = 278
T_STRIPBYTECOUNTS = 279
T_PLANARCONFIG = 284
T_PREDICTOR = 317
T_TILEWIDTH = 322
T_TILELENGTH = 323
T_TILEOFFSETS = 324
T_TILEBYTECOUNTS = 325
T_SAMPLEFORMAT = 339
T_GEOPIXELSCALE = 33550
T_GEOTIEPOINTS = 33922
T_GEOTRANSMATRIX = 34264
T_GEOKEYDIRECTORY = 34735
T_GDAL_METADATA = 42112
T_GDAL_NODATA = 42113

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8, 11: 4, 12: 8, 16: 8, 17: 8, 13: 4}
_TYPE_FMT = {1: "B", 2: "c", 3: "H", 4: "I", 6: "b", 8: "h", 9: "i", 11: "f", 12: "d", 16: "Q", 17: "q", 13: "I", 7: "B"}


class TiffIFD:
    def __init__(self, tags: dict):
        self.tags = tags


class TiffGridPage:
    """One decoded IFD: full-resolution sample planes + metadata."""

    def __init__(self, width, height, extent, samples, metadata, nodata, subfile_type):
        self.width = width
        self.height = height
        # extent = (west, south, east, north, res_x, res_y) in radians
        # (or CRS units when projected); rows south-first after decode.
        self.extent = extent
        self.samples = samples  # list of (H, W) float64 arrays, south-first
        self.metadata = metadata  # dict[(sample, key)] = value (sample −1 = dataset)
        self.nodata = nodata
        self.subfile_type = subfile_type

    def meta(self, key: str, sample: int = -1) -> str:
        return self.metadata.get((sample, key), "")


def _read_ifd(data, bo, off, big):
    tags = {}
    if big:
        (count,) = struct.unpack_from(bo + "Q", data, off)
        pos = off + 8
        entry_size = 20
    else:
        (count,) = struct.unpack_from(bo + "H", data, off)
        pos = off + 2
        entry_size = 12
    for _ in range(count):
        if big:
            tag, typ, n = struct.unpack_from(bo + "HHQ", data, pos)
            value_off = pos + 12
            inline = 8
        else:
            tag, typ, n = struct.unpack_from(bo + "HHI", data, pos)
            value_off = pos + 8
            inline = 4
        size = _TYPE_SIZES.get(typ, 1) * n
        if size <= inline:
            voff = value_off
        else:
            if big:
                (voff,) = struct.unpack_from(bo + "Q", data, value_off)
            else:
                (voff,) = struct.unpack_from(bo + "I", data, value_off)
        if typ == 2:  # ASCII
            raw = data[voff:voff + n]
            tags[tag] = raw.split(b"\0", 1)[0].decode("utf-8", "replace")
        elif typ in _TYPE_FMT:
            fmt = _TYPE_FMT[typ]
            vals = struct.unpack_from(bo + fmt * n, data, voff)
            if typ == 5:  # RATIONAL pairs — not needed, skip
                vals = vals
            tags[tag] = list(vals)
        pos += entry_size
    if big:
        (next_off,) = struct.unpack_from(bo + "Q", data, pos)
    else:
        (next_off,) = struct.unpack_from(bo + "I", data, pos)
    return TiffIFD(tags), next_off


def _lzw_decode(src: bytes) -> bytes:
    """TIFF LZW (MSB-first codes, early change)."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    table: list[bytes] = []

    def reset():
        nonlocal table
        table = [bytes([i]) for i in range(256)] + [b"", b""]

    reset()
    bitpos = 0
    nbits = 9
    prev: bytes | None = None
    total_bits = len(src) * 8
    while bitpos + nbits <= total_bits:
        byte_idx = bitpos >> 3
        chunk = src[byte_idx:byte_idx + 4]
        val = int.from_bytes(chunk.ljust(4, b"\0"), "big")
        code = (val >> (32 - (bitpos & 7) - nbits)) & ((1 << nbits) - 1)
        bitpos += nbits
        if code == EOI:
            break
        if code == CLEAR:
            reset()
            nbits = 9
            prev = None
            continue
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        else:
            entry = prev + prev[:1]
            table.append(entry)
        out += entry
        prev = entry
        if len(table) + 1 >= (1 << nbits) and nbits < 12:
            nbits += 1
    return bytes(out)


def _undo_predictor(raw: np.ndarray, predictor: int, rows: int, cols: int,
                    nsamples: int, dtype: np.dtype, bo: str) -> np.ndarray:
    """raw: 1-D uint8 buffer of one block. Returns (rows, cols*nsamples)
    typed array."""
    itemsize = dtype.itemsize
    row_bytes = cols * nsamples * itemsize
    buf = raw[: rows * row_bytes].reshape(rows, row_bytes)
    if predictor == 3:
        # floating-point predictor: byte-diff accumulate, then byte planes
        acc = np.cumsum(buf.astype(np.uint16), axis=1).astype(np.uint8)
        planes = acc.reshape(rows, itemsize, cols * nsamples)
        # planes[0] = MSB … big-endian reassembly
        be = np.empty((rows, cols * nsamples, itemsize), dtype=np.uint8)
        for b in range(itemsize):
            be[:, :, b] = planes[:, b, :]
        flat = be.reshape(rows, cols * nsamples * itemsize)
        arr = np.frombuffer(flat.tobytes(), dtype=">" + dtype.char).reshape(
            rows, cols * nsamples
        )
        return arr.astype(dtype)
    arr = np.frombuffer(buf.tobytes(), dtype=bo + dtype.char).reshape(
        rows, cols * nsamples
    )
    if predictor == 2:
        # horizontal differencing per sample
        a3 = arr.reshape(rows, cols, nsamples)
        a3 = np.cumsum(a3, axis=1, dtype=a3.dtype)
        arr = a3.reshape(rows, cols * nsamples)
    return arr


def read_tiff_grid_pages(data: bytes, name: str) -> list[TiffGridPage]:
    if data[:2] == b"II":
        bo = "<"
    elif data[:2] == b"MM":
        bo = ">"
    else:
        raise ProjError(ERR_FAILED_TO_LOAD_GRID, f"{name}: not a TIFF")
    (version,) = struct.unpack_from(bo + "H", data, 2)
    if version == 42:
        big = False
        (ifd_off,) = struct.unpack_from(bo + "I", data, 4)
    elif version == 43:
        big = True
        (ifd_off,) = struct.unpack_from(bo + "Q", data, 8)
    else:
        raise ProjError(ERR_FAILED_TO_LOAD_GRID, f"{name}: bad TIFF version")

    pages = []
    while ifd_off:
        ifd, ifd_off = _read_ifd(data, bo, ifd_off, big)
        pages.append(_decode_page(data, bo, ifd, name))
        if len(pages) > 1024:
            break
    return [p for p in pages if p is not None]


def _decode_page(data, bo, ifd: TiffIFD, name: str) -> TiffGridPage | None:
    t = ifd.tags
    width = int(t.get(T_WIDTH, [0])[0])
    height = int(t.get(T_LENGTH, [0])[0])
    if not width or not height:
        return None
    nsamples = int(t.get(T_SAMPLESPERPIXEL, [1])[0])
    bits = int(t.get(T_BITSPERSAMPLE, [32])[0])
    fmt = int(t.get(T_SAMPLEFORMAT, [1])[0])
    planar = int(t.get(T_PLANARCONFIG, [1])[0])
    compression = int(t.get(T_COMPRESSION, [1])[0])
    predictor = int(t.get(T_PREDICTOR, [1])[0])
    subfile_type = int(t.get(T_NEWSUBFILETYPE, [0])[0])

    if fmt == 1:
        dtype = {16: np.uint16, 32: np.uint32}.get(bits)
    elif fmt == 2:
        dtype = {16: np.int16, 32: np.int32}.get(bits)
    elif fmt == 3:
        dtype = {32: np.float32, 64: np.float64}.get(bits)
    else:
        dtype = None
    if dtype is None:
        raise ProjError(ERR_FAILED_TO_LOAD_GRID, f"{name}: unsupported sample type")
    dtype = np.dtype(dtype)

    def decompress(chunk: bytes) -> bytes:
        if compression == 1:
            return chunk
        if compression in (8, 32946):
            return zlib.decompress(chunk)
        if compression == 5:
            return _lzw_decode(chunk)
        raise ProjError(ERR_FAILED_TO_LOAD_GRID, f"{name}: unsupported compression {compression}")

    tiled = T_TILEOFFSETS in t
    nplanes = nsamples if planar == 2 else 1
    samples_per_block = 1 if planar == 2 else nsamples
    full = np.zeros((height, width, nsamples), dtype=np.float64)
    if tiled:
        tw = int(t[T_TILEWIDTH][0])
        th = int(t[T_TILELENGTH][0])
        offsets = t[T_TILEOFFSETS]
        counts = t[T_TILEBYTECOUNTS]
        tiles_x = (width + tw - 1) // tw
        tiles_y = (height + th - 1) // th
        for plane in range(nplanes):
            for ty in range(tiles_y):
                for tx in range(tiles_x):
                    bid = plane * tiles_x * tiles_y + ty * tiles_x + tx
                    raw = decompress(bytes(data[int(offsets[bid]):int(offsets[bid]) + int(counts[bid])]))
                    arr = _undo_predictor(
                        np.frombuffer(raw, dtype=np.uint8), predictor, th, tw,
                        samples_per_block, dtype, bo,
                    ).reshape(th, tw, samples_per_block)
                    y0, x0 = ty * th, tx * tw
                    y1, x1 = min(y0 + th, height), min(x0 + tw, width)
                    if planar == 2:
                        full[y0:y1, x0:x1, plane] = arr[: y1 - y0, : x1 - x0, 0]
                    else:
                        full[y0:y1, x0:x1, :] = arr[: y1 - y0, : x1 - x0, :]
    else:
        rps = int(t.get(T_ROWSPERSTRIP, [height])[0])
        rps = min(rps, height)
        offsets = t[T_STRIPOFFSETS]
        counts = t[T_STRIPBYTECOUNTS]
        strips_per_plane = (height + rps - 1) // rps
        for plane in range(nplanes):
            for sy in range(strips_per_plane):
                bid = plane * strips_per_plane + sy
                raw = decompress(bytes(data[int(offsets[bid]):int(offsets[bid]) + int(counts[bid])]))
                y0 = sy * rps
                rows = min(rps, height - y0)
                arr = _undo_predictor(
                    np.frombuffer(raw, dtype=np.uint8), predictor, rows, width,
                    samples_per_block, dtype, bo,
                ).reshape(rows, width, samples_per_block)
                if planar == 2:
                    full[y0:y0 + rows, :, plane] = arr[:, :, 0]
                else:
                    full[y0:y0 + rows, :, :] = arr

    # --- georeferencing (grids.cpp:990-1060) ---
    is_geographic = True
    pixel_is_area = False
    geokeys = t.get(T_GEOKEYDIRECTORY)
    if geokeys:
        for i in range(4, len(geokeys) - 3, 4):
            if geokeys[i] == 1024:  # GTModelTypeGeoKey
                if geokeys[i + 3] == 1:
                    is_geographic = False
            elif geokeys[i] == 1025 and geokeys[i + 3] == 1:  # pixel is area
                pixel_is_area = True

    matrix = t.get(T_GEOTRANSMATRIX)
    if matrix and len(matrix) == 16:
        west = matrix[3]
        h_res = matrix[0]
        north = matrix[7]
        v_res = -matrix[5]
    else:
        scale = t.get(T_GEOPIXELSCALE)
        tie = t.get(T_GEOTIEPOINTS)
        if not scale or not tie or len(tie) < 6:
            if subfile_type not in (0, 2):
                return None  # overview / mask IFD without georeferencing
            raise ProjError(ERR_FAILED_TO_LOAD_GRID, f"{name}: no georeferencing")
        h_res = scale[0]
        v_res = scale[1]
        west = tie[3] - tie[0] * h_res
        north = tie[4] + tie[1] * v_res
    if pixel_is_area:
        west += 0.5 * h_res
        north -= 0.5 * v_res
    mul = DEG_TO_RAD if is_geographic else 1.0
    e_west = west * mul
    e_north = north * mul
    res_x = h_res * mul
    res_y = abs(v_res) * mul
    e_east = (west + h_res * (width - 1)) * mul
    e_south = (north - v_res * (height - 1)) * mul
    bottom_up = v_res < 0
    if bottom_up:
        e_north, e_south = e_south, e_north
    if is_geographic and not (
        abs(e_west) <= 4 * M_PI and abs(e_east) <= 4 * M_PI
        and abs(e_north) <= M_PI + 1e-5 and abs(e_south) <= M_PI + 1e-5
    ):
        raise ProjError(ERR_FAILED_TO_LOAD_GRID, f"{name}: inconsistent georeferencing")

    # --- GDAL metadata / nodata ---
    metadata: dict[tuple[int, str], str] = {}
    md = t.get(T_GDAL_METADATA, "")
    if md:
        for m in re.finditer(r"<Item\s+([^>]*)>([^<]*)<", md):
            attrs = dict(re.findall(r'(\w+)="([^"]*)"', m.group(1)))
            key = attrs.get("name")
            if not key:
                continue
            sample = int(attrs["sample"]) if "sample" in attrs else -1
            metadata[(sample, key)] = m.group(2)
            role = attrs.get("role")
            if role in ("offset", "scale") and sample >= 0:
                metadata[(sample, "_" + role)] = m.group(2)
    nodata = None
    nd = t.get(T_GDAL_NODATA, "")
    if nd:
        try:
            nodata = float(nd)
        except ValueError:
            pass

    sample_planes = []
    for s in range(nsamples):
        plane = full[:, :, s]
        scale_v = float(metadata.get((s, "_scale"), 1.0))
        offset_v = float(metadata.get((s, "_offset"), 0.0))
        if scale_v != 1.0 or offset_v != 0.0:
            if nodata is not None:
                keep = plane == nodata
                plane = np.where(keep, plane, plane * scale_v + offset_v)
            else:
                plane = plane * scale_v + offset_v
        if not bottom_up:
            plane = plane[::-1, :]  # store south-first
        sample_planes.append(np.ascontiguousarray(plane))

    extent = (e_west, e_south, e_east, e_north, res_x, res_y)
    return TiffGridPage(width, height, extent, sample_planes, metadata, nodata, subfile_type)


# ---------------------------------------------------------------------------
# Conversion to engine grid objects
# ---------------------------------------------------------------------------


def tiff_to_hgrids(data: bytes, name: str):
    """GTiffHGridShiftSet::open semantics (grids.cpp:2130-2296)."""
    from .grids import HGrid

    pages = read_tiff_grid_pages(data, name)
    idx_lat, idx_lon = 0, 1
    conv = SEC_TO_RAD
    positive_east = True
    top: list[HGrid] = []
    by_name: dict[str, HGrid] = {}
    for ifd, page in enumerate(pages):
        if page.subfile_type not in (0, 2):
            if ifd == 0:
                raise ProjError(ERR_FAILED_TO_LOAD_GRID, f"{name}: invalid subfileType")
            continue
        n = len(page.samples)
        if n < 2:
            if ifd == 0:
                raise ProjError(ERR_FAILED_TO_LOAD_GRID, f"{name}: needs ≥2 samples")
            continue
        found_any = False
        found_lat = found_lon = False
        for i in range(n):
            desc = page.meta("DESCRIPTION", i)
            if desc:
                found_any = True
            if desc == "latitude_offset":
                idx_lat, found_lat = i, True
            elif desc == "longitude_offset":
                idx_lon, found_lon = i, True
        if found_any and not (found_lat or found_lon):
            if ifd > 0:
                continue
            raise ProjError(ERR_FAILED_TO_LOAD_GRID, f"{name}: no offset channels")
        if found_lon:
            pv = page.meta("positive_value", idx_lon)
            if pv == "west":
                positive_east = False
            elif pv == "east":
                positive_east = True
        unit = page.meta("UNITTYPE", idx_lat)
        if unit:
            conv = {"arc-second": SEC_TO_RAD, "radian": 1.0, "degree": DEG_TO_RAD}.get(unit)
            if conv is None:
                raise ProjError(ERR_FAILED_TO_LOAD_GRID, f"{name}: unit {unit}")
        west, south, east, north, res_x, res_y = page.extent
        lat = page.samples[idx_lat] * conv
        lon = page.samples[idx_lon] * conv
        if not positive_east:
            lon = -lon
        g = HGrid(f"{name}, ifd{ifd}", west, south, east, north, res_x, res_y, lat, lon)
        grid_name = page.meta("grid_name")
        parent_name = page.meta("parent_grid_name")
        _insert_into_hierarchy(g, grid_name, parent_name, top, by_name)
    if not top:
        raise ProjError(ERR_FAILED_TO_LOAD_GRID, f"{name}: no usable IFD")
    return top


def tiff_to_vgrids(data: bytes, name: str):
    """GTiffVGridShiftSet::open semantics (grids.cpp:1256-1345)."""
    from .grids import VGrid

    pages = read_tiff_grid_pages(data, name)
    idx = 0
    top: list[VGrid] = []
    by_name: dict[str, VGrid] = {}
    for ifd, page in enumerate(pages):
        if page.subfile_type not in (0, 2):
            if ifd == 0:
                raise ProjError(ERR_FAILED_TO_LOAD_GRID, f"{name}: invalid subfileType")
            continue
        n = len(page.samples)
        found_any = False
        found = False
        for i in range(n):
            desc = page.meta("DESCRIPTION", i)
            if desc:
                found_any = True
            if desc in ("geoid_undulation", "vertical_offset"):
                idx, found = i, True
        if found_any and not found:
            if ifd > 0:
                continue
            raise ProjError(ERR_FAILED_TO_LOAD_GRID, f"{name}: no vertical channel")
        if idx >= n:
            raise ProjError(ERR_FAILED_TO_LOAD_GRID, f"{name}: bad sample index")
        west, south, east, north, res_x, res_y = page.extent
        g = VGrid(f"{name}, ifd{ifd}", west, south, east, north, res_x, res_y,
                  page.samples[idx].astype(np.float32))
        g.nodata = page.nodata
        g.children = []
        _insert_into_hierarchy(g, page.meta("grid_name"), page.meta("parent_grid_name"),
                               top, by_name)
    if not top:
        raise ProjError(ERR_FAILED_TO_LOAD_GRID, f"{name}: no usable IFD")
    return top


def _contains_extent(parent, child) -> bool:
    return (
        parent.west <= child.west and parent.east >= child.east
        and parent.south <= child.south and parent.north >= child.north
    )


def _insert_into_hierarchy(grid, grid_name, parent_name, top, by_name):
    """insertIntoHierarchy (grids.cpp:1110-1180): explicit parent name
    first, else extent containment, else top-level."""
    if not hasattr(grid, "children") or grid.children is None:
        grid.children = []
    if parent_name:
        parent = by_name.get(parent_name)
        if parent is not None and _contains_extent(parent, grid):
            parent.children.append(grid)
            if grid_name:
                by_name[grid_name] = grid
            return
    if grid_name:
        by_name[grid_name] = grid
        top.append(grid)
        return
    for cand in top:
        if _contains_extent(cand, grid):
            _insert_by_extent(cand, grid)
            return
    top.append(grid)


def _insert_by_extent(parent, grid):
    for cand in parent.children:
        if _contains_extent(cand, grid):
            _insert_by_extent(cand, grid)
            return
    parent.children.append(grid)


def tiff_to_ggrids(data: bytes, name: str):
    """GTiffGenericGridShiftSet::open semantics (grids.cpp:2522-2580):
    every IFD with georeferencing becomes a generic N-sample grid; sample
    descriptions/units ride along for by-name channel lookup."""
    from .grids import GGrid

    pages = read_tiff_grid_pages(data, name)
    top: list = []
    by_name: dict = {}
    for ifd, page in enumerate(pages):
        if page.subfile_type not in (0, 2):
            if ifd == 0:
                raise ProjError(ERR_FAILED_TO_LOAD_GRID, f"{name}: invalid subfileType")
            continue
        west, south, east, north, res_x, res_y = page.extent
        n = len(page.samples)
        descs = [page.meta("DESCRIPTION", i) for i in range(n)]
        units = [page.meta("UNITTYPE", i) for i in range(n)]
        g = GGrid(f"{name}, ifd{ifd}", west, south, east, north, res_x, res_y,
                  [s.astype(np.float32) for s in page.samples], descs, units,
                  metadata=page.metadata)
        _insert_into_hierarchy(g, page.meta("grid_name"), page.meta("parent_grid_name"),
                               top, by_name)
    if not top:
        raise ProjError(ERR_FAILED_TO_LOAD_GRID, f"{name}: no usable IFD")
    return top
