"""Pure-python GeoTIFF codec: windowed reads, deflate, multi-band.

Replaces the reference's GDAL dependency for DEM tiles (SURVEY.md §2.1
Array2D row: GDAL *windowed* load feeds the tiled programs; §7 hard-part
7: "ship npy/ASCII IO and a minimal GeoTIFF codec").  Supports:

* reading: classic TIFF, little/big endian, strip- or tile-organized,
  uncompressed (1) or DEFLATE (8 / legacy 32946) with horizontal (2) or
  floating-point (3) predictors, any standard integer/float width,
  multi-band chunky rasters (``band=`` selects one), GeoTIFF
  ModelPixelScale + ModelTiepoint → geotransform, GDAL_NODATA;
* **windowed reading** without loading the file: :class:`GeoTIFFWindow`
  parses only the IFD and decodes just the strips/tiles overlapping a
  requested window — this is what lets ``out_of_core_*`` stream a
  compressed GeoTIFF larger than RAM through the chip;
* writing: little-endian, single band, strip-organized, uncompressed or
  ``compress="deflate"``, with geotransform + nodata +
  PROCESSING_HISTORY.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from richdem_tpu.grid import rdarray, DEFAULT_GEOTRANSFORM

__all__ = ["load_geotiff", "save_geotiff", "GeoTIFFWindow"]

# TIFF tag ids
_IMAGE_WIDTH = 256
_IMAGE_LENGTH = 257
_BITS_PER_SAMPLE = 258
_COMPRESSION = 259
_PHOTOMETRIC = 262
_IMAGE_DESCRIPTION = 270
_STRIP_OFFSETS = 273
_SAMPLES_PER_PIXEL = 277
_ROWS_PER_STRIP = 278
_STRIP_BYTE_COUNTS = 279
_PLANAR_CONFIG = 284
_PREDICTOR = 317
_SAMPLE_FORMAT = 339
_TILE_WIDTH = 322
_TILE_LENGTH = 323
_TILE_OFFSETS = 324
_TILE_BYTE_COUNTS = 325
_MODEL_PIXEL_SCALE = 33550
_MODEL_TIEPOINT = 33922
_GEO_KEY_DIRECTORY = 34735
_GEO_ASCII_PARAMS = 34737
_GDAL_NODATA = 42113

_TYPE_FMT = {1: "B", 2: "c", 3: "H", 4: "I", 5: "II", 6: "b", 7: "B",
             8: "h", 9: "i", 10: "ii", 11: "f", 12: "d", 16: "Q", 17: "q"}
_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4,
              10: 8, 11: 4, 12: 8, 16: 8, 17: 8}

_DEFLATE = (8, 32946)


def _read_entries(f, endian, offset):
    f.seek(offset)
    (count,) = struct.unpack(endian + "H", f.read(2))
    body = f.read(count * 12 + 4)
    entries = {}
    deferred = []
    for i in range(count):
        tag, typ, n = struct.unpack_from(endian + "HHI", body, i * 12)
        if typ not in _TYPE_FMT:
            continue
        size = _TYPE_SIZE[typ] * n
        if size <= 4:
            raw = body[i * 12 + 8:i * 12 + 8 + size]
            entries[tag] = (typ, n, raw)
        else:
            (val_off,) = struct.unpack_from(endian + "I", body, i * 12 + 8)
            deferred.append((tag, typ, n, val_off, size))
    for tag, typ, n, val_off, size in deferred:
        f.seek(val_off)
        entries[tag] = (typ, n, f.read(size))
    (next_ifd,) = struct.unpack_from(endian + "I", body, count * 12)

    out = {}
    for tag, (typ, n, raw) in entries.items():
        if typ == 2:  # ascii
            out[tag] = raw.split(b"\0")[0].decode("ascii", "replace")
        elif typ in (5, 10):  # rationals
            vals = struct.unpack(endian + "II" * n, raw)
            out[tag] = [vals[2 * i] / max(vals[2 * i + 1], 1)
                        for i in range(n)]
        else:
            out[tag] = list(struct.unpack(endian + _TYPE_FMT[typ] * n,
                                          raw))
    return out, next_ifd


def _undo_predictor(block, predictor, dtype, spp):
    """Reverse TIFF predictors on a decoded (rows, cols·spp) block."""
    if predictor == 2:          # horizontal differencing
        if spp > 1:
            h, wc = block.shape
            block = block.reshape(h, wc // spp, spp)
            np.cumsum(block, axis=1, dtype=block.dtype, out=block)
            return block.reshape(h, wc)
        np.cumsum(block, axis=1, dtype=block.dtype, out=block)
        return block
    if predictor == 3:          # floating-point (byte-plane + diff)
        h, wc = block.shape
        nb = dtype.itemsize
        raw = block.view(np.uint8).reshape(h, wc * nb)
        np.cumsum(raw, axis=1, dtype=np.uint8, out=raw)
        # bytes are stored plane-major, big-endian within the pixel
        planes = raw.reshape(h, nb, wc)
        shuffled = np.moveaxis(planes, 1, 2).copy()  # (h, wc, nb)
        be = np.dtype(dtype.str.replace("<", ">").replace("=", ">"))
        return (shuffled.reshape(h, wc * nb).view(be)
                .astype(dtype).reshape(h, wc))
    return block


class GeoTIFFWindow:
    """Windowed GeoTIFF reader: parses only the IFD, decodes only the
    strips/tiles overlapping a requested window — O(window) memory.

    Usable anywhere a memmap goes: ``shape``/``dtype`` attributes and
    2-D slicing (``r[r0:r1, c0:c1]`` → numpy array)."""

    def __init__(self, path, band=0):
        self._f = open(path, "rb")
        head = self._f.read(8)
        if head[:2] == b"II":
            self._e = "<"
        elif head[:2] == b"MM":
            self._e = ">"
        else:
            raise ValueError("not a TIFF file")
        magic, ifd_off = struct.unpack(self._e + "HI", head[2:8])
        if magic != 42:
            raise ValueError(f"unsupported TIFF magic {magic} (BigTIFF?)")
        tags, _ = _read_entries(self._f, self._e, ifd_off)
        self._tags = tags

        self.width = tags[_IMAGE_WIDTH][0]
        self.height = tags[_IMAGE_LENGTH][0]
        self.shape = (self.height, self.width)
        self._comp = tags.get(_COMPRESSION, [1])[0]
        if self._comp not in (1,) + _DEFLATE:
            raise ValueError(
                f"unsupported TIFF compression {self._comp}; this codec "
                "reads uncompressed or DEFLATE GeoTIFFs")
        self._pred = tags.get(_PREDICTOR, [1])[0]
        self._spp = tags.get(_SAMPLES_PER_PIXEL, [1])[0]
        if self._spp > 1 and tags.get(_PLANAR_CONFIG, [1])[0] != 1:
            raise ValueError("planar multi-band TIFFs not supported")
        if not 0 <= band < self._spp:
            raise ValueError(f"band {band} out of range ({self._spp})")
        self.band = band
        self.n_bands = self._spp
        bits = tags.get(_BITS_PER_SAMPLE, [8])[0]
        fmt = tags.get(_SAMPLE_FORMAT, [1])[0]
        kind = {1: "u", 2: "i", 3: "f"}.get(fmt)
        if kind is None:
            raise ValueError(f"unsupported SampleFormat {fmt}")
        self.dtype = np.dtype(f"{kind}{bits // 8}")
        self._file_dtype = np.dtype(f"{self._e}{kind}{bits // 8}")

        if _TILE_OFFSETS in tags:
            self._tiled = True
            self._tw = tags[_TILE_WIDTH][0]
            self._th = tags[_TILE_LENGTH][0]
            self._offsets = tags[_TILE_OFFSETS]
            self._counts = tags.get(_TILE_BYTE_COUNTS)
        else:
            self._tiled = False
            self._rps = tags.get(_ROWS_PER_STRIP, [self.height])[0]
            self._offsets = tags[_STRIP_OFFSETS]
            self._counts = tags[_STRIP_BYTE_COUNTS]

        self.geotransform = DEFAULT_GEOTRANSFORM
        if _MODEL_PIXEL_SCALE in tags and _MODEL_TIEPOINT in tags:
            sx, sy = tags[_MODEL_PIXEL_SCALE][:2]
            tp = tags[_MODEL_TIEPOINT]
            i, j = tp[0], tp[1]
            x, y = tp[3], tp[4]
            self.geotransform = (x - i * sx, sx, 0.0, y + j * sy, 0.0, -sy)
        self.no_data = None
        if _GDAL_NODATA in tags:
            try:
                self.no_data = float(tags[_GDAL_NODATA].strip())
            except (ValueError, AttributeError):
                pass
        self.projection = tags.get(_GEO_ASCII_PARAMS, "")
        self.metadata = {}
        if _IMAGE_DESCRIPTION in tags:
            self.metadata["PROCESSING_HISTORY"] = tags[_IMAGE_DESCRIPTION]

    # -- block decode -----------------------------------------------------

    def _decode(self, idx, rows, cols):
        """Decode block ``idx`` → (rows, cols) array of self.dtype
        (band-selected)."""
        self._f.seek(self._offsets[idx])
        raw = self._f.read(self._counts[idx] if self._counts
                           else rows * cols * self._spp
                           * self.dtype.itemsize)
        if self._comp in _DEFLATE:
            raw = zlib.decompress(raw)
        n = rows * cols * self._spp
        flat = np.frombuffer(raw, dtype=self._file_dtype, count=n)
        block = flat.reshape(rows, cols * self._spp).astype(
            self.dtype.newbyteorder("="), copy=True)
        if self._pred != 1:
            block = _undo_predictor(block, self._pred, self.dtype,
                                    self._spp)
        if self._spp > 1:
            block = block.reshape(rows, cols, self._spp)[:, :, self.band]
        return block

    def read(self, r0, r1, c0, c1):
        """Window [r0:r1, c0:c1] as a numpy array (native byte order)."""
        r0, r1 = max(0, r0), min(self.height, r1)
        c0, c1 = max(0, c0), min(self.width, c1)
        out = np.empty((r1 - r0, c1 - c0), self.dtype)
        if self._tiled:
            ta = (self.width + self._tw - 1) // self._tw
            ty0, ty1 = r0 // self._th, (r1 - 1) // self._th
            tx0, tx1 = c0 // self._tw, (c1 - 1) // self._tw
            for ty in range(ty0, ty1 + 1):
                for tx in range(tx0, tx1 + 1):
                    blk = self._decode(ty * ta + tx, self._th, self._tw)
                    y0, x0 = ty * self._th, tx * self._tw
                    ry0, ry1 = max(r0, y0), min(r1, y0 + self._th)
                    cx0, cx1 = max(c0, x0), min(c1, x0 + self._tw)
                    out[ry0 - r0:ry1 - r0, cx0 - c0:cx1 - c0] = \
                        blk[ry0 - y0:ry1 - y0, cx0 - x0:cx1 - x0]
        else:
            s0, s1 = r0 // self._rps, (r1 - 1) // self._rps
            for s in range(s0, s1 + 1):
                y0 = s * self._rps
                rows = min(self._rps, self.height - y0)
                blk = self._decode(s, rows, self.width)
                ry0, ry1 = max(r0, y0), min(r1, y0 + rows)
                out[ry0 - r0:ry1 - r0, :] = blk[ry0 - y0:ry1 - y0, c0:c1]
        return out

    def __getitem__(self, key):
        if not isinstance(key, tuple):
            key = (key, slice(None))
        rs, cs = key
        if isinstance(rs, int):
            rs = slice(rs, rs + 1)
        if isinstance(cs, int):
            cs = slice(cs, cs + 1)
        r0, r1, _ = rs.indices(self.height)
        c0, c1, _ = cs.indices(self.width)
        return self.read(r0, r1, c0, c1)

    def __array__(self, dtype=None):
        a = self.read(0, self.height, 0, self.width)
        return a if dtype is None else a.astype(dtype)

    def close(self):
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def load_geotiff(path, band=0) -> rdarray:
    r = GeoTIFFWindow(path, band=band)
    try:
        arr = r.read(0, r.height, 0, r.width)
        return rdarray(arr, no_data=r.no_data,
                       geotransform=r.geotransform,
                       projection=r.projection, metadata=dict(r.metadata))
    finally:
        r.close()


def _np_sample_format(dtype):
    return {"u": 1, "i": 2, "f": 3}[dtype.kind]


def save_geotiff(path, rd, compress=None, rows_per_strip=None):
    """Write a single-band GeoTIFF; ``compress="deflate"`` enables
    per-strip zlib (Compression=8, no predictor)."""
    if not isinstance(rd, rdarray):
        rd = rdarray(rd)
    if compress not in (None, "deflate"):
        raise ValueError(f"unsupported compression {compress!r}")
    arr = np.ascontiguousarray(rd.np())
    if arr.dtype.kind not in "uif":
        raise ValueError(f"cannot write dtype {arr.dtype} to GeoTIFF")
    arr = arr.astype(arr.dtype.newbyteorder("<"))
    height, width = arr.shape
    gt = rd.geotransform
    desc = (rd.metadata.get("PROCESSING_HISTORY", "") or "richdem_tpu")
    desc_b = desc.encode("ascii", "replace") + b"\0"
    nodata_b = (b"" if rd.no_data is None
                else f"{float(rd.no_data):g}".encode() + b"\0")

    if rows_per_strip is None:
        rows_per_strip = height if compress is None else max(
            1, min(height, (1 << 20) // max(width * arr.dtype.itemsize, 1)))
    strips = []
    for y0 in range(0, height, rows_per_strip):
        raw = arr[y0:y0 + rows_per_strip].tobytes()
        strips.append(zlib.compress(raw, 6) if compress else raw)

    entries = []  # (tag, type, count, packed-or-bytes)

    def tag_short(tag, val):
        entries.append((tag, 3, 1, struct.pack("<HH", val, 0)))

    def tag_long(tag, val):
        entries.append((tag, 4, 1, struct.pack("<I", val)))

    def tag_longs(tag, vals):
        entries.append((tag, 4, len(vals),
                        struct.pack("<" + "I" * len(vals), *vals)))

    def tag_doubles(tag, vals):
        entries.append((tag, 12, len(vals),
                        struct.pack("<" + "d" * len(vals), *vals)))

    def tag_ascii(tag, b):
        entries.append((tag, 2, len(b), b))

    tag_long(_IMAGE_WIDTH, width)
    tag_long(_IMAGE_LENGTH, height)
    tag_short(_BITS_PER_SAMPLE, arr.dtype.itemsize * 8)
    tag_short(_COMPRESSION, 8 if compress else 1)
    tag_short(_PHOTOMETRIC, 1)  # BlackIsZero
    tag_ascii(_IMAGE_DESCRIPTION, desc_b)
    tag_longs(_STRIP_OFFSETS, [0] * len(strips))  # patched below
    tag_short(_SAMPLES_PER_PIXEL, 1)
    tag_long(_ROWS_PER_STRIP, rows_per_strip)
    tag_longs(_STRIP_BYTE_COUNTS, [len(s) for s in strips])
    tag_short(_PLANAR_CONFIG, 1)
    tag_short(_SAMPLE_FORMAT, _np_sample_format(arr.dtype))
    tag_doubles(_MODEL_PIXEL_SCALE, [abs(gt[1]), abs(gt[5]), 0.0])
    tag_doubles(_MODEL_TIEPOINT, [0.0, 0.0, 0.0, gt[0], gt[3], 0.0])
    # Minimal GeoKey directory: version only (projection strings are kept
    # in GeoAsciiParams verbatim).
    entries.append((_GEO_KEY_DIRECTORY, 3, 4,
                    struct.pack("<4H", 1, 1, 0, 0)))
    if rd.projection:
        tag_ascii(_GEO_ASCII_PARAMS,
                  rd.projection.encode("ascii", "replace") + b"\0")
    if nodata_b:
        tag_ascii(_GDAL_NODATA, nodata_b)

    entries.sort(key=lambda e: e[0])
    n = len(entries)
    ifd_offset = 8
    ifd_size = 2 + n * 12 + 4
    extra_offset = ifd_offset + ifd_size
    extra = bytearray()
    packed_entries = []
    value_pos = {}
    for tag, typ, count, payload in entries:
        if len(payload) <= 4:
            val = payload + b"\0" * (4 - len(payload))
            value_pos[tag] = None
        else:
            value_pos[tag] = extra_offset + len(extra)
            val = struct.pack("<I", extra_offset + len(extra))
            extra += payload
            if len(extra) % 2:
                extra += b"\0"
        packed_entries.append(struct.pack("<HHI", tag, typ, count) + val)

    data_offset = extra_offset + len(extra)
    offsets = []
    pos = data_offset
    for s in strips:
        offsets.append(pos)
        pos += len(s)
    # patch strip offsets (inline when 1 strip, else in the extra area)
    offs_payload = struct.pack("<" + "I" * len(offsets), *offsets)
    for i, (tag, typ, count, payload) in enumerate(entries):
        if tag == _STRIP_OFFSETS:
            if value_pos[tag] is None:
                packed_entries[i] = (struct.pack("<HHI", tag, typ, count)
                                     + offs_payload
                                     + b"\0" * (4 - len(offs_payload)))
            else:
                vp = value_pos[tag] - extra_offset
                extra[vp:vp + len(offs_payload)] = offs_payload
                packed_entries[i] = (struct.pack("<HHI", tag, typ, count)
                                     + struct.pack("<I", value_pos[tag]))

    with open(path, "wb") as f:
        f.write(b"II" + struct.pack("<HI", 42, ifd_offset))
        f.write(struct.pack("<H", n))
        f.writelines(packed_entries)
        f.write(struct.pack("<I", 0))  # no next IFD
        f.write(bytes(extra))
        for s in strips:
            f.write(s)
    return path
