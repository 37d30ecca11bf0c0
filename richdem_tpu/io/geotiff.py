"""Minimal pure-python GeoTIFF codec (single-band, uncompressed).

Replaces the reference's GDAL dependency for the common DEM-tile case
(SURVEY.md §7 hard-part 7: "ship npy/ASCII IO and a minimal GeoTIFF codec;
do not block on geospatial plumbing").  Supports:

* reading: classic TIFF, little/big endian, strip- or tile-organized,
  uncompressed (Compression=1), one sample/pixel, integer or float of any
  standard width; GeoTIFF ModelPixelScale + ModelTiepoint → geotransform;
  GDAL_NODATA tag.
* writing: little-endian, single band, strip-organized, uncompressed, with
  geotransform + nodata + a PROCESSING_HISTORY description tag.

Anything fancier (compression, multi-band) raises with a clear message.
"""

from __future__ import annotations

import struct

import numpy as np

from richdem_tpu.grid import rdarray, DEFAULT_GEOTRANSFORM

__all__ = ["load_geotiff", "save_geotiff"]

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


def _read_entries(buf, endian, offset):
    (count,) = struct.unpack_from(endian + "H", buf, offset)
    entries = {}
    pos = offset + 2
    for _ in range(count):
        tag, typ, n = struct.unpack_from(endian + "HHI", buf, pos)
        if typ not in _TYPE_FMT:
            pos += 12
            continue
        size = _TYPE_SIZE[typ] * n
        if size <= 4:
            raw = buf[pos + 8:pos + 8 + size]
        else:
            (val_off,) = struct.unpack_from(endian + "I", buf, pos + 8)
            raw = buf[val_off:val_off + size]
        if typ == 2:  # ascii
            entries[tag] = raw.split(b"\0")[0].decode("ascii", "replace")
        elif typ in (5, 10):  # rationals
            vals = struct.unpack(endian + "II" * n, raw)
            entries[tag] = [vals[2 * i] / max(vals[2 * i + 1], 1)
                            for i in range(n)]
        else:
            fmt = endian + _TYPE_FMT[typ] * n
            vals = struct.unpack(fmt, raw)
            entries[tag] = list(vals)
        pos += 12
    (next_ifd,) = struct.unpack_from(endian + "I", buf, pos)
    return entries, next_ifd


def load_geotiff(path) -> rdarray:
    with open(path, "rb") as f:
        buf = f.read()
    if buf[:2] == b"II":
        endian = "<"
    elif buf[:2] == b"MM":
        endian = ">"
    else:
        raise ValueError("not a TIFF file")
    (magic, ifd_off) = struct.unpack_from(endian + "HI", buf, 2)
    if magic != 42:
        raise ValueError(f"unsupported TIFF magic {magic} (BigTIFF?)")
    tags, _ = _read_entries(buf, endian, ifd_off)

    width = tags[_IMAGE_WIDTH][0]
    height = tags[_IMAGE_LENGTH][0]
    compression = tags.get(_COMPRESSION, [1])[0]
    if compression != 1:
        raise ValueError(
            f"unsupported TIFF compression {compression}; this codec reads "
            "uncompressed GeoTIFFs only — convert with gdal_translate "
            "-co COMPRESS=NONE")
    spp = tags.get(_SAMPLES_PER_PIXEL, [1])[0]
    if spp != 1:
        raise ValueError(f"only single-band rasters supported, got {spp}")
    bits = tags.get(_BITS_PER_SAMPLE, [8])[0]
    sample_format = tags.get(_SAMPLE_FORMAT, [1])[0]
    kind = {1: "u", 2: "i", 3: "f"}.get(sample_format)
    if kind is None:
        raise ValueError(f"unsupported SampleFormat {sample_format}")
    dtype = np.dtype(f"{endian}{kind}{bits // 8}")

    data = np.empty(height * width, dtype=dtype)
    if _TILE_OFFSETS in tags:
        tw = tags[_TILE_WIDTH][0]
        th = tags[_TILE_LENGTH][0]
        offsets = tags[_TILE_OFFSETS]
        img = data.reshape(height, width)
        tiles_across = (width + tw - 1) // tw
        for i, off in enumerate(offsets):
            ty, tx = divmod(i, tiles_across)
            tile = np.frombuffer(buf, dtype=dtype, count=tw * th,
                                 offset=off).reshape(th, tw)
            y0, x0 = ty * th, tx * tw
            img[y0:min(y0 + th, height), x0:min(x0 + tw, width)] = \
                tile[:min(th, height - y0), :min(tw, width - x0)]
        data = img.reshape(-1)
    else:
        offsets = tags[_STRIP_OFFSETS]
        counts = tags[_STRIP_BYTE_COUNTS]
        pos = 0
        for off, cnt in zip(offsets, counts):
            n = cnt // dtype.itemsize
            data[pos:pos + n] = np.frombuffer(buf, dtype=dtype, count=n,
                                              offset=off)
            pos += n
    arr = data.reshape(height, width).astype(dtype.newbyteorder("="))

    geotransform = DEFAULT_GEOTRANSFORM
    if _MODEL_PIXEL_SCALE in tags and _MODEL_TIEPOINT in tags:
        sx, sy = tags[_MODEL_PIXEL_SCALE][:2]
        tp = tags[_MODEL_TIEPOINT]
        # tiepoint: raster (i, j, k) -> model (x, y, z)
        i, j = tp[0], tp[1]
        x, y = tp[3], tp[4]
        geotransform = (x - i * sx, sx, 0.0, y + j * sy, 0.0, -sy)

    no_data = None
    if _GDAL_NODATA in tags:
        try:
            no_data = float(tags[_GDAL_NODATA].strip())
        except (ValueError, AttributeError):
            pass

    projection = tags.get(_GEO_ASCII_PARAMS, "")
    metadata = {}
    if _IMAGE_DESCRIPTION in tags:
        metadata["PROCESSING_HISTORY"] = tags[_IMAGE_DESCRIPTION]
    return rdarray(arr, no_data=no_data, geotransform=geotransform,
                   projection=projection, metadata=metadata)


def _np_sample_format(dtype):
    return {"u": 1, "i": 2, "f": 3}[dtype.kind]


def save_geotiff(path, rd):
    if not isinstance(rd, rdarray):
        rd = rdarray(rd)
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

    entries = []  # (tag, type, count, packed-or-bytes)

    def tag_short(tag, val):
        entries.append((tag, 3, 1, struct.pack("<HH", val, 0)))

    def tag_long(tag, val):
        entries.append((tag, 4, 1, struct.pack("<I", val)))

    def tag_doubles(tag, vals):
        entries.append((tag, 12, len(vals),
                        struct.pack("<" + "d" * len(vals), *vals)))

    def tag_ascii(tag, b):
        entries.append((tag, 2, len(b), b))

    data_bytes = arr.tobytes()
    tag_long(_IMAGE_WIDTH, width)
    tag_long(_IMAGE_LENGTH, height)
    tag_short(_BITS_PER_SAMPLE, arr.dtype.itemsize * 8)
    tag_short(_COMPRESSION, 1)
    tag_short(_PHOTOMETRIC, 1)  # BlackIsZero
    tag_ascii(_IMAGE_DESCRIPTION, desc_b)
    tag_long(_STRIP_OFFSETS, 0)  # patched below
    tag_short(_SAMPLES_PER_PIXEL, 1)
    tag_long(_ROWS_PER_STRIP, height)
    tag_long(_STRIP_BYTE_COUNTS, len(data_bytes))
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
    for tag, typ, count, payload in entries:
        if len(payload) <= 4:
            val = payload + b"\0" * (4 - len(payload))
        else:
            val = struct.pack("<I", extra_offset + len(extra))
            extra += payload
            if len(extra) % 2:
                extra += b"\0"
        packed_entries.append(struct.pack("<HHI", tag, typ, count) + val)

    data_offset = extra_offset + len(extra)
    # patch strip offset entry
    for i, (tag, typ, count, payload) in enumerate(entries):
        if tag == _STRIP_OFFSETS:
            packed_entries[i] = (struct.pack("<HHI", tag, typ, count)
                                 + struct.pack("<I", data_offset))

    with open(path, "wb") as f:
        f.write(b"II" + struct.pack("<HI", 42, ifd_offset))
        f.write(struct.pack("<H", n))
        f.writelines(packed_entries)
        f.write(struct.pack("<I", 0))  # no next IFD
        f.write(bytes(extra))
        f.write(data_bytes)
    return path
