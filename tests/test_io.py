"""IO round trips: .npz native format, ESRI ASCII, minimal GeoTIFF."""

import numpy as np
import pytest

import richdem_tpu as rd
from richdem_tpu import synth
from richdem_tpu.io import (load_npz, save_npz, load_ascii, save_ascii,
                            load_geotiff, save_geotiff, load, save)


@pytest.fixture()
def raster():
    dem = synth.perlin_dem(24, seed=5, dtype=np.float32)
    dem[3, 4] = -9999.0
    r = rd.rdarray(dem, no_data=-9999.0,
                   geotransform=(500000.0, 30.0, 0.0, 4100000.0, 0.0,
                                 -30.0),
                   projection="WGS 84 / UTM zone 33N")
    r.metadata["PROCESSING_HISTORY"] = "test-history"
    return r


def test_npz_round_trip(tmp_path, raster):
    p = tmp_path / "dem.npz"
    save_npz(p, raster)
    back = load_npz(p)
    np.testing.assert_array_equal(back.np(), raster.np())
    assert back.no_data == raster.no_data
    assert back.geotransform == raster.geotransform
    assert back.projection == raster.projection
    assert back.metadata["PROCESSING_HISTORY"] == "test-history"


def test_ascii_round_trip(tmp_path, raster):
    p = tmp_path / "dem.asc"
    save_ascii(p, raster)
    back = load_ascii(p)
    np.testing.assert_allclose(back.np(), raster.np(), rtol=1e-6)
    assert back.no_data == raster.no_data
    np.testing.assert_allclose(back.geotransform, raster.geotransform)


@pytest.mark.parametrize("dtype", [np.float32, np.float64, np.int32,
                                   np.uint16])
def test_geotiff_round_trip_dtypes(tmp_path, raster, dtype):
    arr = (np.abs(raster.np()) + 1).astype(dtype)
    r = raster.like(arr)
    r.no_data = None
    p = tmp_path / "dem.tif"
    save_geotiff(p, r)
    back = load_geotiff(p)
    np.testing.assert_array_equal(back.np(), arr)
    assert back.dtype == dtype
    np.testing.assert_allclose(back.geotransform, raster.geotransform)


def test_geotiff_nodata_and_history(tmp_path, raster):
    p = tmp_path / "dem.tif"
    save_geotiff(p, raster)
    back = load_geotiff(p)
    assert back.no_data == -9999.0
    assert "test-history" in back.metadata["PROCESSING_HISTORY"]
    assert back.projection.startswith("WGS 84")


def test_extension_dispatch(tmp_path, raster):
    for name in ("a.npz", "b.asc", "c.tif"):
        p = tmp_path / name
        save(p, raster)
        back = load(p)
        np.testing.assert_allclose(back.np(), raster.np(), rtol=1e-6)
    with pytest.raises(ValueError, match="unsupported raster extension"):
        save(tmp_path / "x.foo", raster)


def test_load_save_gdal_names(tmp_path, raster):
    p = tmp_path / "dem.tif"
    rd.SaveGDAL(p, raster)
    back = rd.LoadGDAL(p)
    np.testing.assert_array_equal(back.np(), raster.np())


def test_geotiff_rejects_compressed(tmp_path):
    # craft a TIFF with compression tag != 1 via our writer then patch
    import struct
    p = tmp_path / "c.tif"
    save_geotiff(p, rd.rdarray(np.zeros((4, 4), np.float32)))
    raw = bytearray(p.read_bytes())
    # find compression tag (259) in IFD and set value to 5 (LZW)
    n = struct.unpack_from("<H", raw, 8)[0]
    for i in range(n):
        off = 10 + i * 12
        tag = struct.unpack_from("<H", raw, off)[0]
        if tag == 259:
            struct.pack_into("<H", raw, off + 8, 5)
    p.write_bytes(bytes(raw))
    with pytest.raises(ValueError, match="compression"):
        load_geotiff(p)
