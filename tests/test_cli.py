"""CLI verbs: smoke + behavior through the real entry point."""

import json

import numpy as np
import pytest

from richdem_tpu import synth
from richdem_tpu.cli import main
from richdem_tpu.grid import rdarray
from richdem_tpu.io import save_npz, load_npz


@pytest.fixture()
def dem_path(tmp_path):
    dem = synth.depression_dem(32, seed=3, dtype=np.float32)
    p = tmp_path / "dem.npz"
    save_npz(p, rdarray(dem, no_data=-9999.0))
    return p


def test_fill_verb(tmp_path, dem_path):
    out = tmp_path / "filled.npz"
    main(["fill-depressions", str(dem_path), str(out), "--epsilon"])
    filled = load_npz(out)
    dem = load_npz(dem_path)
    assert (filled.np() >= dem.np()).all()
    assert "FillDepressions" in filled.metadata["PROCESSING_HISTORY"]


def test_pipeline_verbs(tmp_path, dem_path):
    filled = tmp_path / "filled.npz"
    fd = tmp_path / "fd.npz"
    acc = tmp_path / "acc.npz"
    slope = tmp_path / "slope.npz"
    main(["fill-depressions", str(dem_path), str(filled)])
    main(["flowdirs", str(filled), str(fd), "--resolve-flats"])
    main(["flow-accumulation", str(filled), str(acc), "--method", "D8"])
    main(["terrain-attribute", str(filled), str(slope), "--attrib",
          "slope_degrees"])
    assert load_npz(acc).np().max() > 10
    assert load_npz(slope).np().max() >= 0


def test_twi_verb(tmp_path, dem_path):
    out = tmp_path / "twi.npz"
    main(["twi", str(dem_path), str(out)])
    assert np.isfinite(load_npz(out).np()).any()


def test_info_verb(capsys, dem_path):
    main(["info", str(dem_path)])
    info = json.loads(capsys.readouterr().out)
    assert info["shape"] == [32, 32]
    assert info["no_data"] == -9999.0


def test_hist_verb(capsys, dem_path):
    main(["hist", str(dem_path), "--bins", "5"])
    out = capsys.readouterr().out
    assert len(out.strip().splitlines()) == 5


def test_compare_verb(tmp_path, dem_path, capsys):
    other = tmp_path / "copy.npz"
    main(["convert", str(dem_path), str(other)])
    with pytest.raises(SystemExit) as exc:
        main(["compare", str(dem_path), str(other)])
    assert exc.value.code == 0
    assert "EQUAL" in capsys.readouterr().out
    # differing rasters exit nonzero
    r = load_npz(other)
    arr = r.np().copy()
    arr[5, 5] += 10
    save_npz(other, r.like(arr))
    with pytest.raises(SystemExit) as exc:
        main(["compare", str(dem_path), str(other)])
    assert exc.value.code == 1


def test_synth_and_convert(tmp_path):
    cone = tmp_path / "cone.npz"
    tif = tmp_path / "cone.tif"
    main(["synth", "cone", str(cone), "--size", "64"])
    main(["convert", str(cone), str(tif)])
    back = load_npz(cone)
    assert back.shape == (64, 64)


def test_convert_compressed_tif(tmp_path):
    from richdem_tpu.io import load_geotiff
    cone = tmp_path / "cone.npz"
    tif = tmp_path / "cone_lzw.tif"
    main(["synth", "cone", str(cone), "--size", "64"])
    main(["convert", str(cone), str(tif),
          "--compress", "lzw", "--predictor", "3"])
    np.testing.assert_array_equal(load_geotiff(tif).np(),
                                  load_npz(cone).np())


def test_expand_dimensions_verb(tmp_path, dem_path):
    out = tmp_path / "big.npz"
    main(["expand-dimensions", str(dem_path), str(out),
          "--height", "48", "--width", "40", "--y0", "8", "--x0", "4"])
    big = load_npz(out)
    dem = load_npz(dem_path)
    assert big.shape == (48, 40)
    np.testing.assert_array_equal(big.np()[8:40, 4:36], dem.np())
    assert (big.np()[:8, :] == -9999.0).all()
    assert big.no_data == -9999.0


def test_merge_verb(tmp_path):
    from richdem_tpu.parallel.layout import split_to_layout
    dem = rdarray(synth.perlin_dem(32, seed=4, dtype=np.float32))
    layout = split_to_layout(dem, str(tmp_path / "tiles"), (16, 16))
    out = tmp_path / "merged.npz"
    main(["merge", str(layout), str(out)])
    np.testing.assert_array_equal(load_npz(out).np(), dem.np())


def test_no_data_and_geotransform_verbs(tmp_path, dem_path, capsys):
    main(["no-data", str(dem_path)])
    assert capsys.readouterr().out.strip().startswith("-9999")
    out = tmp_path / "nd.npz"
    main(["no-data", str(dem_path), "--set", "-1", "--output", str(out)])
    assert load_npz(out).no_data == -1.0
    capsys.readouterr()  # drop the "wrote ..." line
    main(["geotransform", str(dem_path)])
    assert json.loads(capsys.readouterr().out) == [0.0, 1.0, 0.0, 0.0,
                                                   0.0, -1.0]


def test_taudem_convert(tmp_path, capsys):
    import numpy as np
    from richdem_tpu.cli import main
    from richdem_tpu.grid import rdarray
    from richdem_tpu.io import save
    fd = np.array([[1, 5, 0], [3, 7, -1]], np.int8)  # TauDEM codes
    src = str(tmp_path / "fd.npz")
    dst = str(tmp_path / "fd_rd.npz")
    save(src, rdarray(fd))
    main(["taudem-convert", src, dst])
    from richdem_tpu.io import load
    out = np.asarray(load(dst).data)
    want = np.array([[5, 1, 0], [3, 7, -1]], np.int8)
    np.testing.assert_array_equal(out, want)
    # round trip
    back = str(tmp_path / "fd_back.npz")
    main(["taudem-convert", dst, back, "--reverse"])
    np.testing.assert_array_equal(np.asarray(load(back).data), fd)


def test_pipeline_verb(tmp_path):
    import numpy as np
    from richdem_tpu.cli import main
    from richdem_tpu.grid import rdarray
    from richdem_tpu.io import save, load
    from richdem_tpu import synth
    dem = synth.depression_dem(48, seed=7, dtype=np.float32)
    src = str(tmp_path / "dem.npz")
    save(src, rdarray(dem))
    base = str(tmp_path / "out")
    main(["pipeline", src, base, "--twi",
          "--cache-dir", str(tmp_path / "cache")])
    acc = np.asarray(load(base + ".accum.npz").data)
    fd = np.asarray(load(base + ".flowdirs.npz").data)
    assert acc[fd == 0].sum() == dem.size
