"""Execute every ``python`` code block in docs/EXAMPLES.md.

The recipes are written against production file names and tile sizes;
this harness binds small synthetic fixtures under a tmp cwd, scales the
one literal tile size down, and otherwise executes each block VERBATIM
in one shared namespace (the doc reads top-to-bottom as a session).
Docs that drift from the API fail here — the reference keeps its Python
examples runnable the same way (SURVEY.md §2.6 docs row).
"""

import os
import pathlib
import re

import numpy as np
import pytest

DOC = pathlib.Path(__file__).resolve().parents[1] / "docs" / "EXAMPLES.md"

#: recipe scale → test scale; filenames stay as written (fixtures are
#: created under the tmp cwd with the doc's exact names).
SUBS = [("tile=4096", "tile=64")]


def _blocks():
    return re.findall(r"```python\n(.*?)```", DOC.read_text(), re.S)


def test_examples_md_executes(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    import matplotlib
    matplotlib.use("Agg")  # rdShow block: headless no-op show()

    import richdem_tpu as rd
    from richdem_tpu import oracle, synth

    # Fixtures under the doc's own file names.
    dem_np = synth.depression_dem(96, seed=5, dtype=np.float64)
    rd.SaveGDAL("srtm_tile.tif", rd.rdarray(dem_np, no_data=-9999.0))
    big = synth.depression_dem(160, seed=7, dtype=np.float64)
    rd.SaveGDAL("huge_dem.tif", rd.rdarray(big, no_data=-9999.0))
    fd_big = oracle.d8_flowdirs(oracle.priority_flood_epsilon(big, eps=1e-3))
    np.save("huge_fd.npy", fd_big.astype(np.int8))

    blocks = _blocks()
    assert len(blocks) >= 7, "EXAMPLES.md lost code blocks"
    ns = {}
    for i, block in enumerate(blocks):
        src = block
        for old, new in SUBS:
            src = src.replace(old, new)
        if "rdCompare(a, b" in src:  # utility recipe: any two rasters
            ns.setdefault("a", ns["filled"])
            ns.setdefault("b", ns["filled"])
        exec(compile(src, f"EXAMPLES.md#block{i + 1}", "exec"), ns)

    # The session produced real artifacts.
    assert os.path.exists("accum.tif")
    assert os.path.exists(ns["filled_path"])
    assert os.path.exists(ns["acc_path"])
    assert np.asarray(ns["acc"]).shape[:2] == (96, 96)
    assert np.nanmax(np.asarray(ns["twi"])) > 0
    assert int(np.asarray(ns["order"]).max()) >= 1
    import matplotlib.pyplot as plt
    plt.close("all")
