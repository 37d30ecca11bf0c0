"""Phase-granular checkpoint/resume (SURVEY.md §5.3/5.4)."""

import numpy as np

from richdem_tpu import synth
from richdem_tpu.checkpoint import PhaseCache
from richdem_tpu.pipeline import resumable_pipeline


def test_phase_cache_roundtrip(tmp_path):
    c = PhaseCache(str(tmp_path), "g1")
    a = np.arange(12.0).reshape(3, 4)
    assert not c.has("fill")
    c.save("fill", a)
    assert c.has("fill")
    np.testing.assert_array_equal(c.load("fill"), a)
    # shard-keyed entries are independent
    c.save("fill", a * 2, shard=3)
    np.testing.assert_array_equal(c.load("fill", shard=3), a * 2)
    np.testing.assert_array_equal(c.load("fill"), a)


def test_run_skips_completed_phase(tmp_path):
    c = PhaseCache(str(tmp_path), "g2")
    calls = []

    def compute():
        calls.append(1)
        return np.ones((2, 2))

    c.run("p", compute)
    c.run("p", compute)
    assert len(calls) == 1


def test_fingerprint_invalidates_stale_entries(tmp_path):
    from richdem_tpu.checkpoint import fingerprint_of
    a, b = np.ones((4, 4)), np.zeros((4, 4))
    c1 = PhaseCache(str(tmp_path), "g", fingerprint=fingerprint_of("eps=1", a))
    c1.save("fill", a)
    assert c1.has("fill")
    # same cache_dir + grid_id, different config → stale entry is ignored
    c2 = PhaseCache(str(tmp_path), "g", fingerprint=fingerprint_of("eps=2", a))
    assert not c2.has("fill")
    calls = []
    got = c2.run("fill", lambda: (calls.append(1), b)[1])
    assert len(calls) == 1
    np.testing.assert_array_equal(got, b)
    # the recompute overwrote the entry under the NEW fingerprint
    assert c2.has("fill") and not c1.has("fill")


def test_resumable_pipeline_invalidates_on_changed_dem(tmp_path):
    dem1 = synth.depression_dem(48, seed=7, dtype=np.float32)
    dem2 = synth.depression_dem(48, seed=8, dtype=np.float32)
    out1 = resumable_pipeline(dem1, str(tmp_path), grid_id="t", eps=0.0)
    # same cache_dir/grid_id, different DEM: must NOT return stale rasters
    out2 = resumable_pipeline(dem2, str(tmp_path), grid_id="t", eps=0.0)
    assert not np.array_equal(np.asarray(out1["filled"]),
                              np.asarray(out2["filled"]))
    fd = np.asarray(out2["flowdirs"])
    assert np.asarray(out2["accum"])[fd == 0].sum() == dem2.size


def test_resumable_pipeline_resumes(tmp_path):
    dem = synth.depression_dem(48, seed=7, dtype=np.float32)
    out1 = resumable_pipeline(dem, str(tmp_path), grid_id="t", eps=0.0)
    # wipe a LATE phase only; earlier phases must come from cache
    import os
    os.remove(os.path.join(str(tmp_path), "t", "accum.npy"))
    out2 = resumable_pipeline(dem, str(tmp_path), grid_id="t", eps=0.0)
    np.testing.assert_array_equal(np.asarray(out1["filled"]),
                                  np.asarray(out2["filled"]))
    np.testing.assert_allclose(np.asarray(out1["accum"]),
                               np.asarray(out2["accum"]))
    # mass conservation survives the resume
    fd = np.asarray(out2["flowdirs"])
    assert np.asarray(out2["accum"])[fd == 0].sum() == dem.size
