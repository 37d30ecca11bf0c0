"""Device synth generators — windowed staging equivalence.

The out-of-core benches stage larger-than-HBM DEMs strip-by-strip via
:func:`synth_jax.perlin_dem_rows`; correctness of every out-of-core
equality test rides on the strips agreeing bit-for-bit with the full
field (reference posture: SURVEY.md §2.2 terrain generation).
"""
import numpy as np
import pytest

from richdem_tpu import synth_jax


@pytest.mark.parametrize("row0,nrows", [(0, 128), (128, 256), (384, 128)])
def test_perlin_rows_bit_identical_to_full_slice(row0, nrows):
    full = np.asarray(synth_jax.perlin_dem(512, 384, seed=3))
    win = np.asarray(
        synth_jax.perlin_dem_rows(512, 384, row0, nrows, seed=3))
    assert win.shape == (nrows, 384)
    assert np.array_equal(full[row0:row0 + nrows], win)


def test_perlin_rows_covers_odd_tail():
    # strip grid that doesn't divide the height: last window is short
    full = np.asarray(synth_jax.perlin_dem(200, 96, seed=11))
    parts = [np.asarray(synth_jax.perlin_dem_rows(200, 96, r0,
                                                  min(64, 200 - r0),
                                                  seed=11))
             for r0 in range(0, 200, 64)]
    assert np.array_equal(full, np.concatenate(parts, axis=0))
