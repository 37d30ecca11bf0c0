"""Oracle flat resolution: the plateau DEM must fully drain afterwards."""

import numpy as np

from richdem_tpu import synth
from richdem_tpu.oracle import d8_flowdirs, resolve_flats, d8_accumulation
from richdem_tpu.oracle.flats import flat_mask_and_labels
from richdem_tpu.topology import DX, DY, NO_FLOW


def test_plateau_has_flats_then_resolves():
    dem = synth.plateau_dem(24, dtype=np.float64)
    fd = d8_flowdirs(dem)
    assert (fd == NO_FLOW).sum() > 4  # the mesa top is flat
    fd2 = resolve_flats(dem, fd)
    # Every cell now drains (the tilted apron guarantees a global outlet).
    h, w = fd2.shape
    interior_noflow = (fd2[1:-1, 1:-1] == NO_FLOW).sum()
    assert interior_noflow == 0

    # Following flow terminates (no cycles) and reaches the border.
    for r0 in range(h):
        for c0 in range(w):
            r, c = r0, c0
            for _ in range(h * w + 1):
                d = int(fd2[r, c])
                if d == NO_FLOW:
                    break
                r, c = r + int(DY[d]), c + int(DX[d])
            else:
                raise AssertionError(f"cycle from {(r0, c0)}")


def test_flat_mask_monotone_toward_outlets():
    dem = synth.plateau_dem(20, dtype=np.float64)
    fd = d8_flowdirs(dem)
    mask, labels = flat_mask_and_labels(dem, fd)
    assert (labels > 0).any()
    # Masked cells: some neighbor in same flat has strictly smaller mask
    # (or is an outlet with mask 0).
    h, w = mask.shape
    for r in range(h):
        for c in range(w):
            if mask[r, c] <= 0:
                continue
            has_lower = any(
                0 <= r + DY[d] < h and 0 <= c + DX[d] < w
                and labels[r + DY[d], c + DX[d]] == labels[r, c]
                and mask[r + DY[d], c + DX[d]] < mask[r, c]
                for d in range(1, 9))
            assert has_lower, (r, c)


def test_resolved_accumulation_conserves():
    dem = synth.plateau_dem(20, dtype=np.float64)
    fd = resolve_flats(dem, d8_flowdirs(dem))
    acc = d8_accumulation(fd)
    absorbing = np.asarray(fd) == NO_FLOW
    assert np.isclose(acc[absorbing].sum(), dem.size)


def test_no_flats_is_noop():
    dem = synth.cone_dem(17, dtype=np.float64)
    fd = d8_flowdirs(dem)
    fd2 = resolve_flats(dem, fd)
    np.testing.assert_array_equal(fd, fd2)
