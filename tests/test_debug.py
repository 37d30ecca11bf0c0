"""Debug/observability utilities (SURVEY.md §5.1/5.2)."""

import numpy as np
import pytest

from richdem_tpu.debug import PhaseTimer, check_raster


def test_phase_timer():
    t = PhaseTimer()
    with t.phase("a"):
        sum(range(1000))
    with t.phase("b"):
        pass
    s = t.summary()
    assert "a:" in s and "b:" in s


def test_check_raster():
    a = np.ones((4, 4))
    assert check_raster(a, lo=0.0, hi=2.0) is a
    a[1, 2] = np.nan
    with pytest.raises(ValueError, match=r"\(1, 2\)"):
        check_raster(a)
    b = np.full((3, 3), -5.0)
    with pytest.raises(ValueError, match="below"):
        check_raster(b, lo=0.0)
