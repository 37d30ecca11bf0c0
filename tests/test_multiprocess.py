"""Multi-HOST code path: 2-process jax.distributed + global mesh on one
box (the reference's mpirun-on-one-machine strategy, SURVEY.md §4c)."""

import os
import subprocess
import sys

import pytest


@pytest.mark.timeout(600)
def test_two_process_sharded_pipeline():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = os.path.join(root, "tools", "multiprocess_check.py")
    out = subprocess.run([sys.executable, script], capture_output=True,
                         text=True, timeout=580, cwd=root)
    assert "PASS" in out.stdout, out.stdout[-2000:] + out.stderr[-2000:]
