"""Small from-scratch NumPy reference computations shared by test files.

These deliberately do NOT import the package's oracle — they give a third,
structurally different implementation (pointer chasing / queue walks) for
the successor-resolve family, mirroring the reference's cross-validation
test strategy (SURVEY.md §4 item 1)."""

from collections import deque

import numpy as np

from richdem_tpu.topology import DX, DY


def successor_table(fd):
    """Flat successor index per cell (self where NO_FLOW/off-grid)."""
    h, w = fd.shape
    fd_f = np.asarray(fd).reshape(-1)
    rr, cc = np.divmod(np.arange(h * w), w)
    nr = rr + DY[np.clip(fd_f, 0, 8)]
    nc = cc + DX[np.clip(fd_f, 0, 8)]
    valid = (fd_f > 0) & (nr >= 0) & (nr < h) & (nc >= 0) & (nc < w)
    return np.where(valid, nr * w + nc, np.arange(h * w))


def terminal_labels(fd, iters=64):
    """Label of each cell's terminal cell (pointer doubling)."""
    lab = successor_table(fd)
    for _ in range(iters):
        new = lab[lab]
        if (new == lab).all():
            break
        lab = new
    return lab.reshape(fd.shape)


def upslope_numpy(seeds, fd, iters=64):
    """Cells whose flow path passes through a seed (pointer doubling)."""
    s = successor_table(fd)
    hit = np.asarray(seeds).reshape(-1).copy()
    for _ in range(iters):
        nh = hit | hit[s]
        ns = s[s]
        if (nh == hit).all():
            break
        hit, s = nh, ns
    return hit.reshape(np.asarray(seeds).shape)


def strahler_numpy(fd):
    """Strahler stream order by topological queue (independent of the
    package's GS-sweep and XLA-stencil implementations)."""
    fd = np.asarray(fd)
    h, w = fd.shape
    deps = np.zeros((h, w), np.int32)
    for r in range(h):
        for c in range(w):
            d = int(fd[r, c])
            if d <= 0:
                continue
            nr, nc = r + int(DY[d]), c + int(DX[d])
            if 0 <= nr < h and 0 <= nc < w:
                deps[nr, nc] += 1
    order = np.where(fd >= 0, 1, 0).astype(np.int32)
    inmax = np.zeros((h, w), np.int32)
    incnt = np.zeros((h, w), np.int32)
    q = deque((r, c) for r in range(h) for c in range(w)
              if deps[r, c] == 0 and fd[r, c] >= 0)
    while q:
        r, c = q.popleft()
        if inmax[r, c] > 0:
            order[r, c] = (inmax[r, c] + 1 if incnt[r, c] >= 2
                           else inmax[r, c])
        d = int(fd[r, c])
        if d <= 0:
            continue
        nr, nc = r + int(DY[d]), c + int(DX[d])
        if not (0 <= nr < h and 0 <= nc < w):
            continue
        o = order[r, c]
        if o > inmax[nr, nc]:
            inmax[nr, nc], incnt[nr, nc] = o, 1
        elif o == inmax[nr, nc]:
            incnt[nr, nc] += 1
        deps[nr, nc] -= 1
        if deps[nr, nc] == 0:
            q.append((nr, nc))
    return order
