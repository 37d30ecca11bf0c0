"""Serial NumPy oracle: the correctness anchor for every device kernel.

The reference mount was empty at survey time (SURVEY.md §"PROVENANCE"), so
these heap-based serial implementations — written directly from the published
pseudocode of Barnes et al. 2014 (arxiv 1511.04463, Priority-Flood), Barnes
2016 (1606.06204, parallel fill; 1608.04431, parallel D8 accumulation), and
the per-metric papers — stand in for "the reference's prognostic rasters".
Every JAX/Pallas op in :mod:`richdem_tpu.ops` is gated on allclose agreement
with this package.

The oracle favors clarity over speed: plain Python loops + ``heapq``.  Keep
test grids small (≲ 256²).
"""

from richdem_tpu.oracle.fill import (
    priority_flood_fill,
    priority_flood_epsilon,
    priority_flood_flowdirs,
    priority_flood_watersheds,
    pit_mask,
)
from richdem_tpu.oracle.flowdirs import (
    d8_flowdirs,
    rho8_flowdirs,
    dinf_flowdirs,
    flow_proportions,
)
from richdem_tpu.oracle.accum import flow_accumulation_from_props, d8_accumulation
from richdem_tpu.oracle.terrain import terrain_attribute
from richdem_tpu.oracle.flats import resolve_flats
from richdem_tpu.oracle.breach import breach_depressions
