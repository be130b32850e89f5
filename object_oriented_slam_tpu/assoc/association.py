"""Data association of per-frame 3D ellipsoid observations to map instances.

Re-design of ``/root/reference/src/core/DataAssociation.cpp``:
  * cost = Euclidean distance between world-frame centers (:49-72)
  * greedy row-wise minimum with a 1.0 m gate and column claiming (:90-135)
  * unmatched observations allocate fresh instance IDs (:137-140)

The reference returns column indices into its (sorted) instance map and uses
them directly as instance IDs -- valid there because auto-mode instances are
created densely from a counter.  Here the mapping back to actual instance IDs
is explicit, which is equivalent for dense IDs and correct in general.

The cost matrix build is vectorized (one [N_obs, N_map] distance matrix);
the tiny greedy loop runs on host, mirroring the sequential column-claiming
semantics exactly.
"""
from __future__ import annotations

from typing import List, Sequence

import numpy as np

GATE_DIS = 1.0  # SETTING_DIS_THRESH, DataAssociation.cpp:94


class InstanceCounter:
    def __init__(self, start: int = 0):
        self.next = start

    def create(self) -> int:
        v = self.next
        self.next += 1
        return v

    def seed(self, start: int) -> None:
        """Resume allocation past already-used ids (checkpoint restore)."""
        self.next = max(self.next, start)


def associate_observations(obs_centers_world: np.ndarray,
                           obs_valid: Sequence[bool],
                           map_instances: Sequence[int],
                           map_centers: np.ndarray,
                           counter: InstanceCounter) -> List[int]:
    """Returns per-observation instance id (or -1 for invalid observations).

    obs_centers_world: [N, 3] world-frame centers of the frame's 3D
    ellipsoid observations; obs_valid: which rows have a valid estimate;
    map_instances/map_centers: current map (sorted by instance id to match
    the reference's std::map iteration order).
    """
    n = len(obs_valid)
    out = [-1] * n
    order = np.argsort(np.asarray(map_instances)) if len(map_instances) else []
    inst_sorted = [map_instances[i] for i in order]
    centers_sorted = (np.asarray(map_centers, np.float64)[order]
                      if len(map_instances) else np.zeros((0, 3)))

    claimed = np.zeros(len(inst_sorted), bool)
    for i in range(n):
        if not obs_valid[i]:
            continue
        if len(inst_sorted) == 0:
            out[i] = counter.create()
            continue
        d = np.linalg.norm(centers_sorted - obs_centers_world[i], axis=1)
        d = np.where(claimed, np.inf, d)
        j = int(np.argmin(d))
        if d[j] < GATE_DIS:
            out[i] = inst_sorted[j]
            claimed[j] = True
        else:
            out[i] = counter.create()
    return out
