"""Host-side SLAM state: fixed-capacity observation buffers + map.

The reference keeps pointer graphs (``Map`` of ellipsoid*, per-instance
``Observations`` vectors, ``Frame*`` lists -- src/core/Map.cpp,
Tracking.h:100-135).  Here the state is flat numpy arrays with validity
masks, appended on the host and shipped to the device as one padded batch
per frame, so the jitted backend compiles exactly once.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import numpy as np


@dataclasses.dataclass
class ObjectRecord:
    instance: int
    label: int = -1
    vec10: Optional[np.ndarray] = None      # current map estimate
    initialized: bool = False
    init_by_3d: bool = False
    # 2D observations (Tracking.cpp mmObjectObservations)
    obs2d_pose_cw: List[np.ndarray] = dataclasses.field(default_factory=list)
    obs2d_bbox: List[np.ndarray] = dataclasses.field(default_factory=list)
    obs2d_pose_wc: List[np.ndarray] = dataclasses.field(default_factory=list)
    obs2d_prob: List[float] = dataclasses.field(default_factory=list)
    obs2d_frame: List[int] = dataclasses.field(default_factory=list)
    # 3D observations (Tracking.cpp mmObjectObservations3D)
    obs3d_pose_wc: List[np.ndarray] = dataclasses.field(default_factory=list)
    obs3d_meas: List[np.ndarray] = dataclasses.field(default_factory=list)
    obs3d_prob: List[float] = dataclasses.field(default_factory=list)
    obs3d_frame: List[int] = dataclasses.field(default_factory=list)
    # history rows (obs_count, valid, vec9) for object_history.txt
    history: List[np.ndarray] = dataclasses.field(default_factory=list)


@dataclasses.dataclass
class SlamState:
    objects: Dict[int, ObjectRecord] = dataclasses.field(default_factory=dict)
    frames_pose_wc: List[np.ndarray] = dataclasses.field(default_factory=list)
    frames_ts: List[float] = dataclasses.field(default_factory=list)
    ground_plane: Optional[np.ndarray] = None  # world-frame vec4
    ground_state: int = 0  # 0 closed / 1 estimating / 2 done (Tracking.h:128)

    def record(self, instance: int) -> ObjectRecord:
        if instance not in self.objects:
            self.objects[instance] = ObjectRecord(instance=instance)
        return self.objects[instance]

    def initialized_instances(self) -> List[int]:
        return [i for i, r in self.objects.items() if r.initialized]
