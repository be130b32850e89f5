"""System facade.

Mirrors the reference API surface (``/root/reference/include/core/System.h:27-52``):
construction from a settings yaml, ``track_with_objects`` per frame, output
save helpers, and open/close switches for optimization, depth-ellipsoid
estimation and ground-plane estimation.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from ..io.config import Config
from ..io import writers
from .tracking import Tracking


class System:
    def __init__(self, settings_file: str, use_viewer: bool = False,
                 extractor=None, plane_estimator=None):
        self.config = Config(settings_file)
        self.tracker = Tracking(self.config, extractor=extractor,
                                plane_estimator=plane_estimator)
        self.use_viewer = use_viewer

    # System.h:37 / System.cpp:49-53
    def track_with_objects(self, timestamp: float, pose_wc: np.ndarray,
                           det_mat: np.ndarray,
                           depth: Optional[np.ndarray] = None,
                           rgb: Optional[np.ndarray] = None,
                           with_association: bool = True) -> bool:
        return self.tracker.grab_pose_and_objects(
            timestamp, pose_wc, det_mat, depth, rgb, with_association)

    def open_optimization(self):
        self.tracker.open_optimization = True

    def close_optimization(self):
        self.tracker.open_optimization = False

    def open_ground_plane_estimation(self):
        self.tracker.open_ground_plane_estimation()

    def open_distributed_backend(self, mesh=None):
        """Shard the mapping-mode BA over a device mesh.

        The reference has no distributed backend (SURVEY.md §2.7); this is
        the introduced TPU-native scaling axis: observation buffers are
        partitioned over the mesh, per-edge jacobian work runs locally and
        the normal-equation blocks psum over ICI/DCN
        (``parallel/dist_lm.py``).  With ``mesh=None`` a 1-D mesh over all
        visible (global) devices is built; call
        ``parallel.multihost.initialize()`` first on multi-host slices.
        """
        self.tracker.enable_distributed(mesh)

    # System.cpp:75-91
    def save_objects_to_file(self, path: str):
        self.tracker.sync()
        st = self.tracker.state
        instances = sorted(st.initialized_instances())
        vecs = np.array([st.objects[i].vec10 for i in instances]).reshape(-1, 10)
        writers.save_objects(path, instances, vecs)

    # Tracking.cpp:855-896
    def save_object_history(self, path: str):
        self.tracker.sync()
        st = self.tracker.state
        hist = {i: np.stack(st.objects[i].history)
                for i in sorted(st.objects)
                if st.objects[i].history}
        writers.save_object_history(path, hist)

    @property
    def map_objects(self):
        self.tracker.sync()
        st = self.tracker.state
        return {i: st.objects[i].vec10 for i in st.initialized_instances()}
