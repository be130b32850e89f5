"""TUM RGB-D dataset loader.

Host-side (numpy) re-design of ``/root/reference/src/tum_rgbd/io.cpp``:
  * frames enumerated from ``rgb/``, sorted numerically by timestamp stem
    (dataprocess_utils.cpp:25-69)
  * ``groundtruth.txt`` rows ``ts x y z qx qy qz qw`` (io.cpp:156-172)
  * ``associate.txt`` rgb<->depth association (io.cpp:174-207)
  * ``associateGroundtruth.txt`` rgb<->gt association with the trailing
    two-digit precision trim (io.cpp:209-244)
  * timestamp matching at 1 ms tolerance (io.cpp:97-123)
  * per-frame detections from ``bbox/<rgb_ts>.txt`` rows
    ``id x1 y1 x2 y2 label rate instanceID`` (io.cpp:277-290)
  * optional external odometry with SE3 alignment of the first frame to the
    groundtruth (io.cpp:327-418)

Images are decoded with cv2 (16-bit depth PNG, 8-bit RGB).
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

from ..core import se3 as se3np  # noqa: F401  (jnp se3 used via numpy wrappers below)


def _quat_mul_np(q1, q2):
    x1, y1, z1, w1 = q1
    x2, y2, z2, w2 = q2
    return np.array([
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
    ])


def _quat_rotate_np(q, v):
    qv, w = q[:3], q[3]
    t = 2.0 * np.cross(qv, v)
    return v + w * t + np.cross(qv, t)


def _se3_mul_np(a, b):
    t = a[:3] + _quat_rotate_np(a[3:], b[:3])
    q = _quat_mul_np(a[3:], b[3:])
    return np.concatenate([t, q / np.linalg.norm(q)])


def _se3_inv_np(a):
    qi = a[3:] * np.array([-1.0, -1.0, -1.0, 1.0])
    return np.concatenate([-_quat_rotate_np(qi, a[:3]), qi])


class _StampIndex:
    """Sorted-timestamp index for 1 ms-tolerance association.

    Replaces the reference's linear scan over all timestamps per lookup
    (io.cpp:97-123) with a bisect over a sorted float array — O(log N)
    per call instead of O(N), which matters on 10k-frame sequences where
    several lookups happen per frame.  Returns the *nearest* entry within
    tolerance (the scan returned the first in file order; timestamps are
    ~30 ms apart so at most one entry ever matches)."""

    def __init__(self, mapping: Dict[str, object]):
        self.keys = sorted(mapping, key=float)
        self.times = np.array([float(k) for k in self.keys], np.float64)
        self.mapping = mapping

    def lookup(self, stamp, tol: float = 0.001):
        t = float(stamp)
        i = int(np.searchsorted(self.times, t))
        best, best_d = None, tol
        for j in (i - 1, i):
            if 0 <= j < len(self.times):
                d = abs(float(self.times[j]) - t)
                if d < best_d:
                    best, best_d = self.keys[j], d
        return self.mapping[best] if best is not None else None


def _read_rows(path: str) -> List[List[str]]:
    rows = []
    if not os.path.exists(path):
        return rows
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            rows.append(line.replace(",", " ").split())
    return rows


class TUMDataset:
    """Sequential access to a TUM RGB-D sequence with detections.

    With ``use_native=True`` (default) image decode goes through the C++
    threaded-prefetch loader (native/src/tum_loader.cpp) so IO overlaps the
    device compute of the previous frame; falls back to cv2 otherwise.
    """

    def __init__(self, dataset_dir: str, detection_dir: Optional[str] = None,
                 use_native: bool = True):
        self.dir = dataset_dir.rstrip("/") + "/"
        self.rgb_dir = self.dir + "rgb/"
        self.depth_dir = self.dir + "depth/"
        self.detection_dir = detection_dir or (self.dir + "bbox/")

        rgb_files = [f for f in os.listdir(self.rgb_dir)]
        rgb_files.sort(key=lambda s: float(os.path.splitext(s)[0]))
        self.rgb_files = rgb_files
        self.rgb_stamps = [os.path.splitext(f)[0] for f in rgb_files]
        self.total = len(rgb_files)

        # groundtruth map
        self.gt: Dict[str, np.ndarray] = {}
        for row in _read_rows(self.dir + "groundtruth.txt"):
            self.gt[row[0]] = np.array([float(v) for v in row[1:8]], np.float64)

        # rgb ts -> (depth ts, depth path)
        self.rgb_to_depth: Dict[str, Tuple[str, str]] = {}
        for row in _read_rows(self.dir + "associate.txt"):
            self.rgb_to_depth[row[0]] = (row[2], row[3])

        # rgb ts -> gt ts (trim last 2 digits, io.cpp:221-223)
        self.rgb_to_gt: Dict[str, str] = {}
        for row in _read_rows(self.dir + "associateGroundtruth.txt"):
            self.rgb_to_gt[row[0]] = row[2][:-2]

        self.current = 0
        self.odometry: Optional[Dict[str, np.ndarray]] = None
        self._gt_idx = _StampIndex(self.gt)
        self._depth_idx = _StampIndex(self.rgb_to_depth)
        self._gt_ts_idx = _StampIndex(self.rgb_to_gt)
        self._odom_idx: Optional[_StampIndex] = None

        self._native = None
        if use_native:
            try:
                from . import native_loader as nl
                if nl.native_available():
                    dps, rps = [], []
                    for i in range(self.total):
                        dp = self._depth_idx.lookup(self.rgb_stamps[i])
                        dps.append(os.path.join(self.dir, dp[1])
                                   if dp else "")
                        rps.append(os.path.join(self.rgb_dir,
                                                self.rgb_files[i]))
                    self._native = nl.PrefetchingLoader(dps, rps)
            except Exception:
                self._native = None

    def pose_for(self, index: int) -> Optional[np.ndarray]:
        rgb_ts = self.rgb_stamps[index]
        if self._odom_idx is not None:
            return self._odom_idx.lookup(rgb_ts)
        gt_ts = self._gt_ts_idx.lookup(rgb_ts)
        if gt_ts is None:
            return None
        return self._gt_idx.lookup(gt_ts)

    def read_frame(self, index: int):
        """Returns (timestamp, pose7[w<-c], depth u16, rgb u8) or None."""
        if index < 0 or index >= self.total:
            return None
        rgb_ts = self.rgb_stamps[index]
        pose = self.pose_for(index)
        if pose is None:
            return None
        dp = self._depth_idx.lookup(rgb_ts)
        if dp is None:
            return None
        if self._native is not None:
            out = self._native.get(index)
            if out is not None:
                depth, rgb = out
                return float(rgb_ts), pose.astype(np.float64), depth, rgb
        depth_path = os.path.join(self.dir, dp[1])
        rgb_path = os.path.join(self.rgb_dir, self.rgb_files[index])
        if cv2 is None:
            raise RuntimeError("cv2 unavailable for image decode")
        depth = cv2.imread(depth_path, cv2.IMREAD_UNCHANGED)
        rgb = cv2.imread(rgb_path, cv2.IMREAD_UNCHANGED)
        if depth is None:
            return None
        return float(rgb_ts), pose.astype(np.float64), depth, rgb

    def detections(self, index: int) -> np.ndarray:
        """Detection matrix rows: id x1 y1 x2 y2 label rate instanceID
        (io.cpp:277-290). Empty (0, 8) if file missing."""
        path = os.path.join(self.detection_dir, self.rgb_stamps[index] + ".txt")
        rows = _read_rows(path)
        if not rows:
            return np.zeros((0, 8), np.float64)
        return np.array([[float(v) for v in r] for r in rows], np.float64)

    def frames(self):
        """Iterate valid frames: yields (index, ts, pose, depth, rgb, detmat)."""
        for i in range(self.total):
            out = self.read_frame(i)
            if out is None:
                continue
            ts, pose, depth, rgb = out
            yield i, ts, pose, depth, rgb, self.detections(i)

    # -- sequential-access API parity (io.cpp:50-61,292-325,420-441) ------
    def valid_indices(self):
        """Frames with both a depth association and a pose
        (generateValidVector, io.cpp:292-325)."""
        out = []
        for i in range(self.total):
            if self._depth_idx.lookup(self.rgb_stamps[i]) is None:
                continue
            if self.pose_for(i) is None:
                continue
            out.append(i)
        return out

    def set_current(self, index: int) -> None:
        """SetCurrentID (io.cpp:420-431)."""
        if 0 <= index < self.total:
            self.current = index

    def empty(self) -> bool:
        return self.current >= self.total

    def read_next(self):
        """readFrame-style sequential access (io.cpp:50-61): returns
        (index, ts, pose, depth, rgb, detections) or None and advances."""
        while self.current < self.total:
            i = self.current
            self.current += 1
            out = self.read_frame(i)
            if out is not None:
                ts, pose, depth, rgb = out
                return i, ts, pose, depth, rgb, self.detections(i)
        return None

    # -- odometry (io.cpp:327-418) ---------------------------------------
    def set_odometry(self, odom_path: str, calibrate: bool = True) -> bool:
        rows = _read_rows(odom_path)
        if not rows:
            return False
        odom = {r[0]: np.array([float(v) for v in r[1:8]], np.float64)
                for r in rows}
        if calibrate:
            # align first odometry pose to the groundtruth of its frame
            trans = None
            odom_idx = _StampIndex(odom)
            for idx, stamp in enumerate(self.rgb_stamps):
                gt_pose = self.pose_for(idx)
                odom_pose = odom_idx.lookup(stamp)
                if gt_pose is not None and odom_pose is not None:
                    trans = _se3_mul_np(gt_pose, _se3_inv_np(odom_pose))
                    break
            if trans is not None:
                odom = {k: _se3_mul_np(trans, v) for k, v in odom.items()}
        self.odometry = odom
        self._odom_idx = _StampIndex(odom)
        return True
