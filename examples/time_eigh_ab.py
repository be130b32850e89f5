"""In-process A/B: closed-form ops/linalg.eigh3 vs jnp.linalg.eigh in the
two device programs that eigendecompose — the per-frame extraction PCA
and the one-shot ground-plane fit.

Patches ``linalg.eigh3`` and clears the jit caches between variants so
both compile fresh in ONE process (cross-process timing is invalid on
the tunneled device).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python examples/time_eigh_ab.py
"""
import time

import numpy as np


def sync_time(fn, reps=40, warm=30):
    out = fn()
    float(np.asarray(out).sum())
    for _ in range(warm):
        out = fn()
    float(np.asarray(out).sum())
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [fn() for _ in range(reps)]
        float(sum(np.asarray(o).sum() for o in outs))
        best = min(best, (time.perf_counter() - t0) / reps * 1e3)
    return best


def main():
    import jax.numpy as jnp

    from object_oriented_slam_tpu.core.camera import Camera
    from object_oriented_slam_tpu.frontend import ExtractorConfig
    from object_oriented_slam_tpu.frontend import extractor as ex_mod
    from object_oriented_slam_tpu.frontend import ground_plane as gp_mod
    from object_oriented_slam_tpu.frontend.extractor import (_cloud_tier,
                                                             _extract_packed)
    from object_oriented_slam_tpu.io import TUMDataset
    from object_oriented_slam_tpu.ops import linalg

    cam = Camera(fx=535.4, fy=539.2, cx=320.1, cy=247.6, scale=5000.0)
    ds = TUMDataset("/root/reference/Example/dataset/cabinet/")
    depth0 = None
    for i, ts, pose, depth, rgb, det in ds.frames():
        if i == 0:
            depth0 = depth
        if i == 33 and len(det):
            break
    bboxes = det[:, 1:5].astype(np.float32)
    pad = 1
    flat = np.zeros(pad * 6 + 11, np.float32)
    flat[:4] = bboxes[0]
    flat[pad * 4] = 1.0
    flat[pad * 5] = 2.0
    flat[pad * 6:pad * 6 + 7] = pose
    flat[pad * 6 + 7:] = [0.015, 0.006, 0.999, -0.316]
    depth_j = jnp.asarray(depth.astype(np.int32))
    depth0_j = jnp.asarray(depth0.astype(np.int32))
    flat_j = jnp.asarray(flat)
    tier = _cloud_tier(bboxes[:1], [True], cam.height, cam.width, 16384)
    cfg = ExtractorConfig(cloud_capacity=tier, open_symmetry=True)
    gcfg = gp_mod.GroundPlaneConfig()

    closed = linalg.eigh3
    variants = [("closed eigh3", closed),
                ("lax eigh", lambda A: tuple(jnp.linalg.eigh(A)))]
    for name, impl in variants:
        linalg.eigh3 = impl
        gp_mod.estimate_ground_plane.clear_cache()
        _extract_packed.clear_cache()
        gp_ms = sync_time(
            lambda: gp_mod.estimate_ground_plane(depth0_j, cam, gcfg)[0],
            reps=20, warm=10)
        ex_ms = sync_time(
            lambda: _extract_packed(depth_j, flat_j, cam, cfg, pad,
                                    False, True), reps=40)
        print(f"{name:14s} ground_plane {gp_ms:7.2f} ms   "
              f"extract+sym {ex_ms:7.2f} ms", flush=True)
    linalg.eigh3 = closed


if __name__ == "__main__":
    main()
