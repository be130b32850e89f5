"""Cloud-capacity tiering (frontend/extractor.py _cloud_tier).

The tier must (a) cover the strided pixel-count bound of the largest
bbox so tiered extraction equals full-capacity extraction, and (b) be
computed on the host without touching device state (regression: it once
referenced an unimported STRIDE and raised NameError on every frame).
"""
import pytest

pytestmark = pytest.mark.slow

import jax.numpy as jnp
import numpy as np

from object_oriented_slam_tpu.frontend import ExtractorConfig
from object_oriented_slam_tpu.frontend.extractor import (_cloud_tier,
                                                         _extract_packed)

from test_frontend import CAM, render_scene


def test_cloud_tier_values():
    # 30x30 box -> 11*11 = 121 strided pixels -> min tier 1024
    assert _cloud_tier([[0, 0, 30, 30]], [True], 480, 640, 8192) == 1024
    # full image -> 34240 strided pixels, capped at cap_max
    assert _cloud_tier([[0, 0, 640, 480]], [True], 480, 640, 8192) == 8192
    # 200x200 box -> 67*67 = 4489 -> tier 8192 (next power of two >= 4489)
    assert _cloud_tier([[0, 0, 200, 200]], [True], 480, 640, 8192) == 8192
    # 150x150 box -> 51*51 = 2601 -> tier 4096
    assert _cloud_tier([[0, 0, 150, 150]], [True], 480, 640, 8192) == 4096
    # masked-out rows don't raise the tier
    assert _cloud_tier([[0, 0, 640, 480]], [False], 480, 640, 8192) == 1024


def test_tiered_extraction_matches_full_capacity():
    center = np.array([0.1, 0.4, 2.0])
    r = 0.3
    depth = render_scene(sphere_center=center, sphere_r=r)
    u = CAM.fx * center[0] / center[2] + CAM.cx
    v = CAM.fy * center[1] / center[2] + CAM.cy
    rad = CAM.fx * r / np.sqrt(center[2] ** 2 - r ** 2)
    bbox = np.array([u - rad, v - rad, u + rad, v + rad], np.float32)

    pad = 1
    flat = np.zeros(pad * 6 + 11, np.float32)
    flat[:4] = bbox
    flat[pad * 4] = 1.0               # run mask
    flat[pad * 6 + 3 + 3] = 1.0       # pose_wc quat w = 1 (identity)
    flat[pad * 6 + 7:] = [0.0, -1.0, 0.0, 0.8]  # ground plane y=0.8, cam above

    tier = _cloud_tier([bbox], [True], 480, 640, 8192)
    assert tier < 8192  # the box is small enough that tiering kicks in

    cfg_full = ExtractorConfig(cluster_min_size=30)
    import dataclasses
    cfg_tier = dataclasses.replace(cfg_full, cloud_capacity=tier)

    out_full = np.asarray(_extract_packed(
        jnp.asarray(depth), jnp.asarray(flat), CAM, cfg_full, pad,
        False, False))
    out_tier = np.asarray(_extract_packed(
        jnp.asarray(depth), jnp.asarray(flat), CAM, cfg_tier, pad,
        False, False))

    assert out_full[0, 11] == 1.0  # valid
    # the tier only pads: voxel compaction is deterministic prefix-order,
    # so the tiered result is bit-identical, not merely close
    np.testing.assert_array_equal(out_tier, out_full)
