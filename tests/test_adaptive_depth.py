"""Adaptive pipeline depth (system/tracking.py `_adapt_depth`).

The controller deepens the extraction-deferral window when the due
frame's blocking fetch is expensive (tunnel bad hours) and shallows it
back when fetches have been free for a sustained stretch.  Depth is
pure scheduling — per-frame processing order and inputs are unchanged
(Tracking.cpp:170-204 order preserved) — so results must be identical
at ANY depth trajectory, including mid-run changes.
"""
import numpy as np
import pytest

from object_oriented_slam_tpu.system import System

YAML = "/root/reference/Example/param/TUM3.yaml"


def _tracker():
    return System(YAML).tracker


def test_controller_deepens_on_blocked_fetches():
    tr = _tracker()
    base = tr.pipeline_depth
    for _ in range(3):
        tr._adapt_depth(10 * tr.adapt_deepen_s)
    assert tr.pipeline_depth == base + 1
    # window cleared on transition: two more blocked fetches are not enough
    tr._adapt_depth(10 * tr.adapt_deepen_s)
    tr._adapt_depth(10 * tr.adapt_deepen_s)
    assert tr.pipeline_depth == base + 1
    # sustained bad hour saturates at the cap
    for _ in range(64):
        tr._adapt_depth(10 * tr.adapt_deepen_s)
    assert tr.pipeline_depth == tr.adapt_depth_max


def test_controller_shallows_after_sustained_free_fetches():
    tr = _tracker()
    base = tr.pipeline_depth
    # controller-deepened during a bad hour (assignment would re-base)
    for _ in range(64):
        tr._adapt_depth(10 * tr.adapt_deepen_s)
    assert tr.pipeline_depth == tr.adapt_depth_max
    n = tr._adapt_fetches.maxlen
    for _ in range(n - 1):
        tr._adapt_depth(0.1 * tr.adapt_shallow_s)
    assert tr.pipeline_depth == tr.adapt_depth_max  # window not full yet
    tr._adapt_depth(0.1 * tr.adapt_shallow_s)
    assert tr.pipeline_depth == tr.adapt_depth_max - 1
    # drains all the way back to the configured base, never below
    for _ in range(20 * n):
        tr._adapt_depth(0.1 * tr.adapt_shallow_s)
    assert tr.pipeline_depth == tr._depth_base == base


def test_pinned_depth_rebases_controller():
    """Assigning ``pipeline_depth`` pins it: the controller must never
    silently drift a caller-set depth back toward the old base."""
    tr = _tracker()
    tr.pipeline_depth = 6
    for _ in range(64):
        tr._adapt_depth(0.1 * tr.adapt_shallow_s)
    assert tr.pipeline_depth == 6
    # ...while deepening above the pin still works, and drains back to it
    for _ in range(3):
        tr._adapt_depth(10 * tr.adapt_deepen_s)
    assert tr.pipeline_depth == 7
    for _ in range(20 * tr._adapt_fetches.maxlen):
        tr._adapt_depth(0.1 * tr.adapt_shallow_s)
    assert tr.pipeline_depth == 6


def test_sync_flush_does_not_adapt():
    """sync()-time fetches measure the flush, not steady-state latency;
    they must not deepen the window (carries over on tracker reuse)."""
    tr = _tracker()
    base = tr.pipeline_depth
    tr._flushing = True
    for _ in range(64):
        tr._adapt_depth(10 * tr.adapt_deepen_s)
    assert tr.pipeline_depth == base
    assert len(tr._adapt_fetches) == 0


def test_controller_mixed_fetches_hold_depth():
    tr = _tracker()
    base = tr.pipeline_depth
    # alternating blocked/free never satisfies either window
    for i in range(64):
        tr._adapt_depth(10 * tr.adapt_deepen_s if i % 2 else
                        0.1 * tr.adapt_shallow_s)
    assert tr.pipeline_depth == base


def test_controller_off_switch():
    tr = _tracker()
    tr.adaptive_depth = False
    base = tr.pipeline_depth
    for _ in range(64):
        tr._adapt_depth(10 * tr.adapt_deepen_s)
    assert tr.pipeline_depth == base


# ---------------------------------------------------------------------------
# System-level invariance: mid-run depth changes must not alter results.

@pytest.mark.slow
@pytest.mark.parametrize("mode", ["grow", "shrink"])
def test_adaptive_depth_matches_eager(mode):
    from object_oriented_slam_tpu.core.camera import Camera
    from object_oriented_slam_tpu.frontend import (ExtractorConfig,
                                                   make_extractor,
                                                   make_plane_estimator)
    from object_oriented_slam_tpu.io.synthetic import (SyntheticDataset,
                                                       make_scene)

    cam = Camera(fx=535.4, fy=539.2, cx=320.1, cy=247.6, scale=5000.0,
                 width=640, height=480)

    def _run(adapt_mode):
        scene = make_scene(n_objects=4, seed=11, camera=cam)
        ds = SyntheticDataset(scene, n_frames=24, orbit_radius=3.4,
                              height=1.6)
        slam = System(
            YAML,
            extractor=make_extractor(cam, ExtractorConfig(
                cluster_min_size=30)),
            plane_estimator=make_plane_estimator(cam))
        slam.open_ground_plane_estimation()
        tr = slam.tracker
        if adapt_mode == "eager":
            tr.pipeline_depth = 1
            tr.adaptive_depth = False
        elif adapt_mode == "grow":
            # every fetch counts as blocked -> depth climbs 4 -> 8 mid-run
            tr.adapt_deepen_s = -1.0
        elif adapt_mode == "shrink":
            # simulate an earlier bad hour (controller-deepened to the
            # cap); every run fetch counts as free -> drains back to base
            while tr.pipeline_depth < tr.adapt_depth_max:
                tr._adapt_depth(10 * tr.adapt_deepen_s)
            tr._adapt_fetches = type(tr._adapt_fetches)(maxlen=2)
            tr.adapt_deepen_s = float("inf")
            tr.adapt_shallow_s = float("inf")
        depths = set()
        for i, ts, pose, depth, rgb, det in ds.frames():
            slam.track_with_objects(ts, pose, det, depth=depth)
            depths.add(tr.pipeline_depth)
        slam.tracker.sync()
        return slam.map_objects, depths

    objs_e, _ = _run("eager")
    objs_a, depths = _run(mode)
    assert len(depths) > 1, f"depth never changed in {mode} run: {depths}"
    assert set(objs_a) == set(objs_e) and len(objs_e) >= 1
    for inst in objs_e:
        assert np.allclose(objs_a[inst], objs_e[inst], atol=1e-4), \
            (inst, np.abs(objs_a[inst] - objs_e[inst]).max())
