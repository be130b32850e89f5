"""Structural tests for the standalone WebGL viewer export and the live
snapshot mode (Viewer-thread analogue, src/core/Viewer.cpp:48-175)."""
import json
import re

import numpy as np

from object_oriented_slam_tpu.system.state import SlamState
from object_oriented_slam_tpu.viz.web_viewer import (export_html,
                                                     export_live_snapshot,
                                                     export_state_html)


def _objects():
    return {0: np.array([0, 0, 0.2, 0, 0, 0, 1, 0.3, 0.2, 0.2]),
            3: np.array([1, 0.5, 0.2, 0, 0, 0.7071, 0.7071, 0.4, 0.2, 0.1])}


def _extract_data(html):
    m = re.search(r"const DATA = (\{.*?\});\n", html, re.S)
    assert m, "embedded DATA not found"
    return json.loads(m.group(1))


def test_export_html_structure(tmp_path):
    p = str(tmp_path / "map.html")
    export_html(p, _objects(),
                trajectory=np.tile([0, 0, 0, 0, 0, 0, 1.0], (5, 1)),
                ground_plane=np.array([0, 0, 1, 0.0]))
    html = open(p).read()
    assert html.count("<script>") == 1          # fully standalone
    data = _extract_data(html)
    assert len(data["objects"]) == 2
    assert data["objects"][0]["id"] == 0
    assert data["plane"] is not None
    assert data["reload_s"] == 0                # snapshot: no self-reload


def test_live_mode_embeds_reload(tmp_path):
    p = str(tmp_path / "live.html")
    export_html(p, _objects(), live_reload_s=2.5)
    html = open(p).read()
    data = _extract_data(html)
    assert data["reload_s"] == 2.5
    # the view-persistence machinery ships with every page but only
    # activates when reload_s is truthy
    assert "localStorage" in html and "location.reload" in html


def test_export_live_snapshot_atomic(tmp_path):
    st = SlamState()
    st.frames_pose_wc.append(np.array([0, 0, 0, 0, 0, 0, 1.0]))
    rec = st.record(0)
    rec.vec10 = np.array([0, 0, 0, 0, 0, 0, 1, 0.3, 0.2, 0.1])
    rec.initialized = True

    f1 = export_live_snapshot(str(tmp_path), st, 10)
    first = open(f1).read()
    assert "frame 10" in first

    st.record(1).vec10 = np.array([1, 1, 0, 0, 0, 0, 1, 0.2, 0.2, 0.2])
    st.objects[1].initialized = True
    f2 = export_live_snapshot(str(tmp_path), st, 20)
    assert f2 == f1                              # same path, rewritten
    second = open(f2).read()
    assert "frame 20" in second
    assert len(_extract_data(second)["objects"]) == 2
    import os
    assert not os.path.exists(f1 + ".tmp")       # tmp cleaned up


def test_export_state_html_passthrough(tmp_path):
    st = SlamState()
    rec = st.record(2)
    rec.vec10 = np.array([0, 0, 0, 0, 0, 0, 1, 0.3, 0.2, 0.1])
    rec.initialized = True
    rec.history.append(np.array([5, 1, 0, 0, 0, 0, 0, 0, 0.3, 0.2, 0.1]))
    p = export_state_html(str(tmp_path / "s.html"), st, live_reload_s=1.0)
    data = _extract_data(open(p).read())
    assert data["reload_s"] == 1.0
    assert "2" in data["history"]


def test_frame_panels_embedded(tmp_path):
    """The live view carries the reference Viewer's RGB + depth image
    panels (Viewer.cpp:146-166) as embedded base64 JPEGs."""
    import base64

    from object_oriented_slam_tpu.viz.web_viewer import frame_panels

    rgb = np.full((48, 64, 3), 120, np.uint8)
    depth = (np.random.RandomState(0).rand(48, 64) * 20000).astype(np.uint16)
    det = np.array([[0, 5, 5, 30, 30, 56, 1.0, 0]])
    K = np.array([[60.0, 0, 32], [0, 60, 24], [0, 0, 1]])
    panels = frame_panels(rgb=rgb, depth=depth, det_mat=det,
                          map_objects=_objects(),
                          pose_wc=np.array([0, 0, -3, 0, 0, 0, 1.0]),
                          K=K, depth_scale=5000.0)
    assert set(panels) == {"frame", "depth"}
    for b64 in panels.values():
        assert base64.b64decode(b64)[:2] == b"\xff\xd8"  # JPEG magic

    st = SlamState()
    p = export_live_snapshot(str(tmp_path), st, 7, image_panels=panels)
    html = open(p).read()
    data = _extract_data(html)
    assert {e["name"] for e in data["panels"]} == {"frame", "depth"}
    assert html.count("<script>") == 1


def test_panels_absent_by_default(tmp_path):
    p = export_live_snapshot(str(tmp_path), SlamState(), 1)
    assert _extract_data(open(p).read())["panels"] == []
