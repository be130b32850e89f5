"""Probe-driven dispatch-architecture auto-selection (system/probe.py)."""
import numpy as np

from object_oriented_slam_tpu.system.probe import (RTT_THRESHOLD_MS,
                                                   choose_architecture,
                                                   probe_device_rtt_ms)


def test_probe_measures_finite_rtt():
    rtt = probe_device_rtt_ms(n=3)
    assert np.isfinite(rtt) and rtt > 0.0


def test_selection_rules():
    # tunneled link -> mono, no fusion (round-2 A/B, BENCH_DETAILS)
    assert choose_architecture(rtt_ms=30.0, native_ok=True) == \
        ("mono", False)
    # local device + native clustering -> fused-split + LM fusion
    assert choose_architecture(rtt_ms=0.5, native_ok=True) == \
        ("fused", True)
    # fused path needs the native cluster library
    assert choose_architecture(rtt_ms=0.5, native_ok=False) == \
        ("mono", False)
    # boundary belongs to the tunnel regime
    assert choose_architecture(rtt_ms=RTT_THRESHOLD_MS,
                               native_ok=True)[0] == "mono"


def test_probe_selects_on_this_backend():
    """End-to-end: probing the attached (CPU test) backend returns a
    valid architecture tuple."""
    arch, fuse = choose_architecture()
    assert arch in ("mono", "fused")
    assert isinstance(fuse, bool)
