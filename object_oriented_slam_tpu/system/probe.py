"""Device-link probing and dispatch-architecture auto-selection.

The round-2 dispatch-architecture A/B (BENCH_DETAILS.md "Round 2")
showed the best per-frame architecture depends on the link to the
device, not the device itself:

  * high round-trip latency (tunneled/remote device, ~25-100 ms
    blocking fetch): the loop's critical path is the WAIT for the due
    frame's extraction result, so the monolithic one-program extractor
    wins — anything that adds a young-fetched program or grows the
    fetched program loses.
  * low round-trip latency (locally attached TPU, sub-ms fetch): the
    device time is the critical path, so host-clustered fused-split
    extraction (device executes ~5 ms/frame instead of ~11) plus LM
    fusion wins.

``choose_architecture`` turns that measured insight into shipped
behavior: probe the blocking round-trip once at startup and pick the
architecture; callers keep an explicit override.

Why the choice is startup-only (not revisited mid-run): switching the
extractor object mid-run is NOT a pure scheduling change like the
adaptive pipeline depth.  The split/fused protocols hold in-flight
device state across frames (phase-A handles awaiting midway, the fused
chain's one-frame lag, LM batches riding extraction programs), so a
swap requires flushing every queue — a full pipeline stall plus fresh
compiles of the other architecture's programs (2-60 s each on the
remote service, §CLAUDE.md), which costs far more than the few ms/frame
the better architecture saves; and the hour-scale RTT swings that would
motivate a switch (7-45 ms, BENCH_DETAILS) mostly stay on ONE side of
the 5 ms decision boundary, so the decision itself is stable even when
the fetch cost is not.  The adaptive depth controller absorbs
within-regime swings; when even its deepest window cannot (depth pinned
at max with still-blocked fetches), ``Tracking`` logs the saturation
once as the operator's signal to restart with ``--extractor`` pinned.
"""
from __future__ import annotations

import time
from typing import Optional

# blocking-RTT decision boundary (ms): tunneled links measure >= 25 ms,
# local devices (and the CPU backend) well under 2 ms; 5 ms splits the
# two regimes with an order of magnitude of margin on both sides
RTT_THRESHOLD_MS = 5.0


def probe_device_rtt_ms(n: int = 7) -> float:
    """Median blocking dispatch+fetch round trip of a trivial program.

    Uses a scalar fetch to sync (block_until_ready does not drain the
    axon queue).  The program is compiled and warmed before timing.
    """
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda a: a + 1.0)
    x = jnp.zeros(8, jnp.float32)
    for _ in range(3):
        float(f(x).sum())
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(f(x).sum())
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2] * 1e3


def choose_architecture(rtt_ms: Optional[float] = None,
                        native_ok: Optional[bool] = None):
    """Returns ("mono" | "fused", fuse_lm: bool).

    mono + no fusion for high-latency links; fused-split + LM fusion for
    low-latency links when the native host-clustering library is
    available (the fused path needs it), mono otherwise.
    """
    if rtt_ms is None:
        rtt_ms = probe_device_rtt_ms()
    if native_ok is None:
        from ..io.native_loader import native_available
        native_ok = native_available()
    if rtt_ms >= RTT_THRESHOLD_MS or not native_ok:
        return "mono", False
    return "fused", True
