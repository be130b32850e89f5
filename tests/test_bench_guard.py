"""Driver-bench tail regression guard (VERDICT r4 item 2).

The driver records each round's bench line in BENCH_r{N}.json.  This
test reads the newest recorded bench and fails if its e2e p90 regressed
more than 2x past the pinned operating point (bench.py E2E_P90_PIN_MS),
or if the bench stopped attributing its worst frame.  Rounds whose
bench predates the attribution fields are skipped, so the guard arms
itself from round 5 onward.
"""
import glob
import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _latest_bench():
    paths = sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json")))
    if not paths:
        pytest.skip("no recorded driver bench")
    with open(paths[-1]) as f:
        rec = json.load(f)
    parsed = rec.get("parsed")
    if not parsed or "e2e_p90_ms" not in parsed:
        pytest.skip("latest bench has no parsed tail fields")
    return paths[-1], parsed


def test_e2e_p90_within_2x_pin():
    from bench import E2E_P90_PIN_MS

    path, parsed = _latest_bench()
    if "e2e_p90_pin_ms" not in parsed:
        pytest.skip(f"{os.path.basename(path)} predates the p90 pin")
    p90 = float(parsed["e2e_p90_ms"])
    assert p90 <= 2.0 * E2E_P90_PIN_MS, (
        f"{os.path.basename(path)}: e2e_p90_ms {p90:.1f} regressed past "
        f"2x the pinned operating point ({E2E_P90_PIN_MS} ms); "
        f"worst frame {parsed.get('e2e_max_frame')} cause "
        f"{parsed.get('e2e_max_cause')}")


def test_worst_frame_is_attributed():
    path, parsed = _latest_bench()
    if "e2e_max_cause" not in parsed:
        pytest.skip(f"{os.path.basename(path)} predates tail attribution")
    assert parsed["e2e_max_cause"], "empty e2e_max_cause"
    assert "e2e_max_frame" in parsed
