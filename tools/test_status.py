#!/usr/bin/env python3
"""Self-test for tools/status.py's spread_advisories (VERDICT r10 #4).

The min-of-reps bench gate is deliberately blind to intermittent
contention; the advisory must surface the "wide spread, flat min"
signature without gating, and must NOT fire on flat records, gated
queries, or sub-noise-floor queries.

Usage: python3 tools/test_status.py   (exit 0 = all assertions pass)
"""
import os, sys

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)
from status import spread_advisories  # noqa: E402


def main():
    spread = {
        # the r9 q34 / r10 q103 signature: min flat, max 2x+ — fires
        "q34_jaccard": {"med": 11.7, "min": 5.1, "max": 12.0, "gc": 3.2},
        # flat record — silent
        "q01_agg": {"med": 1.0, "min": 0.95, "max": 1.05, "gc": 0.1},
        # wide but below the 0.3s noise floor — silent
        "q12_strings": {"med": 0.12, "min": 0.05, "max": 0.2, "gc": 0.0},
        # wide, but the gate already flagged it — suppressed
        "q46_minhash": {"med": 9.0, "min": 4.0, "max": 10.0, "gc": 1.0},
        # exactly 2.0x — NOT strictly greater, silent (boundary pin)
        "q02_topk": {"med": 1.0, "min": 0.5, "max": 1.0, "gc": 0.0},
        # missing max field — silent, not a crash
        "q03_join": {"med": 1.0, "min": 0.5},
    }
    adv = spread_advisories(spread, flagged={"q46_minhash"})
    assert len(adv) == 1, f"expected exactly one advisory, got: {adv}"
    assert adv[0].startswith("q34_jaccard:"), adv[0]
    assert "wide spread, flat min" in adv[0]
    assert "2.4x" in adv[0], adv[0]
    assert "gc=3.2s" in adv[0], adv[0]
    assert "not gated" in adv[0]

    # empty spread (pre-r10 record with no spread map) — no advisories
    assert spread_advisories({}) == []
    print("test_status: OK (spread advisory fires once, suppressions hold)")


if __name__ == "__main__":
    main()
