#!/usr/bin/env python3
"""Self-test for tools/status.py's spread_advisories (VERDICT r10 #4).

The min-of-reps bench gate is deliberately blind to intermittent
contention; the advisory must surface the "wide spread, flat min"
signature without gating, and must NOT fire on flat records, gated
queries, or sub-noise-floor queries.

Usage: python3 tools/test_status.py   (exit 0 = all assertions pass)
"""
import json, os, sys, tempfile

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)
from status import spread_advisories, burst_window, load_bench_spread  # noqa: E402


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

    # --- burst_window (VERDICT r12 item 4): rep provenance names the
    # contention window instead of leaving it to id-adjacency inference.
    def entry(reps, mn, mx):
        return {"med": (mn + mx) / 2, "min": mn, "max": mx, "gc": 0.0,
                "reps": reps}
    # 600s run, 3 passes of ~200s. Four wide queries whose slowest reps
    # all sit in pass 2 between 210s and 250s → burst named.
    burst_spread = {
        f"q{180 + i}_x": entry(
            [(1, 10.0 + i, 1.0), (2, 210.0 + 10 * i, 6.0), (3, 410.0 + i, 1.0)],
            1.0, 6.0)
        for i in range(4)
    }
    # plus flat queries establishing the run span (and not counted wide)
    burst_spread["q01_agg"] = entry(
        [(1, 0.0, 1.0), (2, 200.0, 1.0), (3, 599.0, 1.0)], 1.0, 1.1)
    b = burst_window(burst_spread)
    assert b and "pass 2" in b and "4/4" in b, f"burst not named: {b}"
    # same wide queries but slow reps SCATTERED across passes — no burst
    scattered = {
        f"q{180 + i}_x": entry(
            [(1, 10.0 + i, 6.0 if i % 2 else 1.0),
             (2, 210.0 + i, 1.0 if i % 2 else 6.0),
             (3, 410.0 + 150 * (i % 2), 1.0)], 1.0, 6.0)
        for i in range(4)
    }
    scattered["q01_agg"] = burst_spread["q01_agg"]
    assert burst_window(scattered) is None, "scattered slow reps must not read as a burst"
    # fewer than min_cluster wide queries — silent
    assert burst_window({"q180_x": burst_spread["q180_x"],
                         "q01_agg": burst_spread["q01_agg"]}) is None
    # no provenance (pre-r13 record) — silent, not a crash
    assert burst_window({"q34_jaccard": {"med": 11.7, "min": 5.1, "max": 12.0}}) is None

    # --- load_bench_spread round-trips the reps field (and old records
    # without one), both from clean JSON and from a truncated tail.
    rec = {"metric": "total", "value": 1.0, "unit": "sec",
           "queries": {"q01_agg": 1.0},
           "spread": {"q01_agg": {"med": 1.0, "min": 0.9, "max": 1.1,
                                  "gc": 0.1, "reps": [[1, 0.0, 1.0],
                                                      [2, 100.0, 0.9]]}},
           "failed": [], "sf": "x"}
    with tempfile.NamedTemporaryFile("w", suffix=".json", delete=False) as f:
        json.dump(rec, f)
        path = f.name
    sp = load_bench_spread(path)
    assert sp["q01_agg"]["min"] == 0.9
    assert sp["q01_agg"]["reps"] == [(1, 0.0, 1.0), (2, 100.0, 0.9)]
    # truncated tail containing a reps array: scalar fields still parse
    with open(path, "w") as f:
        f.write('...d":{"med":1.000,"min":0.900,"max":1.100,"gc":0.100},'
                '"q02_topk":{"med":2.000,"min":1.900,"max":2.100,"gc":0.200,'
                '"reps":[[1,0.0,2.0],[2,100.0,1.9]]},"failed":[]')
    sp = load_bench_spread(path)
    assert sp["q02_topk"]["min"] == 1.9, sp
    os.unlink(path)

    print("test_status: OK (spread advisory fires once, suppressions hold; "
          "burst window named from rep provenance; reps field round-trips)")


if __name__ == "__main__":
    main()
