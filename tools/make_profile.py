#!/usr/bin/env python3
"""Build bench_profile.json — the committed quiet-box expectation profile
that Bench.scala's rerun arbitration and budget scaling read — from a full
bench_out.json artifact (run this on a QUIET box: the profile's per-query
times become the expectations contended runs are arbitrated against, so a
contaminated source would hide exactly the contention the profile exists
to catch).

Usage: python3 tools/make_profile.py [bench_out.json] [bench_profile.json]
"""
import json
import statistics
import sys


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "bench_out.json"
    dst = sys.argv[2] if len(sys.argv) > 2 else "bench_profile.json"
    d = json.load(open(src))
    calib = d.get("calib_s", {})
    calibs = [
        v
        for v in [calib.get("start"), calib.get("end"), d.get("calib0_s")]
        if isinstance(v, (int, float)) and v > 0
    ]
    prof = {"calib": round(statistics.median(calibs), 3) if calibs else 0.45}
    for leg, key in [
        ("primary", "queries"),
        ("sf1", "sf1_queries"),
        ("sf10", "sf10_queries"),
        ("sf10f", "sf10f_queries"),
    ]:
        qs = d.get(key) or {}
        if qs:
            prof[leg] = {k: round(float(v), 3) for k, v in sorted(qs.items())}
    json.dump(prof, open(dst, "w"), indent=1)
    legs = ", ".join(f"{k}:{len(v)}" for k, v in prof.items() if k != "calib")
    print(f"wrote {dst}: calib={prof['calib']}, {legs}")


if __name__ == "__main__":
    main()
