#!/usr/bin/env python3
"""Build bench_profile.json — the committed quiet-box expectation profile
that Bench.scala's rerun arbitration and budget scaling read — from one or
more full bench_out.json artifacts. With several sources the per-query
expectation is the MINIMUM across them (the quietest observation is the
right expectation: contention only ever inflates), and the calibration is
the minimum of the sources' medians for the same reason.

Usage: python3 tools/make_profile.py [src1.json [src2.json ...]] [dst.json]
       (the last argument is the destination iff it does not exist or is a
        previous profile; default sources=bench_out.json,
        dst=bench_profile.json)
"""
import json
import statistics
import sys

LEGS = [
    ("primary", "queries"),
    ("sf1", "sf1_queries"),
    ("sf10", "sf10_queries"),
    ("sf10f", "sf10f_queries"),
]


def load_one(path):
    d = json.load(open(path))
    calib = d.get("calib_s", {})
    calibs = [
        v
        for v in [calib.get("start"), calib.get("end"), d.get("calib0_s")]
        if isinstance(v, (int, float)) and v > 0
    ]
    legs = {}
    for leg, key in LEGS:
        qs = d.get(key) or {}
        if qs:
            legs[leg] = {k: float(v) for k, v in qs.items()}
    return (statistics.median(calibs) if calibs else None), legs


def main() -> None:
    args = sys.argv[1:]
    if not args:
        srcs, dst = ["bench_out.json"], "bench_profile.json"
    elif len(args) == 1:
        srcs, dst = [args[0]], "bench_profile.json"
    else:
        srcs, dst = args[:-1], args[-1]
    calib_candidates = []
    merged = {}
    for src in srcs:
        calib, legs = load_one(src)
        if calib is not None:
            calib_candidates.append(calib)
        for leg, qs in legs.items():
            slot = merged.setdefault(leg, {})
            for k, v in qs.items():
                slot[k] = min(v, slot[k]) if k in slot else v
    # per-query times take the min (contention only inflates), but the
    # calibration reference takes the MEDIAN of the sources: it is the
    # denominator of every expectation/estimate scale, and a single
    # unusually fast probe window would silently inflate every scale on a
    # normal box (cost the sf1 leg once in r13)
    prof = {
        "calib": round(statistics.median(calib_candidates), 3)
        if calib_candidates
        else 0.45
    }
    for leg, _ in LEGS:
        if leg in merged:
            prof[leg] = {k: round(v, 3) for k, v in sorted(merged[leg].items())}
    json.dump(prof, open(dst, "w"), indent=1)
    legs = ", ".join(f"{k}:{len(v)}" for k, v in prof.items() if k != "calib")
    print(f"wrote {dst} from {len(srcs)} source(s): calib={prof['calib']}, {legs}")


if __name__ == "__main__":
    main()
