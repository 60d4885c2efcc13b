#!/usr/bin/env python3
"""Build bench_profile.json — the committed quiet-box expectation profile
that Bench.scala's rerun arbitration and budget scaling read — from one or
more sources: full bench_out.json artifacts and/or profile-format patches
(a JSON with top-level "calib" and "primary"/"sf1"/"sf10"/"sf10f" query
maps — e.g. hand-assembled from quiet-window tools.QueryProbe runs).

Merging takes the MINIMUM across sources per query — the quietest
observation is the right expectation, because contention only ever
INFLATES a measurement. But warm-memo/cached measurements DEFLATE one, and
an unfiltered min permanently locks those in (the r13 profile expected a
6M-row span-dedup in 0.028 s because one source's sf10 leg hit a warm
path; every honest measurement then read as a 10^4x "deviation").
So observations pass a plausibility floor before the merge:

  * scale-leg floor — an sf1/sf10/sf10f observation below the same
    query's PRIMARY expectation is rejected: >=10x the data cannot run
    faster than 1x of it on the same plans (none of the scale-subset
    queries are index-amortized).
  * a rejected query with no surviving observation is DROPPED from the
    leg (no expectation -> deviation arbitration is inert for it and the
    rank/window eligibility paths still cover it), never floored to a
    fabricated value.

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
SCALE_LEGS = [leg for leg, _ in LEGS if leg != "primary"]


def load_one(path):
    d = json.load(open(path))
    if "queries" not in d and any(
        isinstance(d.get(leg), dict) for leg, _ in LEGS
    ):
        # profile-format source (a previous profile or a probe patch)
        legs = {
            leg: {k: float(v) for k, v in d[leg].items()}
            for leg, _ in LEGS
            if isinstance(d.get(leg), dict)
        }
        calib = d.get("calib")
        return (float(calib) if calib else None), legs
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
    observations = {}  # leg -> query -> [every source's value]
    for src in srcs:
        calib, legs = load_one(src)
        if calib is not None:
            calib_candidates.append(calib)
        for leg, qs in legs.items():
            slot = observations.setdefault(leg, {})
            for k, v in qs.items():
                slot.setdefault(k, []).append(v)
    # primary merges first (plain min) — it is the floor the scale legs
    # are checked against. The floor is applied PER OBSERVATION before the
    # scale-leg min, so one poisoned source (even an older profile reused
    # as a source) is rejected while a plausible observation from another
    # source still wins.
    merged = {}
    if "primary" in observations:
        merged["primary"] = {
            k: min(vs) for k, vs in observations["primary"].items()
        }
    primary = merged.get("primary", {})
    dropped = []
    for leg in SCALE_LEGS:
        qs = {}
        for k, vs in observations.get(leg, {}).items():
            floor = primary.get(k)
            ok = [v for v in vs if floor is None or v >= floor]
            bad = [v for v in vs if not (floor is None or v >= floor)]
            if bad:
                dropped.append(
                    f"{leg}:{k}={min(bad)} < primary {floor}"
                    + (f" (kept {min(ok)})" if ok else " (no survivor)")
                )
            if ok:
                qs[k] = min(ok)
        if qs:
            merged[leg] = qs
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
    for msg in dropped:
        print(f"  dropped implausible (warm-poisoned) observation: {msg}")


if __name__ == "__main__":
    main()
