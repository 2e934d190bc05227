#!/usr/bin/env python
"""Decide BENCH_ENV.json from battery A/B logs.

Single copy of the candidate table, gate thresholds, and selection logic
shared by scripts/tpu_validation.sh and scripts/tpu_battery_*.sh (ADVICE r2:
the inline copies drifted).

Usage: python scripts/decide_bench_env.py LOGDIR [--write PATH]

Selection is order-independent: collect ALL gate-passing candidates, take the
max bench value, and require it to beat the default by >=1.05x.  If the
default bench measurement is missing the script ABORTS loudly (rc=2) instead
of silently keeping the default.
"""
import json
import os
import re
import sys

# (bench log, gate log, env) — gate log may be None if the candidate's
# pipeline parity was established elsewhere this round.
CANDIDATES = [
    ("5b_bench_split.log", "4_split_kernel.log", {"OMVS_GEOM_SPLIT": "1"}),
    ("5c_bench_fused.log", "4b_geom_fused.log", {"OMVS_GEOM_FUSED": "1"}),
    ("5d_bench_compact.log", "4g_compact.log", {"OMVS_COMPACT": "1"}),
    ("5e_bench_compact_split.log", "4h_compact_split.log",
     {"OMVS_COMPACT": "1", "OMVS_GEOM_SPLIT": "1"}),
]

# the pipeline test's thresholds (tests/test_pipeline_full.py, mirroring
# the reference's apps/Tests/Tests.cpp:85-103)
MIN_POINTS, MIN_RAW, CLEAN_LO, CLEAN_HI = 200_000, 75_000, 35_000, 45_000
HYSTERESIS = 1.05


def bench_value(path):
    try:
        for line in open(path):
            if line.startswith("{") and "vs_baseline" in line:
                return json.loads(line)["value"]
    except OSError:
        pass
    return None


def gate(path):
    try:
        txt = open(path).read()
    except OSError:
        return None
    m = re.search(r"RESULT \w+: points=(\d+) raw=(\d+) clean=(\d+)", txt)
    if not m:
        return None
    pts, raw, clean = map(int, m.groups())
    return pts >= MIN_POINTS and raw >= MIN_RAW and CLEAN_LO <= clean <= CLEAN_HI


def decide(out_dir):
    """Returns (default_value, best_value, best_env_or_None). Raises
    RuntimeError if the default measurement is missing."""
    v0 = bench_value(os.path.join(out_dir, "5_bench.log"))
    if v0 is None:
        raise RuntimeError(
            "default bench measurement (5_bench.log) missing or unparseable — "
            "cannot A/B; fix the default run first")
    passing = []
    for blog, glog, env in CANDIDATES:
        v = bench_value(os.path.join(out_dir, blog))
        ok = gate(os.path.join(out_dir, glog)) if glog else True
        print(f"{env}: bench={v} gates ok={ok}")
        if v and ok:
            passing.append((v, env))
    if not passing:
        return v0, v0, None
    best_v, best_env = max(passing, key=lambda t: t[0])
    if best_v > v0 * HYSTERESIS:
        return v0, best_v, best_env
    return v0, best_v, None


def main():
    out_dir = sys.argv[1]
    write_path = "/root/repo/BENCH_ENV.json"
    if "--write" in sys.argv:
        write_path = sys.argv[sys.argv.index("--write") + 1]
    try:
        v0, best_v, best_env = decide(out_dir)
    except RuntimeError as e:
        print(f"ERROR: {e}", file=sys.stderr)
        return 2
    print(f"bench default={v0} best={best_v}")
    if best_env:
        best_env["_basis"] = (
            f"battery: {best_v:.3f} vs default {v0:.3f} dm/s, gates ok")
        with open(write_path, "w") as f:
            json.dump(best_env, f, indent=1)
        print(f"wrote {write_path}: {best_env}")
    else:
        print("keeping default bench config")
    return 0


if __name__ == "__main__":
    sys.exit(main())
