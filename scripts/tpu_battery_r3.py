#!/usr/bin/env python
"""Round-3 adaptive TPU battery: bench-sweep the kernel config space, then
gate-check only the winner (falling back down the ranking on failure), then
write BENCH_ENV.json.  Faster than the round-2 battery, which gate-checked
every candidate up front.

Usage: python scripts/tpu_battery_r3.py [OUT_DIR]

The winning config is also the round-3 candidate for the DEFAULT code path
(VERDICT r2 next-steps #1): after this battery, flip the defaults in
ops/patchmatch.py / ops/pm_kernel.py and re-run `python bench.py` clean.
"""
import itertools
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# config name -> env overrides (explicit "0"s pin the default when combined)
CONFIGS = {
    "default": {},
    "split": {"OMVS_GEOM_SPLIT": "1"},
    "fused": {"OMVS_GEOM_FUSED": "1"},
    "compact": {"OMVS_COMPACT": "1"},
    "slab": {"OMVS_SLAB": "1"},
    "compact_split": {"OMVS_COMPACT": "1", "OMVS_GEOM_SPLIT": "1"},
    "compact_fused": {"OMVS_COMPACT": "1", "OMVS_GEOM_FUSED": "1"},
    "slab_compact_split": {"OMVS_SLAB": "1", "OMVS_COMPACT": "1",
                           "OMVS_GEOM_SPLIT": "1"},
    "staged": {"OMVS_STAGED": "1"},
}

BENCH_TIMEOUT = 2400
GATE_TIMEOUT = 2400
MIN_POINTS, MIN_RAW, CLEAN_LO, CLEAN_HI = 200_000, 75_000, 35_000, 45_000


def run(cmd, env_over, log_path, timeout):
    env = dict(os.environ)
    env.update(env_over)
    with open(log_path, "w") as f:
        try:
            p = subprocess.run(cmd, cwd=REPO, env=env, stdout=f,
                               stderr=subprocess.STDOUT, timeout=timeout)
            return p.returncode
        except subprocess.TimeoutExpired:
            f.write("\nTIMEOUT\n")
            return -1


def bench_value(path):
    try:
        for line in open(path):
            if line.startswith("{") and "vs_baseline" in line:
                return json.loads(line)["value"]
    except OSError:
        pass
    return None


def gate_ok(path):
    try:
        txt = open(path).read()
    except OSError:
        return False
    m = re.search(r"RESULT \w+: points=(\d+) raw=(\d+) clean=(\d+)", txt)
    if not m:
        return False
    pts, raw, clean = map(int, m.groups())
    return (pts >= MIN_POINTS and raw >= MIN_RAW
            and CLEAN_LO <= clean <= CLEAN_HI)


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpu_battery_r3"
    os.makedirs(out, exist_ok=True)
    summary = open(os.path.join(out, "summary.log"), "a")

    def log(msg):
        line = f"=== {time.strftime('%H:%M:%S')} {msg}"
        print(line, flush=True)
        summary.write(line + "\n")
        summary.flush()

    # clean default env (ADVICE r2): a stale BENCH_ENV.json confounds A/Bs
    stale = os.path.join(REPO, "BENCH_ENV.json")
    if os.path.exists(stale):
        os.rename(stale, stale + ".pre_battery")
        log(f"moved stale BENCH_ENV.json aside")

    results = {}
    for name, env_over in CONFIGS.items():
        lp = os.path.join(out, f"bench_{name}.log")
        rc = run([sys.executable, "bench.py"], env_over, lp, BENCH_TIMEOUT)
        v = bench_value(lp)
        results[name] = v
        log(f"bench {name}: rc={rc} value={v} env={env_over}")

    v0 = results.get("default")
    if v0 is None:
        log("ERROR: default bench failed — aborting decision")
        return 2

    ranking = sorted(
        ((v, n) for n, v in results.items() if v is not None and n != "default"),
        reverse=True)
    log(f"ranking: {[(n, round(v,3)) for v, n in ranking]} default={v0:.3f}")

    winner = None
    for v, name in ranking:
        if v <= v0 * 1.05:
            log(f"{name} ({v:.3f}) does not beat default*1.05 — stopping")
            break
        glog = os.path.join(out, f"gate_{name}.log")
        rc = run([sys.executable, "scripts/dev_gate_counts.py", name],
                 CONFIGS[name], glog, GATE_TIMEOUT)
        ok = gate_ok(glog)
        tail = ""
        try:
            m = re.search(r"RESULT .*", open(glog).read())
            tail = m.group(0) if m else ""
        except OSError:
            pass
        log(f"gates {name}: rc={rc} ok={ok} {tail}")
        if ok:
            winner = (name, v)
            break

    if winner:
        name, v = winner
        env = dict(CONFIGS[name])
        env["_basis"] = (f"battery r3: {name} {v:.3f} vs default {v0:.3f} "
                         f"dm/s, gates ok")
        with open(os.path.join(REPO, "BENCH_ENV.json"), "w") as f:
            json.dump(env, f, indent=1)
        log(f"wrote BENCH_ENV.json: {env}")
    else:
        log("keeping default bench config")
    log("DONE")
    return 0


if __name__ == "__main__":
    sys.exit(main())
