#!/usr/bin/env python
"""Round-5 TPU battery: A/B the ACTIVE ROW-BLOCK COMPACTION fractions (and
their combos with the on-device early-exit block) against the shipping
default (compact checkerboard + hoisted band + 25-texel chunks + per-face
refine scatter), then gate the winner on the bundled-scene count windows,
the smooth-scene F-score band, AND the hard-scene corpus minimum
(VERDICT r4 #3: batteries must not calibrate on the easy scene alone).

Usage: python scripts/tpu_battery_r5.py [OUT_DIR]

Each config benches in a FRESH process (stale-trace safety).  The
persistent XLA cache makes fresh-process compiles ~free after the first
run — compile time no longer pollutes the ranking the way it did in r4
(suspected reason the EE while_loop block under-ranked).
"""
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIGS = {
    # OMVS_ACTIVE = per-tile convergence-skipping churn threshold EPS
    # (pm_kernel tile_act; a tile quiesces once no pixel improved > eps in
    # the previous sweep).  The r5a row-GATHER fraction variant measured a
    # 20% LOSS (bench_active50 0.7369 vs default 0.9184, /tmp/tpu_battery_r5
    # first run) and was replaced by the in-kernel flag skip.
    "default": {},
    "active5e3": {"OMVS_ACTIVE": "5e-3"},
    "active1e2": {"OMVS_ACTIVE": "1e-2"},
    "active2e3": {"OMVS_ACTIVE": "2e-3"},
    "active5e3_from1": {"OMVS_ACTIVE": "5e-3", "OMVS_ACTIVE_FROM": "1"},
    "ee": {"OMVS_EARLY_EXIT": "1"},
    "active5e3_ee": {"OMVS_ACTIVE": "5e-3", "OMVS_EARLY_EXIT": "1"},
}
# battery benches compare the depth-map metric only
COMMON = {"OMVS_BENCH_REFINE": "0", "OMVS_BENCH_SGM": "0"}

BENCH_TIMEOUT = 3600
GATE_TIMEOUT = 3600
QUALITY_TIMEOUT = 5400
MIN_POINTS, MIN_RAW, CLEAN_LO, CLEAN_HI = 200_000, 75_000, 35_000, 45_000


def run(cmd, env_over, log_path, timeout):
    env = dict(os.environ)
    env.update(COMMON)
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


def harness_fscore(out_json):
    try:
        j = json.load(open(out_json))
        return j["patchmatch"]["cloud_fscore@0.06"]["fscore"]
    except Exception:
        return None


def corpus_min_f(out_json):
    try:
        j = json.load(open(out_json))
        return j["summary"]["patchmatch"]["min_f"]
    except Exception:
        return None


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpu_battery_r5"
    os.makedirs(out, exist_ok=True)
    summary = open(os.path.join(out, "summary.log"), "a")

    def log(msg):
        line = f"=== {time.strftime('%H:%M:%S')} {msg}"
        print(line, flush=True)
        summary.write(line + "\n")
        summary.flush()

    stale = os.path.join(REPO, "BENCH_ENV.json")
    if os.path.exists(stale):
        os.rename(stale, stale + ".pre_battery")
        log("moved stale BENCH_ENV.json aside")

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
    log(f"ranking: {[(n, round(v, 3)) for v, n in ranking]} default={v0:.3f}")

    # default gates + smooth F + CORPUS record (the r5 quality baseline)
    glog = os.path.join(out, "gate_default.log")
    rc = run([sys.executable, "scripts/dev_gate_counts.py", "default"],
             {}, glog, GATE_TIMEOUT)
    log(f"gates default: rc={rc} ok={gate_ok(glog)}")
    qjson = os.path.join(out, "quality_default.json")
    rc = run([sys.executable, "scripts/quality_harness.py", qjson, "corpus"],
             {}, os.path.join(out, "quality_default.log"), QUALITY_TIMEOUT)
    f0 = harness_fscore_corpus_smooth(qjson)
    c0 = corpus_min_f(qjson)
    log(f"quality default: rc={rc} smooth_f={f0} corpus_min={c0}")

    winner = None
    for v, name in ranking:
        if v <= v0 * 1.03:
            log(f"{name} ({v:.3f}) does not beat default*1.03 — stopping")
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
        if not ok:
            continue
        qjson = os.path.join(out, f"quality_{name}.json")
        rc = run([sys.executable, "scripts/quality_harness.py", qjson,
                  "corpus"], CONFIGS[name],
                 os.path.join(out, f"quality_{name}.log"), QUALITY_TIMEOUT)
        fN = harness_fscore_corpus_smooth(qjson)
        cN = corpus_min_f(qjson)
        log(f"quality {name}: rc={rc} smooth_f={fN} corpus_min={cN} "
            f"(default {f0}/{c0})")
        if f0 is not None and fN is not None and fN < f0 - 0.01:
            log(f"{name} REJECTED: smooth F {fN:.4f} < default-1%")
            continue
        if c0 is not None and cN is not None and cN < c0 - 0.01:
            log(f"{name} REJECTED: corpus min F {cN:.4f} < default-1%")
            continue
        winner = (name, v)
        break

    if winner:
        name, v = winner
        env_json = os.path.join(REPO, "BENCH_ENV.json")
        json.dump({"env": {**CONFIGS[name]}, "config": name,
                   "value": v, "default_value": v0,
                   "decided": time.strftime("%Y-%m-%d %H:%M:%S")},
                  open(env_json, "w"), indent=1)
        log(f"WINNER {name} ({v:.3f} vs default {v0:.3f}) -> BENCH_ENV.json")
    else:
        log(f"no config beat default+gates+quality; default stays ({v0:.3f})")
    json.dump(results, open(os.path.join(out, "bench_results.json"), "w"),
              indent=1)
    return 0


def harness_fscore_corpus_smooth(out_json):
    try:
        j = json.load(open(out_json))
        return j["corpus"]["smooth"]["patchmatch"]["cloud_fscore@0.06"]["fscore"]
    except Exception:
        return harness_fscore(out_json)


if __name__ == "__main__":
    sys.exit(main())
