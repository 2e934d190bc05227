#!/usr/bin/env python
"""Round-4 TPU battery: bench the kernel-config space around the NEW
defaults (merged scorer+geom kernel + calibrated fusion weight floor),
then gate-check the winner on BOTH the bundled-scene count gates and a
quality-harness F-score leg (VERDICT r3 #6: correctness-improving configs
must not be rejected by the parity band alone).

Usage: python scripts/tpu_battery_r4.py [OUT_DIR]

Round-4 notes:
- "default" now IS the fused geometric kernel (float32-correct term).
- slab/dynslab are DROPPED from the battery: the round-4 contract corpus
  (tests/test_kernel_variants_contract.py) measured 8.5% extra pixel
  invalidation on asymmetric baselines — they never produce wrong values
  but starve regions of evidence, so they stay opt-in experiments only.
- hoist passed the same corpus with ZERO extra invalidation.
"""
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIGS = {
    "default": {},
    "hoist25": {"OMVS_HOIST": "1", "OMVS_TEXEL_CHUNK": "25"},
    "hoist": {"OMVS_HOIST": "1"},
    "compact": {"OMVS_COMPACT": "1"},
    "compact_hoist25": {"OMVS_COMPACT": "1", "OMVS_HOIST": "1",
                        "OMVS_TEXEL_CHUNK": "25"},
    "staged": {"OMVS_STAGED": "1"},
    "ee": {"OMVS_EARLY_EXIT": "1"},
    "hoist25_ee": {"OMVS_HOIST": "1", "OMVS_TEXEL_CHUNK": "25",
                   "OMVS_EARLY_EXIT": "1"},
    "geomxla": {"OMVS_GEOM_FUSED": "0"},   # regression reference
}

BENCH_TIMEOUT = 2400
GATE_TIMEOUT = 2400
QUALITY_TIMEOUT = 3600
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


def harness_fscore(out_json):
    try:
        j = json.load(open(out_json))
        return j["patchmatch"]["cloud_fscore@0.06"]["fscore"]
    except Exception:
        return None


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpu_battery_r4"
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

    # default must itself pass the gates (it is the shipping config)
    glog = os.path.join(out, "gate_default.log")
    rc = run([sys.executable, "scripts/dev_gate_counts.py", "default"],
             {}, glog, GATE_TIMEOUT)
    log(f"gates default: rc={rc} ok={gate_ok(glog)}")

    # quality F-score for the default (the record to not regress)
    qlog = os.path.join(out, "quality_default.log")
    qjson = os.path.join(out, "quality_default.json")
    rc = run([sys.executable, "scripts/quality_harness.py", qjson],
             {}, qlog, QUALITY_TIMEOUT)
    f0 = harness_fscore(qjson)
    log(f"quality default: rc={rc} fscore={f0}")

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
        if not ok:
            continue
        # F-score leg: the winner must hold the default's quality
        qlog = os.path.join(out, f"quality_{name}.log")
        qjson = os.path.join(out, f"quality_{name}.json")
        rc = run([sys.executable, "scripts/quality_harness.py", qjson],
                 CONFIGS[name], qlog, QUALITY_TIMEOUT)
        fN = harness_fscore(qjson)
        log(f"quality {name}: rc={rc} fscore={fN} (default {f0})")
        if f0 is not None and fN is not None and fN < f0 - 0.01:
            log(f"{name} REJECTED: F-score {fN:.4f} < default-1% "
                f"({f0 - 0.01:.4f})")
            continue
        winner = (name, v)
        break

    if winner:
        name, v = winner
        env_json = os.path.join(REPO, "BENCH_ENV.json")
        json.dump({"env": CONFIGS[name], "config": name,
                   "value": v, "default_value": v0,
                   "decided": time.strftime("%Y-%m-%d %H:%M:%S")},
                  open(env_json, "w"), indent=1)
        log(f"WINNER {name} ({v:.3f} vs default {v0:.3f}) -> BENCH_ENV.json")
    else:
        log(f"no config beat default+gates+quality; default stays ({v0:.3f})")
    json.dump(results, open(os.path.join(out, "bench_results.json"), "w"),
              indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
