#!/usr/bin/env python
"""Round-4 follow-up battery: combos the main battery didn't cover.

The r4 main battery measured compact=1.004, ee=1.001, hoist25=0.978 vs
default 0.849 — compaction (checkerboard half-lattice scoring), early-exit
(adaptive sweep count), and band-hoisting attack DIFFERENT costs, so the
untested combinations are the remaining headroom.  Reuses the main
battery's gate/quality machinery.

Usage: python scripts/tpu_battery_r4b.py [OUT_DIR]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import tpu_battery_r4 as base

CONFIGS = {
    "compact_ee": {"OMVS_COMPACT": "1", "OMVS_EARLY_EXIT": "1"},
    "compact_hoist25_ee": {"OMVS_COMPACT": "1", "OMVS_HOIST": "1",
                           "OMVS_TEXEL_CHUNK": "25",
                           "OMVS_EARLY_EXIT": "1"},
    "compact_ee_anneal": {"OMVS_COMPACT": "1", "OMVS_EARLY_EXIT": "1",
                          "OMVS_ANNEAL": "1"},
}


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpu_battery_r4b"
    os.makedirs(out, exist_ok=True)
    summary = open(os.path.join(out, "summary.log"), "a")

    def log(msg):
        line = f"=== {time.strftime('%H:%M:%S')} {msg}"
        print(line, flush=True)
        summary.write(line + "\n")
        summary.flush()

    # current champion from the main battery (if it decided one)
    env_json = os.path.join(base.REPO, "BENCH_ENV.json")
    best_name, best_v = "default", None
    if os.path.exists(env_json):
        j = json.load(open(env_json))
        best_name, best_v = j.get("config", "default"), j.get("value")
        log(f"incumbent: {best_name} ({best_v})")

    results = {}
    for name, env_over in CONFIGS.items():
        lp = os.path.join(out, f"bench_{name}.log")
        env_over = dict(env_over)
        env_over["OMVS_BENCH_REFINE"] = "0"   # headline metric only
        rc = base.run([sys.executable, "bench.py"], env_over, lp,
                      base.BENCH_TIMEOUT)
        v = base.bench_value(lp)
        results[name] = v
        log(f"bench {name}: rc={rc} value={v} env={env_over}")

    ranking = sorted(((v, n) for n, v in results.items() if v is not None),
                     reverse=True)
    log(f"ranking: {[(n, round(v, 3)) for v, n in ranking]}")

    # reference F-score: the main battery's default quality record
    f0 = base.harness_fscore("/tmp/tpu_battery_r4/quality_default.json")
    log(f"default fscore: {f0}")

    for v, name in ranking:
        if best_v is not None and v <= best_v * 1.03:
            log(f"{name} ({v:.3f}) within 3% of incumbent {best_v:.3f} — stop")
            break
        glog = os.path.join(out, f"gate_{name}.log")
        rc = base.run([sys.executable, "scripts/dev_gate_counts.py", name],
                      CONFIGS[name], glog, base.GATE_TIMEOUT)
        ok = base.gate_ok(glog)
        log(f"gates {name}: rc={rc} ok={ok}")
        if not ok:
            continue
        qlog = os.path.join(out, f"quality_{name}.log")
        qjson = os.path.join(out, f"quality_{name}.json")
        rc = base.run([sys.executable, "scripts/quality_harness.py", qjson],
                      CONFIGS[name], qlog, base.QUALITY_TIMEOUT)
        fN = base.harness_fscore(qjson)
        log(f"quality {name}: rc={rc} fscore={fN} (default {f0})")
        if f0 is not None and fN is not None and fN < f0 - 0.01:
            log(f"{name} REJECTED on F-score")
            continue
        json.dump({"env": CONFIGS[name], "config": name,
                   "value": v, "prev": {"config": best_name, "value": best_v},
                   "decided": time.strftime("%Y-%m-%d %H:%M:%S")},
                  open(env_json, "w"), indent=1)
        log(f"WINNER {name} ({v:.3f}) -> BENCH_ENV.json")
        break
    json.dump(results, open(os.path.join(out, "bench_results.json"), "w"),
              indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
