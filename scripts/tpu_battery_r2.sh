#!/bin/bash
# Trimmed, reprioritized TPU battery for the end of round 2 (single chip,
# sequential).  Order: judge-critical pipeline gates first, then the bench
# A/Bs + matching gate checks that decide BENCH_ENV.json, then kernel/refine
# parity.  Each step logs to $OUT; the decision step at the end mirrors
# scripts/tpu_validation.sh step 6.
set -u
cd /root/repo
OUT=${1:-/tmp/tpu_battery_r2}
mkdir -p "$OUT"
log() { echo "=== $(date +%H:%M:%S) $*" | tee -a "$OUT/summary.log"; }

log "1. default full-pipeline gates (judge's command)"
OMVS_RUN_PIPELINE_TEST=1 timeout 1800 python -m pytest \
  tests/test_pipeline_full.py::test_full_pipeline_thresholds -q \
  > "$OUT/1_pipeline_default.log" 2>&1
log "   rc=$? ($(tail -1 "$OUT/1_pipeline_default.log"))"

log "5. bench.py (default path)"
timeout 1800 python bench.py > "$OUT/5_bench.log" 2>&1
log "   rc=$? ($(tail -1 "$OUT/5_bench.log"))"

log "5d. bench.py with OMVS_COMPACT=1"
OMVS_COMPACT=1 timeout 1800 python bench.py > "$OUT/5d_bench_compact.log" 2>&1
log "   rc=$? ($(tail -1 "$OUT/5d_bench_compact.log"))"

log "4g. gate counts, parity compaction (OMVS_COMPACT=1)"
OMVS_COMPACT=1 timeout 2400 python scripts/dev_gate_counts.py compact \
  > "$OUT/4g_compact.log" 2>&1
log "   rc=$? ($(grep RESULT "$OUT/4g_compact.log" | tail -1))"

log "5b. bench.py with OMVS_GEOM_SPLIT=1"
OMVS_GEOM_SPLIT=1 timeout 1800 python bench.py > "$OUT/5b_bench_split.log" 2>&1
log "   rc=$? ($(tail -1 "$OUT/5b_bench_split.log"))"

log "5e. bench.py with OMVS_COMPACT=1 OMVS_GEOM_SPLIT=1"
OMVS_COMPACT=1 OMVS_GEOM_SPLIT=1 timeout 1800 python bench.py \
  > "$OUT/5e_bench_compact_split.log" 2>&1
log "   rc=$? ($(tail -1 "$OUT/5e_bench_compact_split.log"))"

log "4h. gate counts, compaction + split-kernel combo"
OMVS_COMPACT=1 OMVS_GEOM_SPLIT=1 timeout 2400 \
  python scripts/dev_gate_counts.py compactsplit \
  > "$OUT/4h_compact_split.log" 2>&1
log "   rc=$? ($(grep RESULT "$OUT/4h_compact_split.log" | tail -1))"

log "4. gate counts, split kernel (OMVS_GEOM_SPLIT=1)"
OMVS_GEOM_SPLIT=1 timeout 2400 python scripts/dev_gate_counts.py splitkernel \
  > "$OUT/4_split_kernel.log" 2>&1
log "   rc=$? ($(grep RESULT "$OUT/4_split_kernel.log" | tail -1))"

log "2. pm-kernel parity on TPU incl. 480x640"
timeout 1200 python -m pytest tests/test_pm_kernel.py -q \
  > "$OUT/2_pm_kernel.log" 2>&1
log "   rc=$? ($(tail -1 "$OUT/2_pm_kernel.log"))"

log "5c. bench.py with OMVS_GEOM_FUSED=1"
OMVS_GEOM_FUSED=1 timeout 1800 python bench.py > "$OUT/5c_bench_fused.log" 2>&1
log "   rc=$? ($(tail -1 "$OUT/5c_bench_fused.log"))"

log "4b. gate counts, MERGED scoring+geom kernel (OMVS_GEOM_FUSED=1)"
OMVS_GEOM_FUSED=1 timeout 2400 python scripts/dev_gate_counts.py geomfused \
  > "$OUT/4b_geom_fused.log" 2>&1
log "   rc=$? ($(grep RESULT "$OUT/4b_geom_fused.log" | tail -1))"

log "2b. refine on TPU: manual-grad parity + e2e convergence"
OMVS_RUN_PIPELINE_TEST=1 timeout 2400 python -m pytest \
  tests/test_refine_grad.py tests/test_refine_e2e.py -q \
  > "$OUT/2b_refine_tpu.log" 2>&1
log "   rc=$? ($(tail -1 "$OUT/2b_refine_tpu.log"))"

log "6. decide BENCH_ENV.json from the A/B results"
python - "$OUT" <<'PYEOF' 2>&1 | tee -a "$OUT/summary.log"
import json, os, re, sys
out = sys.argv[1]

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
    return pts >= 200_000 and raw >= 75_000 and 35_000 <= clean <= 45_000

v0 = bench_value(os.path.join(out, "5_bench.log"))
cands = [
    ("5b_bench_split.log", "4_split_kernel.log", {"OMVS_GEOM_SPLIT": "1"}),
    ("5c_bench_fused.log", "4b_geom_fused.log", {"OMVS_GEOM_FUSED": "1"}),
    ("5d_bench_compact.log", "4g_compact.log", {"OMVS_COMPACT": "1"}),
    ("5e_bench_compact_split.log", "4h_compact_split.log",
     {"OMVS_COMPACT": "1", "OMVS_GEOM_SPLIT": "1"}),
]
best_v, best_env = v0, None
for blog, glog, env in cands:
    v = bench_value(os.path.join(out, blog))
    ok = gate(os.path.join(out, glog))
    print(f"{env}: bench={v} gates ok={ok}")
    if v and ok and best_v and v > best_v * 1.05:
        best_v, best_env = v, env
print(f"bench default={v0} best={best_v}")
if best_env:
    best_env["_basis"] = f"battery: {best_v:.3f} vs default {v0:.3f} dm/s, gates ok"
    with open("/root/repo/BENCH_ENV.json", "w") as f:
        json.dump(best_env, f, indent=1)
    print(f"wrote BENCH_ENV.json: {best_env}")
else:
    print("keeping default bench config")
PYEOF

log "DONE"
