#!/bin/bash
# Post-training round-4 sequence: runs the moment the flagship campaign
# completes, keeping the chip saturated stage to stage. Ordered so the
# highest-information artifacts land first if the round clock cuts it off:
# ablation table -> serving/perf benches -> multiclass campaign (its record
# writes incrementally per class).
set -u
cd "$(dirname "$0")/.."
LOG="data/logs/round4_finish.log"
: > "$LOG"
note() { echo "=== $1 ($(date +%H:%M:%S)) ===" | tee -a "$LOG"; }

bench_to() { # bench_to <outfile> <args...>
  local out="$1"; shift
  timeout 1500 python -u bench.py "$@" > "$out.tmp" 2>> "$LOG" \
    && tail -1 "$out.tmp" > "$out" && rm -f "$out.tmp"
}

note "ablation_r04"
# the r4-relevant rows (trunc / ICP-gate / domain / serving fast path +
# headline anchors); the fg 4-way and pixel-budget variants were measured
# in ablation_r03 on an unchanged decode
timeout 3600 python -u tools/eval_ablations.py --root data/synth_r4 \
  --only standard_128px,un_pnp_8192px,un_pnp_reuse,un_pnp_serving_r4,domain_standard,domain_unpnp,occ_standard,occ_unpnp_rounds20,occ_unpnp_reuse,trunc_standard,trunc_projective,un_pnp_icp,unpnp_icp_gated,occ_unpnp_icp,occ_unpnp_icp_gated \
  --out data/record/ablation_r04.json >> "$LOG" 2>&1

note "voting stage profile"
timeout 1200 python -u tools/profile_voting_stages.py --batch 64 \
  >> "$LOG" 2>&1

note "bench un_pnp b64"
bench_to BENCH_UN_PNP_r04.json --un_pnp --batch 64 --iters 12
note "bench un_pnp serving (cov_reuse+approx_fg) b64"
bench_to BENCH_UN_PNP_r04_serving.json --un_pnp --batch 64 --iters 12 \
  --cov_reuse --approx_fg
note "bench un_pnp b128 chunk64"
bench_to BENCH_UN_PNP_r04_b128c64.json --un_pnp --batch 128 --chunk 64 \
  --iters 8
note "bench standard b128"
bench_to BENCH_r04_standard.json --batch 128 --iters 12

note "multiclass campaign"
timeout 7200 python -u tools/train_multiclass_tpu.py --steps 16000 \
  >> "$LOG" 2>&1

note "multiclass iso-noise ceilings"
timeout 1800 python -u tools/multiclass_ceiling.py \
  --record data/record/multiclass_r04.json >> "$LOG" 2>&1

note "done"
