#!/bin/bash
# End-of-round-3 measurement sequence (run after tools/train_synth_tpu.py
# on data/synth_r4 has written its final checkpoint). Each step is
# independent; re-run any that fail. Order = descending priority so a
# wall-clock cutoff loses the least important artifacts.
set -ux
cd "$(dirname "$0")/.."

# 1. Decode-stack ablation table on the converged r4 model (VERDICT items
#    1, 3, 6 — the accuracy evidence).
timeout 3000 python -u tools/eval_ablations.py --root data/synth_r4 \
    --out data/record/ablation_r03.json 2>&1 | tail -30

# 2. un_pnp serving bench with the cov_pixels subsample + chunked pipeline
#    (VERDICT item 5).
timeout 1200 python -u bench.py --batch 64 --un_pnp --iters 8 \
    > BENCH_UN_PNP_r03.json.tmp 2>/dev/null && \
    tail -1 BENCH_UN_PNP_r03.json.tmp > BENCH_UN_PNP_r03.json && \
    rm BENCH_UN_PNP_r03.json.tmp
timeout 1200 python -u bench.py --batch 128 --un_pnp --chunk 32 --iters 8 \
    2>/dev/null | tail -1 > BENCH_UN_PNP_r03_b128c32.json

# 3. Cascade: converged detector + two-stage eval (VERDICT item 4;
#    scenes pre-generated in data/cascade_r3).
timeout 2400 python -u tools/train_cascade_tpu.py --det_epochs 12 \
    --pose_epochs 8 2>&1 | tail -15

# 4. Cascade TPU bench (VERDICT item 4).
timeout 900 python -u bench.py --cascade --iters 8 2>/dev/null \
    | tail -1 > BENCH_CASCADE_r03.json

# 5. Standard-path bench (regression check for BENCH_r03).
timeout 900 python -u bench.py --batch 64 --iters 8 2>/dev/null \
    | tail -1 > BENCH_STD_r03.json

# 6. Virtual-mesh scaling on the now-quiet host (VERDICT item 9).
timeout 3600 python -u tools/make_scaling_record.py --out SCALING_r03.json \
    2>&1 | tail -5
