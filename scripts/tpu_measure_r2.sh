#!/bin/bash
# Post-cull/compaction TPU measurement runlist (run when the tunnel is
# healthy — check `ps aux | grep tpu_init` FIRST, see CLAUDE.md).
# Each step perturbs N slightly to dodge poisoned program keys.
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/r2m

echo "== 1. bench (default config, post-cull)"
bash scripts/tpu_run.sh bench.py 100032 2>&1 | tee /tmp/r2m/bench_default.log

echo "== 2. bench M=10/bbox=12 (survivor compaction variant)"
RSGS_BENCH_M=10 RSGS_BENCH_BBOX=12 \
  bash scripts/tpu_run.sh bench.py 100048 2>&1 | tee /tmp/r2m/bench_m10.log

echo "== 3. stage profile (feeds docs/ROOFLINE.md)"
bash scripts/tpu_run.sh scripts/profile_stages.py 100064 256 \
  2>&1 | tee /tmp/r2m/profile.log

echo "== 4. staged-config secondaries (1M step, rollout frame)"
RSGS_BENCH_STAGED=1 \
  bash scripts/tpu_run.sh bench.py 100080 2>&1 | tee /tmp/r2m/bench_staged.log

echo "== 5. quality-feature A/B at TPU scale (512^2)"
AB_RES=512 AB_ITERS=1200 \
  bash scripts/tpu_run.sh scripts/ab_features.py 2>&1 | tee /tmp/r2m/ab512.log

echo "== 6. openbox-views capture-proxy training at 400^2 (real-scan renders)"
OPENBOX_DOWNSCALE=2 OPENBOX_CAPACITY=120000 OPENBOX_ITERS=3000 \
  bash scripts/tpu_run.sh scripts/train_openbox_views.py /tmp/r2m/openbox \
  2>&1 | tee /tmp/r2m/openbox.log

echo "== done; logs in /tmp/r2m/"
