#!/bin/bash
# Run a python job on the (axon-tunneled) TPU with the wedge-recovery
# protocol from CLAUDE.md: health-probe first, retry on watchdog exit 17
# (the job script should install a compile watchdog that exits 17 — see
# scripts/tpu_checks.py for the pattern).
#
# Usage: scripts/tpu_run.sh <job.py> [args...]
set -u
JOB="$1"; shift
RETRIES="${TPU_RUN_RETRIES:-3}"

probe() {
  timeout 110 python -c "
import jax, jax.numpy as jnp
jax.jit(lambda x: (x * 2).sum())(jnp.ones((16, 16))).block_until_ready()
" >/dev/null 2>&1
}

probe || echo "warning: TPU health probe failed" >&2
for i in $(seq 1 "$RETRIES"); do
  # wedges are PROGRAM-KEYED (CLAUDE.md): jobs fold TPU_RUN_ATTEMPT into
  # their static shapes so a retry never resubmits the poisoned program
  TPU_RUN_ATTEMPT="$i" python -u "$JOB" "$@"
  rc=$?
  if [ "$rc" -ne 17 ]; then exit "$rc"; fi
  echo "tpu_run: attempt $i wedged (exit 17); probing + retrying" >&2
  probe
  sleep 5
done
echo "tpu_run: exhausted $RETRIES attempts" >&2
exit 17
