#!/bin/bash
# Round-3 measurement batch — run when the tunneled chip is live.
# Everything unbuffered; NOTHING here kills a device-holding process
# (a timeout-kill mid-claim wedged the tunnel on 2026-08-17).
#
#   cd /root/repo && bash tools/round3_measure.sh 2>&1 | tee /tmp/r3_measure.log
set -u
cd /root/repo
PY="python -u"

echo "=== liveness (bail if the tunnel is wedged) ==="
# NEVER timeout-kill the probe: SIGTERM mid-claim is exactly what
# wedged the tunnel on 2026-08-17.  Run it in the background, poll for
# its completion marker, and on deadline just LEAVE it waiting (a
# claim-waiter releases naturally when it eventually completes or the
# tunnel is reset) and abort the batch.
rm -f /tmp/r3_alive
( $PY -c "
import numpy as np, jax, jax.numpy as jnp
print('alive:', np.asarray(jnp.sum(jnp.arange(8.0))))
open('/tmp/r3_alive', 'w').write('1')" & )
for _ in $(seq 60); do
  [ -f /tmp/r3_alive ] && break
  sleep 5
done
[ -f /tmp/r3_alive ] || {
  echo "DEVICE DEAD — aborting (probe left waiting, NOT killed)"; exit 3; }

echo "=== bench: default (LBS fused table + transformer out_views) ==="
$PY bench.py

echo "=== bench: fp32 / cull-off rows for BASELINE.md ==="
MPSNERF_BENCH_DTYPE=float32 MPSNERF_BENCH_TRAIN=0 $PY bench.py
MPSNERF_BENCH_CULL=0 MPSNERF_BENCH_TRAIN=0 $PY bench.py

echo "=== tail stage attribution ==="
PYTHONPATH=/root/repo:/root/.axon_site $PY tools/tail_stage_probe.py

echo "=== block-gather rates ==="
PYTHONPATH=/root/repo:/root/.axon_site $PY tools/block_gather_probe.py

echo "=== plan formulations ==="
PYTHONPATH=/root/repo:/root/.axon_site $PY tools/plan_probe.py

echo "=== eval latency artifact (sequential + pipelined) ==="
PYTHONPATH=/root/repo:/root/.axon_site $PY tools/eval_latency_probe.py

echo "=== done ==="
