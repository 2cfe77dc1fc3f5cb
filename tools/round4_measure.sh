#!/bin/bash
# Round-4 measurement batch — runs when the tunneled chip is live, and
# WAITS (bounded) for it to come back when it isn't, so a transient
# outage doesn't zero the round's artifacts the way round 3's did.
#
#   cd /root/repo && bash tools/round4_measure.sh 2>&1 | tee /tmp/r4_measure.log
#
# Discipline (see tools/WEDGE_RUNBOOK.md):
#  * NOTHING here kills a device-holding process — a timeout-kill
#    mid-claim wedged the tunnel on 2026-08-17 for 7+ hours.
#  * the liveness probe runs detached and is LEFT WAITING on deadline;
#    a claim-waiter releases naturally.
#  * two failure modes are distinguished: a fast "UNAVAILABLE" error
#    (terminal down — cheap to re-probe) and a silent hang (wedge —
#    probe stays pending, do not stack more than one).
set -u
cd "${MPSNERF_MEASURE_CWD:-/root/repo}"
PY="${MPSNERF_MEASURE_PY:-python} -u"
RETRY_HOURS="${MPSNERF_MEASURE_RETRY_HOURS:-6}"
# timing knobs exist so tests/test_measure_retry.py can validate the
# loop against a simulated dead backend in seconds
POLL_S="${MPSNERF_MEASURE_POLL_S:-5}"        # marker poll interval
POLL_N="${MPSNERF_MEASURE_POLL_N:-60}"       # polls per probe (~5 min)
RETRY_SLEEP="${MPSNERF_MEASURE_RETRY_SLEEP:-600}"   # after fast error
WEDGE_POLL_N="${MPSNERF_MEASURE_WEDGE_POLL_N:-240}" # extra wait on hang
DEADLINE=$(( $(date +%s) + RETRY_HOURS * 3600 ))

probe_alive() {  # launches one detached probe; returns via marker files
  rm -f /tmp/r4m_alive /tmp/r4m_err
  ( $PY -c "
import sys
try:
    import numpy as np, jax, jax.numpy as jnp
    print('alive:', np.asarray(jnp.sum(jnp.arange(8.0))))
    open('/tmp/r4m_alive', 'w').write('1')
except Exception as e:
    open('/tmp/r4m_err', 'w').write(repr(e))
    raise
" >> /tmp/r4m_probe.log 2>&1 & )
}

echo "=== liveness (retry up to ${RETRY_HOURS}h; probes never killed) ==="
ALIVE=0
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  probe_alive
  for _ in $(seq "$POLL_N"); do
    [ -f /tmp/r4m_alive ] || [ -f /tmp/r4m_err ] && break
    sleep "$POLL_S"
  done
  if [ -f /tmp/r4m_alive ]; then ALIVE=1; break; fi
  if [ -f /tmp/r4m_err ]; then
    echo "$(date -u +%H:%M:%S) device UNAVAILABLE ($(head -c 120 /tmp/r4m_err)); retrying in ${RETRY_SLEEP}s"
    sleep "$RETRY_SLEEP"
  else
    # silent hang: likely a wedge — leave the probe pending (it doubles
    # as the claim-waiter) and wait a longer beat before checking again
    echo "$(date -u +%H:%M:%S) probe HANGING (possible wedge) — extended wait, probe left alive"
    for _ in $(seq "$WEDGE_POLL_N"); do
      [ -f /tmp/r4m_alive ] && break
      sleep "$POLL_S"
    done
    [ -f /tmp/r4m_alive ] && { ALIVE=1; break; }
  fi
done
[ "$ALIVE" = 1 ] || {
  echo "DEVICE DEAD after ${RETRY_HOURS}h of retries — aborting (probes left waiting, NOT killed)"
  exit 3
}
echo "device LIVE — starting batch"
[ -n "${MPSNERF_MEASURE_LIVENESS_ONLY:-}" ] && exit 0

echo "=== bench: default (LBS fused table + transformer out_views) ==="
$PY bench.py

echo "=== bench: two-level plan A/B ==="
MPSNERF_BENCH_PLAN2L=0.5 MPSNERF_BENCH_TRAIN=0 $PY bench.py

echo "=== bench: host-DDA candidate mask A/B ==="
MPSNERF_BENCH_HOSTDDA=1 MPSNERF_BENCH_TRAIN=0 $PY bench.py

echo "=== bench: fp32 / cull-off rows for BASELINE.md ==="
MPSNERF_BENCH_DTYPE=float32 MPSNERF_BENCH_TRAIN=0 $PY bench.py
MPSNERF_BENCH_CULL=0 MPSNERF_BENCH_TRAIN=0 $PY bench.py

echo "=== tail stage attribution ==="
PYTHONPATH=/root/repo:/root/.axon_site $PY tools/tail_stage_probe.py

echo "=== block-gather rates (two-level plan go/no-go detail) ==="
PYTHONPATH=/root/repo:/root/.axon_site $PY tools/block_gather_probe.py

echo "=== plan formulations ==="
PYTHONPATH=/root/repo:/root/.axon_site $PY tools/plan_probe.py

echo "=== eval latency artifact (sequential + pipelined) ==="
PYTHONPATH=/root/repo:/root/.axon_site $PY tools/eval_latency_probe.py

echo "=== done ==="
