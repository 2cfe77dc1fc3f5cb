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
#  * the tunnel FLAPS (observed 2026-08-18: alive 13:52 and 14:29,
#    hanging/unavailable in between) — so liveness is re-verified
#    BEFORE EVERY STAGE and a failed stage is retried after the next
#    alive window instead of burning the rest of the batch.
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
STAGE_TRIES="${MPSNERF_MEASURE_STAGE_TRIES:-2}"     # attempts per stage
MARK="${MPSNERF_MEASURE_MARK_DIR:-/tmp}"            # probe marker files
#   (tests isolate markers here so a LIVE measure loop and the pytest
#    simulation never race on the same /tmp/r4m_* files)
DEADLINE=$(( $(date +%s) + RETRY_HOURS * 3600 ))

probe_alive() {  # launches one detached probe; returns via marker files
  rm -f $MARK/r4m_alive $MARK/r4m_err
  ( $PY -c "
import sys
try:
    import numpy as np, jax, jax.numpy as jnp
    print('alive:', np.asarray(jnp.sum(jnp.arange(8.0))))
    open('$MARK/r4m_alive', 'w').write('1')
except Exception as e:
    open('$MARK/r4m_err', 'w').write(repr(e))
    raise
" >> $MARK/r4m_probe.log 2>&1 & )
}

wait_alive() {  # blocks until a FRESH probe succeeds or the deadline; rc 0/3
  while [ "$(date +%s)" -lt "$DEADLINE" ]; do
    probe_alive
    for _ in $(seq "$POLL_N"); do
      [ -f $MARK/r4m_alive ] || [ -f $MARK/r4m_err ] && break
      sleep "$POLL_S"
    done
    if [ -f $MARK/r4m_alive ]; then return 0; fi
    if [ -f $MARK/r4m_err ]; then
      echo "$(date -u +%H:%M:%S) device UNAVAILABLE ($(head -c 120 $MARK/r4m_err)); retrying in ${RETRY_SLEEP}s"
      sleep "$RETRY_SLEEP"
    else
      # silent hang: likely a wedge — leave the probe pending (it doubles
      # as the claim-waiter) and wait a longer beat before checking again
      echo "$(date -u +%H:%M:%S) probe HANGING (possible wedge) — extended wait, probe left alive"
      for _ in $(seq "$WEDGE_POLL_N"); do
        [ -f $MARK/r4m_alive ] && break
        sleep "$POLL_S"
      done
      [ -f $MARK/r4m_alive ] && return 0
    fi
  done
  return 3
}

FAILED_STAGES=""
run_stage() {  # run_stage <name> <cmd...>: liveness-gate + bounded retry
  local name="$1"; shift
  local try=1
  while [ "$try" -le "$STAGE_TRIES" ]; do
    echo "=== $name (attempt $try) ==="
    if ! wait_alive; then
      echo "DEADLINE before '$name' — skipping remaining attempts"
      FAILED_STAGES="$FAILED_STAGES $name(deadline)"
      return 3
    fi
    echo "$(date -u +%H:%M:%S) device LIVE — running: $*"
    "$@"
    local rc=$?
    [ "$rc" -eq 0 ] && return 0
    echo "$(date -u +%H:%M:%S) stage '$name' FAILED (rc=$rc) — device flap? re-verifying liveness"
    try=$(( try + 1 ))
  done
  FAILED_STAGES="$FAILED_STAGES $name"
  return 1
}

echo "=== liveness (retry up to ${RETRY_HOURS}h; probes never killed) ==="
if ! wait_alive; then
  echo "DEVICE DEAD after ${RETRY_HOURS}h of retries — aborting (probes left waiting, NOT killed)"
  exit 3
fi
echo "device LIVE — starting batch"
[ -n "${MPSNERF_MEASURE_LIVENESS_ONLY:-}" ] && exit 0

run_stage "bench: default (LBS fused table + transformer out_views)" \
  $PY bench.py

run_stage "bench: fp32 row for BASELINE.md" \
  env MPSNERF_BENCH_DTYPE=float32 MPSNERF_BENCH_TRAIN=0 $PY bench.py

run_stage "bench: cull-off row for BASELINE.md" \
  env MPSNERF_BENCH_CULL=0 MPSNERF_BENCH_TRAIN=0 $PY bench.py

run_stage "tail stage attribution" \
  env PYTHONPATH=/root/repo:/root/.axon_site $PY tools/tail_stage_probe.py

run_stage "plan formulations" \
  env PYTHONPATH=/root/repo:/root/.axon_site $PY tools/plan_probe.py

run_stage "eval latency artifact (sequential + pipelined)" \
  env PYTHONPATH=/root/repo:/root/.axon_site $PY tools/eval_latency_probe.py

run_stage "serving latency artifact (export + direct + HTTP + eval ref)" \
  env PYTHONPATH=/root/repo:/root/.axon_site $PY tools/serve_latency_probe.py

if [ -n "$FAILED_STAGES" ]; then
  echo "=== done WITH FAILURES:$FAILED_STAGES ==="
  exit 1
fi
echo "=== done ==="
