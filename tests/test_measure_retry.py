"""Validate tools/round4_measure.sh's bounded liveness-retry loop
against a SIMULATED dead backend (VERDICT r3 item 6: "retry loop
validated against a simulated dead backend").

The script probes the device by launching ``$MPSNERF_MEASURE_PY -u -c
...`` detached; we substitute a stub interpreter that (a) fails fast
like the 2026-08-18 UNAVAILABLE mode, (b) hangs like the 2026-08-17
wedge, or (c) succeeds — on a schedule keyed by an attempt counter
file.  Timing knobs shrink the loop's minutes to fractions of a second.
No real device is touched and nothing is killed.
"""

import os
import stat
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "tools", "round4_measure.sh")

with open(SCRIPT) as _f:
    # the batch grows as probes are added; count stages instead of
    # hardcoding (a stale count made this suite fail when the serve
    # probe landed)
    N_STAGES = sum(
        line.startswith("run_stage ") for line in _f.read().splitlines()
    )


def _write_stub(tmp_path, body: str) -> str:
    """A fake ``python`` whose behavior depends on the attempt count."""
    stub = tmp_path / "fakepython"
    stub.write_text(
        "#!/bin/bash\n"
        f"MARK_DIR={tmp_path}\n"
        f"COUNT_FILE={tmp_path}/attempts\n"
        "N=$(cat $COUNT_FILE 2>/dev/null || echo 0)\n"
        "N=$((N+1)); echo $N > $COUNT_FILE\n" + body
    )
    stub.chmod(stub.stat().st_mode | stat.S_IEXEC)
    return str(stub)


def _run(stub: str, tmp_path, retry_hours="1", extra_env=None):
    env = dict(
        os.environ,
        MPSNERF_MEASURE_PY=stub,
        MPSNERF_MEASURE_CWD=str(tmp_path),
        MPSNERF_MEASURE_RETRY_HOURS=retry_hours,
        MPSNERF_MEASURE_POLL_S="0.1",
        MPSNERF_MEASURE_POLL_N="5",
        MPSNERF_MEASURE_RETRY_SLEEP="0.2",
        MPSNERF_MEASURE_WEDGE_POLL_N="10",
        MPSNERF_MEASURE_LIVENESS_ONLY="1",
        MPSNERF_MEASURE_MARK_DIR=str(tmp_path),
    )
    env.update(extra_env or {})
    return subprocess.run(
        ["bash", SCRIPT], env=env, capture_output=True, text=True,
        timeout=120,
    )


def test_recovers_from_fast_unavailable(tmp_path):
    """Two fast-error attempts (mode 2), then the device comes back."""
    stub = _write_stub(
        tmp_path,
        'if [ "$N" -lt 3 ]; then\n'
        "  # the real probe's inline python writes the error marker; the\n"
        "  # stub stands in for the whole interpreter, so it writes it\n"
        '  echo "UNAVAILABLE: TPU backend setup/compile error" > $MARK_DIR/r4m_err\n'
        "  exit 1\n"
        "fi\n"
        'echo "alive: 28.0"\n'
        "touch $MARK_DIR/r4m_alive\n"
        "exit 0\n",
    )
    r = _run(stub, tmp_path)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "device UNAVAILABLE" in r.stdout
    assert "device LIVE" in r.stdout
    assert int((tmp_path / "attempts").read_text()) == 3


def test_recovers_from_wedge_style_hang(tmp_path):
    """First probe hangs silently (mode 1, never killed); while the
    script waits on it, the 'terminal reset' arrives (the hung probe
    finally completes and writes the marker)."""
    stub = _write_stub(
        tmp_path,
        'if [ "$N" -eq 1 ]; then\n'
        "  sleep 2   # wedge: silent, no error file\n"
        '  echo "alive: 28.0"\n'
        "  touch $MARK_DIR/r4m_alive\n"
        "  exit 0\n"
        "fi\n"
        "sleep 600 &\nexit 0\n",
    )
    r = _run(stub, tmp_path)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "probe HANGING" in r.stdout
    assert "device LIVE" in r.stdout


def test_gives_up_after_window_without_killing(tmp_path):
    """Device never returns: exit 3 after the window, probes left
    alive (the stub records it was never signalled)."""
    stub = _write_stub(
        tmp_path,
        "trap 'echo KILLED >> " + str(tmp_path) + "/signals' TERM INT\n"
        'echo "UNAVAILABLE" >&2\n'
        "exit 1\n",
    )
    # RETRY_HOURS accepts fractions through bash arithmetic? no — use 0
    # hours: deadline == now, loop runs zero full iterations -> dead
    r = _run(stub, tmp_path, retry_hours="0")
    assert r.returncode == 3, r.stdout + r.stderr
    assert "DEVICE DEAD" in r.stdout
    assert not (tmp_path / "signals").exists()


def test_immediate_success_runs_batch_gate(tmp_path):
    stub = _write_stub(
        tmp_path,
        'echo "alive: 28.0"\ntouch $MARK_DIR/r4m_alive\nexit 0\n',
    )
    r = _run(stub, tmp_path)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "device LIVE" in r.stdout


def test_stage_failure_retries_after_reverified_liveness(tmp_path):
    """A stage that fails once (device flap mid-batch, the 2026-08-18
    failure mode) is retried after liveness is re-verified instead of
    burning the rest of the batch.  The stub distinguishes probe calls
    (``-u -c <code>``) from stage calls (``-u <script>``)."""
    stub = _write_stub(
        tmp_path,
        'if [ "$2" = "-c" ]; then\n'
        '  echo "alive: 28.0"\n'
        "  touch $MARK_DIR/r4m_alive\n"
        "  exit 0\n"
        "fi\n"
        f"S={tmp_path}/stage_attempts\n"
        "M=$(cat $S 2>/dev/null || echo 0)\n"
        "M=$((M+1)); echo $M > $S\n"
        'if [ "$M" -eq 1 ]; then exit 3; fi\n'  # first stage call flaps
        "exit 0\n",
    )
    r = _run(stub, tmp_path, extra_env={"MPSNERF_MEASURE_LIVENESS_ONLY": ""})
    assert r.returncode == 0, r.stdout + r.stderr
    assert "FAILED (rc=3)" in r.stdout
    assert "=== done ===" in r.stdout
    # every batch stage + 1 retry of the flapped one
    assert int((tmp_path / "stage_attempts").read_text()) == N_STAGES + 1


def test_stage_failures_are_reported(tmp_path):
    """A stage that fails every attempt is recorded and the batch exits
    nonzero, but the remaining stages still run."""
    stub = _write_stub(
        tmp_path,
        'if [ "$2" = "-c" ]; then\n'
        '  echo "alive: 28.0"\n'
        "  touch $MARK_DIR/r4m_alive\n"
        "  exit 0\n"
        "fi\n"
        f"S={tmp_path}/stage_attempts\n"
        "M=$(cat $S 2>/dev/null || echo 0)\n"
        "M=$((M+1)); echo $M > $S\n"
        'if [ "$M" -le 2 ]; then exit 3; fi\n'  # stage 1 fails both tries
        "exit 0\n",
    )
    r = _run(stub, tmp_path, extra_env={"MPSNERF_MEASURE_LIVENESS_ONLY": ""})
    assert r.returncode == 1, r.stdout + r.stderr
    assert "done WITH FAILURES" in r.stdout
    assert int((tmp_path / "stage_attempts").read_text()) == N_STAGES + 1
