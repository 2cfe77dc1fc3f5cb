"""Checkpointing with latest-in-dir resume semantics.

Behavioral reference: ``/root/reference/run_nerf_batch.py:301-342,606-617``:
checkpoints named by zero-padded global step, the newest one in the
experiment dir is reloaded on startup, and (reference quirk, kept as the
default) the optimizer state is NOT restored — training resumes with a
fresh Adam at the saved step's LR.
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

_STEP_RE = re.compile(r"^(\d{6,})$")


def _ckpt_dir(basedir: str, expname: str) -> str:
    return os.path.join(os.path.abspath(basedir), expname, "checkpoints")


def save_checkpoint(basedir: str, expname: str, step: int, state: Any,
                    is_primary: bool = True) -> Optional[str]:
    """Save the pytree (params/batch_stats/opt_state/step) at ``step``.

    ``is_primary`` mirrors the rank-0 gating (ref run_nerf_batch.py:609);
    under multi-process JAX pass ``jax.process_index() == 0``.
    """
    if not is_primary:
        return None
    path = os.path.join(_ckpt_dir(basedir, expname), f"{step:06d}")
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, jax.device_get(state), force=True)
    return path


def list_checkpoints(basedir: str, expname: str):
    d = _ckpt_dir(basedir, expname)
    if not os.path.isdir(d):
        return []
    steps = sorted(
        int(m.group(1))
        for f in os.listdir(d)
        if (m := _STEP_RE.match(f))
    )
    return [(s, os.path.join(d, f"{s:06d}")) for s in steps]


def restore_latest(
    basedir: str, expname: str, target: Any = None
) -> Tuple[int, Optional[Any]]:
    """Restore the newest checkpoint; returns ``(step, state | None)``."""
    ckpts = list_checkpoints(basedir, expname)
    if not ckpts:
        return 0, None
    step, path = ckpts[-1]
    ckptr = ocp.PyTreeCheckpointer()
    if target is not None:
        restored = ckptr.restore(path, item=jax.device_get(target))
    else:
        restored = ckptr.restore(path)
    return step, restored
