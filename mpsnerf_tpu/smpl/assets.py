"""SMPL asset loading with gender selection.

Behavioral reference: ``/root/reference/lib/skinnning_batch.py:123-129`` —
three pickled rigs (male/female/neutral) loaded from ``assets/``; the
forward selects by the item's gender flag (1=male, 0=female, 2=neutral;
``skinnning_batch.py:335-340``).

The pickle files are licensed SMPL artifacts the user must provide; when
absent (e.g. CI), a deterministic synthetic rig stands in so the pipeline
stays runnable end-to-end.
"""

from __future__ import annotations

import os
import warnings
from typing import Dict

from mpsnerf_tpu.smpl.model import SMPLModel, load_smpl_pickle, synthetic_smpl

_ASSET_FILES = {
    1: "basicmodel_m_lbs_10_207_0_v1.0.0.pkl",
    0: "basicmodel_f_lbs_10_207_0_v1.0.0.pkl",
    2: "SMPL_NEUTRAL.pkl",
}


def load_smpl_models(assets_dir: str = "assets") -> Dict[int, SMPLModel]:
    """gender flag -> rig.  Falls back to a synthetic rig per gender."""
    out: Dict[int, SMPLModel] = {}
    for gender, fname in _ASSET_FILES.items():
        path = os.path.join(assets_dir, fname)
        if os.path.exists(path):
            out[gender] = load_smpl_pickle(path)
        else:
            warnings.warn(
                f"SMPL asset {path} not found — using a synthetic rig "
                "(provide the official SMPL pickles for real data)."
            )
            out[gender] = synthetic_smpl(seed=gender)
    return out
