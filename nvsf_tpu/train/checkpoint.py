"""Checkpoint save/load with latest/best rotation.

Mirrors ``nvsf/nerf/utils.py:610-747``: full checkpoints carry optimizer +
EMA + error-map state; ``max_keep_ckpt`` rotation; ``latest``/``best``/
``scratch``/explicit-path resolution; tolerant partial load.
Storage is a pickle of numpy-ified pytrees (same-process-environment loads).
"""

from __future__ import annotations

import glob
import os
import pickle
from typing import Optional

import jax
import numpy as np


def _to_numpy(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(workspace: str, name: str, epoch: int, global_step: int,
                    state: dict, stats: Optional[dict] = None,
                    full: bool = True, best: bool = False,
                    max_keep_ckpt: int = 2, suffix: str = "",
                    unet_trained: bool = False) -> str:
    ckpt_dir = os.path.join(workspace, "checkpoints")
    os.makedirs(ckpt_dir, exist_ok=True)
    payload = {
        "epoch": epoch,
        "global_step": global_step,
        "stats": stats or {},
        "model": _to_numpy(state["params"]),
        "ema": _to_numpy(state.get("ema_params")),
        "unet": _to_numpy(state.get("unet_params")),
        "unet_stats": _to_numpy(state.get("unet_stats")),
        "unet_trained": bool(unet_trained),
    }
    # occupancy grids ride in EVERY checkpoint (incl. best) so a fresh
    # process renders through the TRAINED occupied span, not a fully-
    # occupied re-init. The reference strips density_grid only from best
    # (``utils.py:669-671``) because its test renderer never consumes the
    # grid; this port's occupancy-mode renders do, so best must carry it.
    payload["occ_grid_lidar"] = _to_numpy(state.get("occ_grid_lidar"))
    payload["occ_grid_rgb"] = _to_numpy(state.get("occ_grid_rgb"))
    if full:
        payload["opt_state"] = _to_numpy(state.get("opt_state"))
        payload["error_map"] = _to_numpy(state.get("error_map"))
        payload["error_map_rgb"] = _to_numpy(state.get("error_map_rgb"))
    if best:
        path = os.path.join(ckpt_dir, f"{name}_best.pkl")
    elif suffix:
        path = os.path.join(ckpt_dir, f"{name}_{suffix}.pkl")
    else:
        path = os.path.join(ckpt_dir, f"{name}_ep{epoch:04d}.pkl")
        # rotation (``utils.py:628-637``)
        old = sorted(glob.glob(os.path.join(ckpt_dir, f"{name}_ep*.pkl")))
        while len(old) >= max_keep_ckpt:
            os.remove(old.pop(0))
    with open(path, "wb") as f:
        pickle.dump(payload, f)
    return path


def resolve_checkpoint(workspace: str, name: str, which: str,
                       prefer_refine: bool = False) -> Optional[str]:
    """'scratch' -> None; 'latest'/'best' -> newest matching file; else treat
    as a path (``utils.py:682-703``).

    ``prefer_refine``: test/eval callers with ``use_refine`` set pass True so
    the ``{name}_refine.pkl`` written after the U-Net refine stage
    (``trainer.py:1010-1012`` in the reference) is selected over the plain
    epoch checkpoints — it carries the trained U-Net. Training resume must
    NOT set this (the refine checkpoint has no optimizer state)."""
    if which == "scratch":
        return None
    ckpt_dir = os.path.join(workspace, "checkpoints")
    if prefer_refine and which in ("latest", "latest_model", "best"):
        p = os.path.join(ckpt_dir, f"{name}_refine.pkl")
        if os.path.exists(p):
            # staleness guard: training resumed PAST the refine stage
            # writes newer epoch checkpoints — those carry the user's
            # asked-for params; a pre-resume refine pkl must not shadow
            # them (its U-Net refined an older field)
            newer = [q for q in
                     glob.glob(os.path.join(ckpt_dir, f"{name}_ep*.pkl"))
                     + [os.path.join(ckpt_dir, f"{name}_best.pkl")]
                     if os.path.exists(q)
                     and os.path.getmtime(q) > os.path.getmtime(p)]
            if not newer:
                return p
    if which in ("latest", "latest_model"):
        cands = sorted(glob.glob(os.path.join(ckpt_dir, f"{name}_ep*.pkl")))
        return cands[-1] if cands else None
    if which == "best":
        p = os.path.join(ckpt_dir, f"{name}_best.pkl")
        if os.path.exists(p):
            return p
        cands = sorted(glob.glob(os.path.join(ckpt_dir, f"{name}_ep*.pkl")))
        return cands[-1] if cands else None
    return which if os.path.exists(which) else None


def load_checkpoint(path: str) -> dict:
    with open(path, "rb") as f:
        return pickle.load(f)
