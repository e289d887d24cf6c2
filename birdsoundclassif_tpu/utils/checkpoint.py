"""Checkpoint save/load for param pytrees + torch-checkpoint conversion.

Formats, by priority at load time (reference load path:
run_detection.py:87-122, nbm_model.py:325-341):
  1. ``params.npz`` — flat slash-joined keys, written by save_params
  2. ``model_chkpt.pt`` — a reference torch checkpoint, converted on the
     fly via models.torch_convert (requires torch in the environment)
Training state (optimizer, scheduler, step counters, split indices) is
handled separately in train/loop.py.
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np


def _flatten(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> Any:
    root: Dict[str, Any] = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(val)

    # all collections in param pytrees are str-keyed dicts by convention
    return root


def save_params(model_dir: str, params: Any) -> str:
    os.makedirs(model_dir, exist_ok=True)
    path = os.path.join(model_dir, "params.npz")
    np.savez(path, **_flatten(params))
    return path


def load_params(model_dir: str, cfg=None) -> Any:
    npz = os.path.join(model_dir, "params.npz")
    if os.path.exists(npz):
        with np.load(npz) as data:
            return _unflatten({k: data[k] for k in data.files})
    orbax_dir = os.path.join(model_dir, "orbax")
    if os.path.isdir(orbax_dir):
        return load_params_orbax(orbax_dir)
    pt = os.path.join(model_dir, "model_chkpt.pt")
    if os.path.exists(pt):
        from ..models.torch_convert import convert_torch_checkpoint

        return convert_torch_checkpoint(pt, cfg)
    raise FileNotFoundError(f"no params.npz, orbax/ or model_chkpt.pt in {model_dir}")


# ---------------------------------------------------------------------------
# orbax backend (multi-host-safe, async-capable) — optional alternative to
# the flat npz; used automatically when an `orbax/` subdir exists
# ---------------------------------------------------------------------------


def save_params_orbax(orbax_dir: str, params: Any) -> str:
    import orbax.checkpoint as ocp

    path = os.path.abspath(orbax_dir)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, params, force=True)
    return path


def load_params_orbax(orbax_dir: str) -> Any:
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(os.path.abspath(orbax_dir))
