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


def _atomic_savez(path: str, **arrays) -> None:
    """np.savez via a sibling tmp file + os.replace so a crash or SIGKILL
    mid-save can never leave a torn .npz behind (the step-cadence ckpt_last
    overwrite is exactly the crash-resilience path; a torn params.npz there
    makes auto-resume raise and aborts the arm — ADVICE r4 #2)."""
    tmp = path + ".tmp.npz"  # np.savez appends .npz to other suffixes
    np.savez(tmp, **arrays)
    os.replace(tmp, path)


def save_params(model_dir: str, params: Any) -> str:
    os.makedirs(model_dir, exist_ok=True)
    path = os.path.join(model_dir, "params.npz")
    _atomic_savez(path, **_flatten(params))
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
# optimizer state: versioned npz of the optax tree (replaces the round-1
# pickle, which was fragile across optax upgrades). The tree STRUCTURE comes
# from a freshly built `tx.init(params)` target; the file carries only the
# leaves plus a format version, and every leaf is shape/dtype-checked on
# load so a stale or mismatched file fails loudly instead of silently
# resetting Adam moments (reference resume: train.py:190-202).
# ---------------------------------------------------------------------------

OPT_STATE_VERSION = 1


def save_opt_state(path: str, opt_state: Any) -> str:
    leaves = jax.tree_util.tree_leaves(jax.device_get(opt_state))
    arrs = {f"leaf_{i:06d}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    _atomic_savez(path, opt_state_version=np.int64(OPT_STATE_VERSION), **arrs)
    return path


def load_opt_state(path: str, target: Any) -> Any:
    """Restore optimizer state saved by save_opt_state.

    `target` must be a structurally identical tree (i.e. ``tx.init(params)``
    for the same optimizer and params). Raises ValueError on any version,
    leaf-count, shape, or dtype mismatch.
    """
    t_leaves, treedef = jax.tree_util.tree_flatten(target)
    with np.load(path) as z:
        ver = int(z["opt_state_version"])
        if ver != OPT_STATE_VERSION:
            raise ValueError(
                f"optimizer-state format version {ver} != supported {OPT_STATE_VERSION} ({path})"
            )
        keys = sorted(k for k in z.files if k.startswith("leaf_"))
        if len(keys) != len(t_leaves):
            raise ValueError(
                f"optimizer-state leaf count {len(keys)} != expected {len(t_leaves)} "
                f"({path}) — optimizer/config changed since this checkpoint was written"
            )
        leaves = []
        for k, tgt in zip(keys, t_leaves):
            arr = z[k]
            t_arr = np.asarray(tgt)
            if arr.shape != t_arr.shape or arr.dtype != t_arr.dtype:
                raise ValueError(
                    f"optimizer-state leaf {k}: saved {arr.dtype}{arr.shape} != "
                    f"expected {t_arr.dtype}{t_arr.shape} ({path})"
                )
            leaves.append(jnp.asarray(arr))
    return jax.tree_util.tree_unflatten(treedef, leaves)


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
