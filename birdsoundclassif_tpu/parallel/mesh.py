"""Data-parallel scale-out over a 1-D device mesh.

The reference has no live multi-device path (its torch.distributed hooks are
dead code — reference: nets/util/misc.py:363-429, train.py:164-167). The
TPU-native design parallelizes the natural unit: spectrogram windows are
independent by construction, so inference and training shard the batch axis
over ICI with `jax.sharding` and let GSPMD insert the collectives (gradient
psum for training; none needed for inference).

Multi-host: call initialize_distributed() first (jax.distributed), then
make_mesh() over all global devices.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def initialize_distributed(**kwargs) -> None:
    """Multi-host bring-up (coordinator discovery via env on TPU pods)."""
    jax.distributed.initialize(**kwargs)


def make_mesh(devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devices), (DATA_AXIS,))


def shard_data(tree: Any, mesh: Mesh) -> Any:
    """Place a pytree with its leading (batch/window) axis sharded over the
    mesh. Leading dims must be divisible by the mesh size."""
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    return jax.device_put(tree, sharding)


def replicate(tree: Any, mesh: Mesh) -> Any:
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def pad_to_multiple(n: int, k: int) -> int:
    return -(-n // k) * k
