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


def add_distributed_flags(p) -> None:
    """The multi-host bring-up flags shared by the sweep and train CLIs."""
    p.add_argument("--distributed", action="store_true",
                   help="call jax.distributed.initialize() for multi-host pods")
    p.add_argument("--coordinator", default=None,
                   help="coordinator address (host:port); omit on TPU pods "
                        "where cluster discovery is automatic")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)


def initialize_from_flags(args, error) -> None:
    """Bring up jax.distributed from parsed CLI flags (no-op without
    --distributed). `error` reports a usage error (argparse parser.error)."""
    if not getattr(args, "distributed", False):
        return
    kwargs = {}
    if args.coordinator is not None:
        # manual coordinator (non-pod clusters): all three are needed,
        # jax.distributed cannot auto-detect process identity there
        if args.num_processes is None or args.process_id is None:
            error("--coordinator requires --num_processes and --process_id "
                  "(auto-discovery only works on pods; omit all three there)")
        kwargs = dict(coordinator_address=args.coordinator,
                      num_processes=args.num_processes,
                      process_id=args.process_id)
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
