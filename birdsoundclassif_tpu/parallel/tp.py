"""Tensor-parallel scale-out over a 2-D (data, model) device mesh.

The reference's only parallelism hook is dead torch.distributed DP code
(reference: nets/util/misc.py:363-429, train.py:164-167). Data parallelism
over windows (parallel/mesh.py) is the natural first axis; this module adds
the second: Megatron-style channel sharding of the big conv/dense kernels
over a `model` mesh axis, expressed purely as `jax.sharding` annotations.
GSPMD propagates the layouts through the two-stage detector and inserts the
ICI collectives (all-gather / reduce-scatter on the channel contractions,
psum on the data-parallel gradient reduction) — no hand-written comms.

Why this shape: the flagship's FLOPs live in 3x3 convs with 256-2048
output channels and the RCNN/attention dense layers. Sharding the trailing
(output-channel) axis of those kernels — and the matching slots of the
optimizer moments — cuts per-device weight+moment memory and weight-side
FLOPs by the tp factor while staying mathematically identical (sharding is
layout, not semantics). Pipeline/sequence/expert parallelism have no
counterpart in this model family: the network is a short conv trunk, the
sequence axis is folded into windows at the data layer (SURVEY §2.3), and
there are no experts.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS

MODEL_AXIS = "model"


def make_mesh_2d(
    devices: Optional[Sequence[jax.Device]] = None, model_parallel: int = 2
) -> Mesh:
    """(data, model) mesh: n_devices/model_parallel x model_parallel.

    On real slices, keep `model_parallel` within a torus dimension so the
    channel collectives ride nearest-neighbour ICI.
    """
    devices = np.array(list(devices) if devices is not None else jax.devices())
    if len(devices) % model_parallel:
        raise ValueError(
            f"{len(devices)} devices not divisible by model_parallel={model_parallel}"
        )
    grid = devices.reshape(len(devices) // model_parallel, model_parallel)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def leaf_partition_spec(leaf: Any, tp: int, min_channels: int = 128) -> P:
    """Sharding rule for one parameter/moment leaf.

    Kernels (ndim >= 2) with a trailing channel axis that is divisible by
    tp and at least `min_channels` wide are sharded on that axis; everything
    else (biases, BN vectors, scalars, small heads) is replicated — they are
    a negligible fraction of the bytes and replicating them avoids
    pathological layouts for the elementwise ops that consume them.
    """
    shape = tuple(getattr(leaf, "shape", ()))
    if (
        len(shape) >= 2
        and shape[-1] >= min_channels
        and shape[-1] % tp == 0
        and int(np.prod(shape)) >= 1 << 14
    ):
        return P(*([None] * (len(shape) - 1) + [MODEL_AXIS]))
    return P()


def tree_partition_specs(tree: Any, mesh: Mesh, min_channels: int = 128) -> Any:
    """PartitionSpec pytree for a params / TrainState / optimizer tree.

    Works on any pytree whose leaves are arrays (optax moments mirror the
    param shapes, so the same rule lands them next to their params).
    """
    tp = mesh.shape[MODEL_AXIS]
    return jax.tree_util.tree_map(lambda l: leaf_partition_spec(l, tp, min_channels), tree)


def shard_tree(tree: Any, mesh: Mesh, min_channels: int = 128) -> Any:
    """device_put a params/state tree with channel-sharded kernels.

    Multi-host: host data cannot be device_put onto non-addressable
    devices; every process holds the same full tree (same init seed /
    same checkpoint files), so each device slices its shard locally."""
    specs = tree_partition_specs(tree, mesh, min_channels)
    shardings = jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), specs,
        is_leaf=lambda x: isinstance(x, P))
    if jax.process_count() == 1:
        return jax.device_put(tree, shardings)

    def leaf(x, sh):
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])

    return jax.tree_util.tree_map(leaf, tree, shardings)


def shard_batch_2d(tree: Any, mesh: Mesh) -> Any:
    """Batch leaves: leading axis over `data`, replicated over `model`.

    Multi-host: when the mesh spans devices this process cannot address,
    device_put of host data is illegal; every process holds the same full
    global batch (the loaders are seeded identically), and each device
    fetches its own slice via make_array_from_callback."""
    sh = NamedSharding(mesh, P(DATA_AXIS))
    if jax.process_count() == 1:
        return jax.device_put(tree, sh)

    def leaf(x):
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])

    return jax.tree_util.tree_map(leaf, tree)
