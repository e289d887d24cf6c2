"""Greedy NMS as a Pallas TPU kernel.

The XLA formulation (ops/nms.py) runs an N-step fori_loop of tiny vector
kernels — each step pays loop overhead. Here the whole greedy scan is ONE
kernel: boxes live in VMEM as 4 coordinate rows (lane-major), the
suppression row is a VPU broadcast-compare, and the sequential loop runs
on-core. The iteration count is the *valid* count (scalar-prefetched), not
the padded length.

Semantics match ops.nms.greedy_nms_in_order with valid_prefix=True:
iteration in the given order, suppression when IoU >= thresh (+1 width
convention), entries beyond n_valid never kept.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel(iou_thresh: float):
    def kernel(nv_ref, boxes_ref, keep_ref):
        # boxes_ref block: (1, 4, N); keep_ref block: (1, N)
        b_idx = pl.program_id(0)
        nv = nv_ref[b_idx]
        x1 = boxes_ref[0, 0:1, :]
        y1 = boxes_ref[0, 1:2, :]
        x2 = boxes_ref[0, 2:3, :]
        y2 = boxes_ref[0, 3:4, :]
        area = (x2 - x1 + 1.0) * (y2 - y1 + 1.0)
        n = boxes_ref.shape[2]
        col = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
        init = (col < nv).astype(jnp.float32)

        def body(i, keep):
            # Mosaic cannot load a scalar at a dynamic lane offset; masked
            # lane-reduces extract the pivot row instead (cheap on the VPU)
            pivot = (col == i).astype(jnp.float32)
            bx1 = jnp.sum(x1 * pivot)
            by1 = jnp.sum(y1 * pivot)
            bx2 = jnp.sum(x2 * pivot)
            by2 = jnp.sum(y2 * pivot)
            barea = (bx2 - bx1 + 1.0) * (by2 - by1 + 1.0)
            iw = jnp.maximum(jnp.minimum(x2, bx2) - jnp.maximum(x1, bx1) + 1.0, 0.0)
            ih = jnp.maximum(jnp.minimum(y2, by2) - jnp.maximum(y1, by1) + 1.0, 0.0)
            inter = iw * ih
            iou = inter / (area + barea - inter)
            # dynamic_slice of a value is not lowerable on TPU Pallas;
            # a masked reduce reads keep[i] instead
            keep_i = jnp.sum(jnp.where(col == i, keep, 0.0))
            suppress = (iou >= iou_thresh) & (col > i) & (keep_i > 0.0)
            return jnp.where(suppress, 0.0, keep)

        keep_ref[0, 0, :] = jax.lax.fori_loop(0, nv, body, init)[0, :]

    return kernel


@functools.partial(jax.jit, static_argnames=("iou_thresh", "interpret"))
def nms_in_order_pallas(
    boxes: jnp.ndarray,     # (B, N, 4) float32, candidates in greedy order
    n_valid: jnp.ndarray,   # (B,) int32 — entries beyond are padding
    iou_thresh: float,
    interpret: bool = False,
) -> jnp.ndarray:
    """-> keep (B, N) bool. N is padded to a multiple of 128 internally."""
    b, n, _ = boxes.shape
    n_pad = -(-n // 128) * 128
    bt = jnp.transpose(boxes, (0, 2, 1)).astype(jnp.float32)  # (B, 4, N)
    if n_pad != n:
        bt = jnp.pad(bt, ((0, 0), (0, 0), (0, n_pad - n)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 4, n_pad), lambda i, nv: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        # (B, 1, N) output: trailing dims (1, N) match the array, which the
        # TPU block-mapping rules accept
        out_specs=pl.BlockSpec((1, 1, n_pad), lambda i, nv: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    keep = pl.pallas_call(
        _make_kernel(iou_thresh),
        out_shape=jax.ShapeDtypeStruct((b, 1, n_pad), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(n_valid.astype(jnp.int32), bt)
    return keep[:, 0, :n] > 0.0
