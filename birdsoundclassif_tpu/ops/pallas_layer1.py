"""Fused ResNet layer1 bottleneck chain as a single Pallas TPU kernel.

Why this exists: layer1 (3 stride-1 bottlenecks at 64 planes on the 94x256
stride-4 grid) is HBM-bandwidth-bound at spec under XLA — ~83% of its
6.8 ms/batch is unavoidable activation traffic between the per-conv fusion
islands (docs/BENCH.md "layer1 variants closure"). Keeping the whole
3-bottleneck chain VMEM-resident bounds HBM traffic at one input read plus
one output write (~0.5 GB vs ~4.6 GB at B=32), the only remaining lever the
closure identified.

Design (kernel grid = (batch, W tiles), full H per program):
- each program DMAs an overlapping input tile (H, TW + 2*HALO, C_in) from
  HBM (the wrapper pre-pads W by HALO zeros so edge tiles need no special
  case), runs the three bottlenecks entirely in VMEM, and writes the
  (H, TW, 4*planes) output tile through a standard blocked out_spec;
- every conv is expressed as MXU matmuls: the 1x1s contract the channel
  (lane) axis directly; the 3x3 is a partial im2col — a dx-concat along
  channels (static sublane slices, K = 3*planes = 192 fills the 128-lane
  contraction) with an unrolled 3-tap dy accumulation over the outer (H)
  axis. Zero-padding for H happens in-kernel per bottleneck (the pad must
  NOT propagate bias/ReLU values, so pre-padding the input cannot replace
  it);
- dots accumulate in f32 (preferred_element_type), bias + residual adds in
  f32, activations cast back to the storage dtype between convs — the same
  numerics XLA's conv+epilogue fusion produces for bf16 activations.

Scope: stride-1, group-1, 3-block stages (resnet50/101/152 layer1; resnext
has grouped 3x3s and takes the XLA path). BN (frozen or eval-mode live) is
folded into weights/biases at trace time, so the kernel accepts unfolded
trees too. Eval-only: no custom VJP is defined (training keeps the XLA
path, whose remat segmentation depends on per-block jax.checkpoint).

Reference for the composed semantics: layers in nets/backbone.py via
torchvision resnet50 (conv1x1-bn-relu / conv3x3-bn-relu / conv1x1-bn /
+identity / relu), mirrored from models/backbone.py _bottleneck_apply.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.nn import BN_EPS

HALO = 3  # one column per side per 3x3, three bottlenecks deep


def _fold(conv: Dict, bn: Dict) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fold (frozen / eval-mode) BN into the conv weight+bias (f32).

    Identical algebra to models/optimize._fold_pair; idempotent on already
    folded trees (identity BN params)."""
    scale = bn["scale"] * jax.lax.rsqrt(bn["var"] + BN_EPS)
    w = conv["w"] * scale[None, None, None, :]
    b = conv.get("b", jnp.zeros_like(scale)) * scale + bn["bias"] - bn["mean"] * scale
    return w, b


def _prep_weights(blocks: Dict, dtype) -> List[jnp.ndarray]:
    """Flatten the 3 bottlenecks into the kernel's operand list.

    Per block: W1 (Cin,P), b1 (1,P), W2cat (3, 3P, P), b2 (1,P),
    W3 (P,4P), b3 (1,4P); block 0 additionally Wd (Cin,4P), bd (1,4P).
    Weights in the compute dtype, biases in f32.
    """
    ops: List[jnp.ndarray] = []
    for bi in range(3):
        blk = blocks[str(bi)]
        w1, b1 = _fold(blk["conv1"], blk["bn1"])
        w2, b2 = _fold(blk["conv2"], blk["bn2"])
        w3, b3 = _fold(blk["conv3"], blk["bn3"])
        p = w1.shape[-1]
        ops += [
            w1[0, 0].astype(dtype), b1[None, :].astype(jnp.float32),
            # (3, 3, P, P) -> (dy, dx*cin, P): dx-major rows match the
            # kernel's dx-concat order (left tap first)
            w2.reshape(3, 3 * p, p).astype(dtype),
            b2[None, :].astype(jnp.float32),
            w3[0, 0].astype(dtype), b3[None, :].astype(jnp.float32),
        ]
        if bi == 0:
            wd, bd = _fold(blk["downsample"]["conv"], blk["downsample"]["bn"])
            ops += [wd[0, 0].astype(dtype), bd[None, :].astype(jnp.float32)]
    return ops


def _dot(x3, w):
    """(H, Wt, K) @ (K, N) -> (H, Wt, N) f32, contracting the lane axis."""
    return jax.lax.dot_general(
        x3, w, dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _bottleneck(x_t, w1, b1, w2cat, b2, w3, b3, wd=None, bd=None,
                dtype=jnp.bfloat16, col0=None, img_w=None):
    """x_t (H, Wt, Cin) -> (H, Wt-2, 4P); consumes one W halo per side.

    col0/img_w: global image column of tile column 0 and the image width.
    The reference zero-pads each 3x3's *input* (h1), so halo columns that
    lie outside the image must be zeroed after conv1+bias+relu — the
    zero-padded x alone would leak relu(b1) into the border 3x3 taps
    (same subtlety as optimize.fold_init_conv's border term).
    """
    h_dim, wt, _ = x_t.shape
    h1 = jnp.maximum(_dot(x_t, w1) + b1[0], 0.0).astype(dtype)
    if col0 is not None:
        cols = jax.lax.broadcasted_iota(jnp.int32, (1, wt, 1), 1) + col0
        h1 = jnp.where((cols >= 0) & (cols < img_w), h1, 0)
    # zero-pad H for the 3x3 (outer-axis pad; W halos come from the tile)
    h1 = jnp.pad(h1, ((1, 1), (0, 0), (0, 0)))
    # partial im2col over dx: (H+2, Wt-2, 3P), lane-axis concat of the dx
    # shifts; contraction K = 3P fills the 128-wide MXU lanes. The shifts
    # are sublane *rolls* (wrapped columns land beyond wt-3 and are sliced
    # off), not slices: Mosaic cannot concat operands whose non-concat
    # dims carry different sublane offsets ("result/input offset mismatch
    # on non-concat dimension"), and rolls re-normalize the layout.
    cat = jnp.concatenate(
        [h1, jnp.roll(h1, -1, axis=1), jnp.roll(h1, -2, axis=1)], axis=-1
    )[:, 0 : wt - 2]
    h2 = (
        _dot(cat[0:h_dim], w2cat[0])
        + _dot(cat[1 : h_dim + 1], w2cat[1])
        + _dot(cat[2 : h_dim + 2], w2cat[2])
    )
    h2 = jnp.maximum(h2 + b2[0], 0.0).astype(dtype)
    out = _dot(h2, w3) + b3[0]
    sc = x_t[:, 1 : wt - 1]
    if wd is not None:
        sc = _dot(sc, wd) + bd[0]
    else:
        sc = sc.astype(jnp.float32)
    return jnp.maximum(out + sc, 0.0).astype(dtype)


def _kernel(x_ref, *refs, dtype, tw, img_w):
    """refs = 20 weight refs (VMEM), out_ref.

    The input block is the batch image's whole HALO-padded row strip
    (~3 MB at the flagship 94x262x64 bf16) and is indexed only by the
    batch grid dim, so Pallas keeps it resident across the inner W-tile
    programs; each program dynamic-slices its overlapping tile out of
    VMEM (a direct dynamic HBM slice per program was the first design —
    Mosaic cannot lower that memref_slice)."""
    w_refs, out_ref = refs[:20], refs[20]
    wi = pl.program_id(1)
    start = pl.multiple_of(wi * tw, 8)
    x_t = x_ref[0, :, pl.ds(start, tw + 2 * HALO), :]
    w = [r[:] for r in w_refs]
    base = wi * tw - HALO  # global image column of tile column 0 at depth 0
    x_t = _bottleneck(x_t, w[0], w[1], w[2], w[3], w[4], w[5],
                      wd=w[6], bd=w[7], dtype=dtype, col0=base, img_w=img_w)
    x_t = _bottleneck(x_t, w[8], w[9], w[10], w[11], w[12], w[13],
                      dtype=dtype, col0=base + 1, img_w=img_w)
    x_t = _bottleneck(x_t, w[14], w[15], w[16], w[17], w[18], w[19],
                      dtype=dtype, col0=base + 2, img_w=img_w)
    out_ref[0] = x_t


def pick_tile_w(w: int) -> int:
    """Largest tile in {64, 32, 16, 8} dividing W (0 if none: caller falls
    back to the XLA path). 32 balances VMEM headroom (f32 conv3 epilogue
    tensors are the peak) against per-program DMA overhead."""
    for tw in (32, 64, 16, 8):
        if w % tw == 0 and w >= tw:
            return tw
    return 0


def supports(blocks: Dict, groups: int, w: int) -> bool:
    return (
        groups == 1
        and len(blocks) == 3
        and "downsample" in blocks.get("0", {})
        and all("downsample" not in blocks[str(i)] for i in (1, 2))
        and pick_tile_w(w) > 0
    )


@partial(jax.jit, static_argnames=("interpret",))
def fused_layer1(
    x: jnp.ndarray, blocks: Dict, *, interpret: bool = False
) -> jnp.ndarray:
    """x (B, H, W, Cin) -> (B, H, W, 4P). Eval forward of a 3-bottleneck
    stride-1 stage with BN folded at trace time. See module docstring."""
    b, h_dim, w_dim, c_in = x.shape
    dtype = x.dtype
    tw = pick_tile_w(w_dim)
    if tw == 0:
        raise ValueError(f"W={w_dim} has no supported tile; gate with supports()")
    ops = _prep_weights(blocks, dtype)
    c_out = ops[4].shape[-1]
    xp = jnp.pad(x, ((0, 0), (0, 0), (HALO, HALO), (0, 0)))

    weight_specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in ops]
    grid = (b, w_dim // tw)
    return pl.pallas_call(
        partial(_kernel, dtype=dtype, tw=tw, img_w=w_dim),
        out_shape=jax.ShapeDtypeStruct((b, h_dim, w_dim, c_out), dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, h_dim, w_dim + 2 * HALO, c_in),
                lambda bi, wi: (bi, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ] + weight_specs,
        out_specs=pl.BlockSpec(
            (1, h_dim, tw, c_out), lambda bi, wi: (bi, 0, wi, 0),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )(xp, *ops)
