"""Int8 quantized 3x3 conv for the inference-time FPN out-convs.

Why: the FPN's five 3x3 384->256 out-convs are the single largest
on-device block of the eval forward — 50.5 ms of 127.9 ms at B=32, 73%
MXU in bf16 (docs/BENCH.md stage bisection + roofline) — i.e. already
near the bf16 compute roofline. The v5e MXU's int8 path has 2x the bf16
peak (~394 vs ~197 T/s), so the only way to push this block further is
to feed the MXU int8 operands.

Scheme (opt-in, `NbmConfig.quantize_fpn`):
- weights: per-output-channel symmetric int8 — s_w[oc] = max|w[..,oc]|/127,
  folded once at load time (`quantize_conv_params`, called from
  models/optimize.fold_inference);
- activations: per-image dynamic symmetric int8 — s_x[b] = max|x[b]|/127
  computed on device per forward. No calibration pass or data is needed,
  and each window's detections stay independent of its batch neighbours
  (a per-BATCH scale would make results depend on batch composition,
  breaking the merge determinism the pipeline tests pin).
- compute: zero-pad the quantized map (0 is exact in a symmetric scheme,
  matching the reference Conv2d's zero padding, fpn.py:136-146), then
  accumulate the 3x3 as nine shifted (B,H,W,Cin)x(Cin,Cout) int8
  dot_generals with int32 accumulation — the layout the MXU natively
  tiles, with no im2col materialization;
- epilogue: out = acc_i32 * (s_x[b] * s_w[oc]) + bias in f32, cast back
  to the activation dtype (bf16) — same single-rounding epilogue XLA's
  conv+bias fusion produces.

The quantization error is bounded by |x|_max/127 per operand (~0.8% of
dynamic range); end-to-end detection impact is measured, not assumed —
see scripts/bench_quantize.py and docs/BENCH.md. Training never sees
this path (quantization happens in the inference-only param fold).

Reference for the op being approximated: fpn.py:136-146 (3x3 pad-1
out-convs applied top-down).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def quantize_conv_params(params: Dict) -> Dict:
    """{"w": (kh,kw,Cin,Cout) f32[, "b"]} -> {"wq", "sw"[, "b"]}.

    Per-output-channel symmetric int8. The bias stays f32 (it enters the
    epilogue after dequantization).
    """
    w = jnp.asarray(params["w"], jnp.float32)
    sw = jnp.max(jnp.abs(w), axis=(0, 1, 2)) / 127.0          # (Cout,)
    sw = jnp.where(sw == 0, 1.0, sw)
    wq = jnp.clip(jnp.round(w / sw), -127, 127).astype(jnp.int8)
    out = {"wq": wq, "sw": sw}
    if "b" in params:
        out["b"] = jnp.asarray(params["b"], jnp.float32)
    return out


def is_quantized(params: Dict) -> bool:
    return "wq" in params


def qconv2d_3x3(params: Dict, x: jnp.ndarray) -> jnp.ndarray:
    """Quantized pad-1 stride-1 3x3 NHWC conv; returns x.dtype.

    params: output of quantize_conv_params on a (3,3,Cin,Cout) conv.
    """
    wq, sw = params["wq"], params["sw"]
    kh, kw = wq.shape[:2]
    b_dim, h_dim, w_dim, _ = x.shape
    xf = x.astype(jnp.float32)
    # per-image dynamic activation scale
    sx = jnp.max(jnp.abs(xf), axis=(1, 2, 3), keepdims=True) / 127.0
    sx = jnp.where(sx == 0, 1.0, sx)
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    xq = jnp.pad(xq, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((b_dim, h_dim, w_dim, wq.shape[-1]), jnp.int32)
    for dy in range(kh):
        for dx in range(kw):
            tap = jax.lax.dynamic_slice(
                xq, (0, dy, dx, 0), (b_dim, h_dim, w_dim, xq.shape[-1])
            )
            acc = acc + jax.lax.dot_general(
                tap, wq[dy, dx],
                dimension_numbers=(((3,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
    out = acc.astype(jnp.float32) * (sx * sw[None, None, None, :])
    if "b" in params:
        out = out + params["b"]
    return out.astype(x.dtype)
