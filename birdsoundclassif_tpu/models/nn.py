"""Functional NN building blocks — NHWC, explicit param pytrees.

No module framework: every layer is (init_fn -> params dict, apply_fn).
This keeps the torch-checkpoint conversion a mechanical key mapping and the
whole forward a single traced function. Semantics (padding arithmetic, group
conv layout, BN eps) match torch so converted weights are drop-in.

Initialization follows the reference's weight_init (reference:
nets_utils.py:149-156): kaiming-normal conv/linear weights, N(0, 0.02)
BatchNorm scales; biases use torch's default uniform(-1/sqrt(fan_in)).
"""

from __future__ import annotations

import functools
import math
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, "jnp.ndarray | Params"]

BN_EPS = 1e-5


# ---------------------------------------------------------------------------
# initializers
# ---------------------------------------------------------------------------


def kaiming_normal(key, shape_hwio):
    """torch nn.init.kaiming_normal_ (fan_in, relu gain) on an HWIO kernel."""
    kh, kw, i, o = shape_hwio
    fan_in = kh * kw * i
    std = math.sqrt(2.0 / fan_in)
    return jax.random.normal(key, shape_hwio, jnp.float32) * std


def torch_default_conv_weight(key, shape_hwio, groups: int = 1):
    """torch Conv2d default: kaiming_uniform_(a=sqrt(5)) ==
    U(-1/sqrt(fan_in), 1/sqrt(fan_in)) with fan_in = (in/groups)*kh*kw."""
    kh, kw, i, o = shape_hwio
    fan_in = kh * kw * i  # i is already in/groups in HWIO grouped layout
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape_hwio, jnp.float32, -bound, bound)


def torch_default_bias(key, out_dim: int, fan_in: int):
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, (out_dim,), jnp.float32, -bound, bound)


# ---------------------------------------------------------------------------
# conv2d
# ---------------------------------------------------------------------------


def conv2d_init(
    key,
    in_ch: int,
    out_ch: int,
    kernel: int | Tuple[int, int],
    groups: int = 1,
    bias: bool = True,
    init: str = "kaiming",
) -> Params:
    kh, kw = (kernel, kernel) if isinstance(kernel, int) else kernel
    k_w, k_b = jax.random.split(key)
    shape = (kh, kw, in_ch // groups, out_ch)
    if init == "kaiming":
        w = kaiming_normal(k_w, shape)
    else:
        w = torch_default_conv_weight(k_w, shape, groups)
    p: Params = {"w": w}
    if bias:
        p["b"] = torch_default_bias(k_b, out_ch, kh * kw * (in_ch // groups))
    return p


def conv2d(
    params: Params,
    x: jnp.ndarray,
    stride: int | Tuple[int, int] = 1,
    padding: int | Tuple[int, int] = 0,
    groups: int = 1,
    dilation: int = 1,
) -> jnp.ndarray:
    """NHWC conv with torch floor-arithmetic padding semantics.

    Mixed precision follows the activation dtype: params are cast to
    x.dtype (bf16 compute when the caller feeds bf16) and the output stays
    in x.dtype — one cast at the model entry flips the whole network. The
    TPU MXU accumulates bf16 matmuls/convs in f32 internally regardless of
    the storage dtype. (No preferred_element_type upcast here: its conv
    transpose rule rejects mixed bf16/f32 cotangents under grad.)
    """
    sh, sw = (stride, stride) if isinstance(stride, int) else stride
    ph, pw = (padding, padding) if isinstance(padding, int) else padding
    w = params["w"].astype(x.dtype)
    if groups == x.shape[-1] and dilation == 1 and groups > 1 and _TAPS_MODE[0]:
        # pure depthwise in training: explicit tap formulation (see
        # _depthwise_taps). At inference the lax grouped conv is faster
        # (taps read the input kh*kw times); its *gradient* is what is
        # pathological, so taps are used only under depthwise_taps_mode().
        y = _depthwise_taps(w, x, (sh, sw), (ph, pw))
    else:
        y = jax.lax.conv_general_dilated(
            x,
            w,
            window_strides=(sh, sw),
            padding=((ph, ph), (pw, pw)),
            rhs_dilation=(dilation, dilation),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=groups,
        )
    if "b" in params:
        y = y + params["b"].astype(y.dtype)
    return y.astype(x.dtype)


_TAPS_MODE = [False]


class depthwise_taps_mode:
    """Trace-time switch: inside this context depthwise convs use the
    tap formulation (autodiff-clean; the lax grouped-conv gradient lowers
    to a bogus ~50 GB buffer for large strided depthwise convs on TPU)."""

    def __enter__(self):
        self._prev = _TAPS_MODE[0]
        _TAPS_MODE[0] = True

    def __exit__(self, *exc):
        _TAPS_MODE[0] = self._prev


def _taps_padded_input(x: jnp.ndarray, m: int, padding) -> jnp.ndarray:
    ph, pw = padding
    xp = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
    if m > 1:
        xp = jnp.repeat(xp, m, axis=3)  # channel pattern matches o // m
    return xp


def _taps_forward(w: jnp.ndarray, x: jnp.ndarray, stride, padding) -> jnp.ndarray:
    kh, kw = w.shape[0], w.shape[1]
    b, h, wi, c = x.shape
    m = w.shape[3] // c
    sh, sw = stride
    ph, pw = padding
    xp = _taps_padded_input(x, m, padding)
    h_out = (h + 2 * ph - kh) // sh + 1
    w_out = (wi + 2 * pw - kw) // sw + 1
    acc = None
    for dy in range(kh):
        for dx in range(kw):
            sl = jax.lax.slice(
                xp,
                (0, dy, dx, 0),
                (b, dy + (h_out - 1) * sh + 1, dx + (w_out - 1) * sw + 1, c * m),
                (1, sh, sw, 1),
            )
            term = sl * w[dy, dx, 0]
            acc = term if acc is None else acc + term
    return acc


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _depthwise_taps(w: jnp.ndarray, x: jnp.ndarray, stride, padding) -> jnp.ndarray:
    """Depthwise conv as kh*kw strided-slice multiply-adds.

    TPU grouped convs are slow on the forward pass and their gradient
    lowers to a pathological im2col buffer (a bogus 50 GB allocation was
    observed for a stride-8 depthwise conv at 188x512). Depthwise convs are
    VPU-bound, so explicit taps are both faster and autodiff-clean.

    Custom VJP: the autodiff backward of each strided slice is a full-size
    interior-padded `pad` of the cotangent, and XLA keeps all kh*kw of them
    live before the add tree (9 x 1.49 GB for the RPN level-0 stride-8 conv
    at B=16 — an HBM OOM on v5e). The hand-written backward dilates the
    cotangent ONCE and then runs stride-1 taps with the flipped kernel, so
    peak extra memory is one buffer instead of kh*kw.

    w: (kh, kw, 1, C*m) with torch group layout (out o reads in o // m).
    """
    return _taps_forward(w, x, stride, padding)


def _taps_fwd(w, x, stride, padding):
    return _taps_forward(w, x, stride, padding), (w, x)


def _taps_bwd(stride, padding, res, ct):
    w, x = res
    kh, kw = w.shape[0], w.shape[1]
    b, h, wi, c = x.shape
    cm = w.shape[3]
    m = cm // c
    sh, sw = stride
    ph, pw = padding
    h_out, w_out = ct.shape[1], ct.shape[2]
    hp, wp = h + 2 * ph, wi + 2 * pw

    # dw[dy,dx] = sum_{b,i,j} xp[dy+sh*i, dx+sw*j] * ct[i,j] — recompute the
    # forward slices (pad + repeat fuse into the per-tap reduces; f32
    # accumulation, cast back to the param dtype).
    xp = _taps_padded_input(x, m, padding)
    rows = []
    for dy in range(kh):
        row = []
        for dx in range(kw):
            sl = jax.lax.slice(
                xp,
                (0, dy, dx, 0),
                (b, dy + (h_out - 1) * sh + 1, dx + (w_out - 1) * sw + 1, cm),
                (1, sh, sw, 1),
            )
            row.append(jnp.sum(sl * ct, axis=(0, 1, 2), dtype=jnp.float32))
        rows.append(jnp.stack(row))
    dw = jnp.stack(rows)[:, :, None, :].astype(w.dtype)

    # dxp[p,q] = sum_{dy,dx} w[dy,dx] * ct[(p-dy)/sh, (q-dx)/sw] (where the
    # division is exact): dilate ct onto the stride grid with lo-padding
    # kh-1/kw-1 and hi-padding up to the padded-input extent, then stride-1
    # taps against the FLIPPED kernel. One interior-pad buffer total.
    hd = (h_out - 1) * sh + 1
    wd = (w_out - 1) * sw + 1
    ctd = jax.lax.pad(
        ct,
        jnp.zeros((), ct.dtype),
        ((0, 0, 0), (kh - 1, hp - hd, sh - 1), (kw - 1, wp - wd, sw - 1), (0, 0, 0)),
    )
    dxp = None
    for ey in range(kh):
        for ex in range(kw):
            sl = jax.lax.slice(ctd, (0, ey, ex, 0), (b, ey + hp, ex + wp, cm))
            term = sl * w[kh - 1 - ey, kw - 1 - ex, 0]
            dxp = term if dxp is None else dxp + term
    dx = dxp[:, ph : ph + h, pw : pw + wi, :]
    if m > 1:
        dx = dx.reshape(b, h, wi, c, m).sum(axis=4)
    return dw, dx.astype(x.dtype)


_depthwise_taps.defvjp(_taps_fwd, _taps_bwd)


# ---------------------------------------------------------------------------
# linear
# ---------------------------------------------------------------------------


def linear_init(key, in_dim: int, out_dim: int, init: str = "kaiming") -> Params:
    k_w, k_b = jax.random.split(key)
    if init == "kaiming":
        # torch kaiming_normal_ on (out, in): fan_in = in_dim
        w = jax.random.normal(k_w, (in_dim, out_dim), jnp.float32) * math.sqrt(2.0 / in_dim)
    else:
        bound = 1.0 / math.sqrt(in_dim)
        w = jax.random.uniform(k_w, (in_dim, out_dim), jnp.float32, -bound, bound)
    return {"w": w, "b": torch_default_bias(k_b, out_dim, in_dim)}


def linear(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    w = params["w"].astype(x.dtype)
    y = jnp.dot(x, w)
    return (y + params["b"].astype(y.dtype)).astype(x.dtype)


# ---------------------------------------------------------------------------
# batch norm (train-capable, running stats) & frozen batch norm
# ---------------------------------------------------------------------------


def batchnorm_init(key, ch: int, reference_init: bool = True) -> Params:
    """reference weight_init: scale ~ N(0, 0.02); torch default bias 0."""
    if reference_init:
        scale = jax.random.normal(key, (ch,), jnp.float32) * 0.02
    else:
        scale = jnp.ones((ch,), jnp.float32)
    return {
        "scale": scale,
        "bias": jnp.zeros((ch,), jnp.float32),
        "mean": jnp.zeros((ch,), jnp.float32),
        "var": jnp.ones((ch,), jnp.float32),
    }


def batchnorm(
    params: Params,
    x: jnp.ndarray,
    training: bool = False,
    momentum: float = 0.1,
):
    """NHWC batch norm. In training mode returns (y, new_stats) where
    new_stats carries updated running mean/var (torch: unbiased var in the
    running stats, biased in the normalization)."""
    if training:
        axes = tuple(range(x.ndim - 1))
        mean = jnp.mean(x.astype(jnp.float32), axis=axes)
        var = jnp.var(x.astype(jnp.float32), axis=axes)
        n = np.prod([x.shape[a] for a in axes])
        unbiased = var * (n / max(1, n - 1))
        new_stats = {
            "mean": (1 - momentum) * params["mean"] + momentum * mean,
            "var": (1 - momentum) * params["var"] + momentum * unbiased,
        }
    else:
        mean, var = params["mean"], params["var"]
        new_stats = None
    inv = jax.lax.rsqrt(var + BN_EPS) * params["scale"]
    y = (x.astype(jnp.float32) - mean) * inv + params["bias"]
    y = y.astype(x.dtype)
    return (y, new_stats) if training else y


def frozen_batchnorm(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    """FrozenBatchNorm2d: running stats and affine are constants
    (reference: backbone.py:26-62, eps added before rsqrt)."""
    scale = params["scale"] * jax.lax.rsqrt(params["var"] + BN_EPS)
    bias = params["bias"] - params["mean"] * scale
    return (x.astype(jnp.float32) * scale + bias).astype(x.dtype)


# ---------------------------------------------------------------------------
# pooling / activations
# ---------------------------------------------------------------------------


def max_pool2d(x: jnp.ndarray, kernel: int, stride: int, padding: int) -> jnp.ndarray:
    """NHWC max pool with torch padding arithmetic (pad with -inf)."""
    return jax.lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        jax.lax.max,
        window_dimensions=(1, kernel, kernel, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (padding, padding), (padding, padding), (0, 0)),
    )


def stem_corr_add(params: Params, y: jnp.ndarray, x_shape, stride, padding) -> jnp.ndarray:
    """Add the fused-init-conv border correction to a stem conv output.

    `params` holds the bias-contracted kernel built by
    optimize.fold_init_conv; the correction is the stem conv's response to
    a constant ones-map (batch 1, 1 channel) with the same stride/padding,
    i.e. the sum of in-bounds taps — constant in the interior, reduced in
    the zero-padded border frame. Negligible cost: one batch-1 single-
    channel conv per forward, broadcast-added over the batch.
    """
    ones = jnp.ones((1,) + tuple(x_shape[1:3]) + (1,), y.dtype)
    return y + conv2d(params, ones, stride=stride, padding=padding)


def silu(x):
    return jax.nn.silu(x)


def relu(x):
    return jax.nn.relu(x)


# ---------------------------------------------------------------------------
# DepthwiseSepConv2d — the reference's inverted bottleneck block
# (reference: layers.py:13-46)
# ---------------------------------------------------------------------------


def depthwise_sep_conv_init(
    key,
    indim: int,
    outdim: int,
    kernel: int | Tuple[int, int] = 3,
    expansion: int = 4,
    bias_out: bool = True,
    pe_channels: Optional[int] = None,
) -> Params:
    keys = jax.random.split(key, 4)
    p: Params = {
        # grouped conv: each input channel -> `expansion` outputs
        "depth_wise": conv2d_init(keys[0], indim, expansion * indim, kernel,
                                  groups=indim, init="kaiming"),
        "pt_wise": conv2d_init(keys[1], expansion * indim, outdim, 1,
                               bias=bias_out, init="kaiming"),
        "norm": batchnorm_init(keys[2], outdim, reference_init=True),
    }
    if pe_channels is not None:
        p["pe_proj"] = conv2d_init(keys[3], pe_channels, 2 * expansion * indim, 1,
                                   init="kaiming")
    return p


def depthwise_sep_conv(
    params: Params,
    x: jnp.ndarray,
    stride: float = 1,
    kernel: int | Tuple[int, int] = 3,
    pe: Optional[jnp.ndarray] = None,
    training: bool = False,
):
    """x: NHWC. stride < 1 means bilinear (align_corners) upsampling by 1/stride
    before the conv (reference: layers.py:33-46). FiLM-style PE modulation
    when `pe` given: out = out * pe_scale + pe_shift."""
    from ..ops.image import resize_bilinear_align_corners

    kh, kw = (kernel, kernel) if isinstance(kernel, int) else kernel
    pad = (int(0.5 * (kh - 1)), int(0.5 * (kw - 1)))
    if stride < 1:
        size = (np.array(x.shape[1:3]) * (1.0 / stride)).astype(np.int64)
        x = resize_bilinear_align_corners(x, int(size[0]), int(size[1]))
        conv_stride = 1
    else:
        conv_stride = int(max(1, stride))
    indim = x.shape[-1]
    out = conv2d(params["depth_wise"], x, stride=conv_stride, padding=pad, groups=indim)
    if pe is not None:
        pe_m = conv2d(params["pe_proj"], silu(pe))
        half = pe_m.shape[-1] // 2
        out = out * pe_m[..., :half] + pe_m[..., half:]
    out = conv2d(params["pt_wise"], out)
    if training:
        out, new_stats = batchnorm(params["norm"], out, training=True)
        return silu(out), new_stats
    out = batchnorm(params["norm"], out, training=False)
    return silu(out)
