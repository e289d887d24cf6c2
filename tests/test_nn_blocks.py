"""NN building-block parity vs torch functional ops."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from birdsoundclassif_tpu.models import nn as fnn


def to_nhwc(x):
    return np.moveaxis(x, 1, -1)


def to_nchw(x):
    return np.moveaxis(x, -1, 1)


class TestConv2d:
    @pytest.mark.parametrize(
        "in_ch,out_ch,k,stride,pad,groups,dilation",
        [
            (3, 8, 3, 1, 1, 1, 1),
            (3, 8, 7, 2, 3, 1, 1),
            (4, 16, 3, 2, 1, 4, 1),   # grouped (depthwise-expansion style)
            (8, 8, 3, 1, 2, 1, 2),    # dilated
            (6, 12, 1, 1, 0, 1, 1),
        ],
    )
    def test_vs_torch(self, rng, in_ch, out_ch, k, stride, pad, groups, dilation):
        x = rng.normal(size=(2, in_ch, 17, 23)).astype(np.float32)
        w = rng.normal(size=(out_ch, in_ch // groups, k, k)).astype(np.float32)
        b = rng.normal(size=(out_ch,)).astype(np.float32)
        want = F.conv2d(
            torch.tensor(x), torch.tensor(w), torch.tensor(b),
            stride=stride, padding=pad, groups=groups, dilation=dilation,
        ).numpy()
        params = {"w": jnp.asarray(w.transpose(2, 3, 1, 0)), "b": jnp.asarray(b)}
        got = to_nchw(np.asarray(fnn.conv2d(
            params, jnp.asarray(to_nhwc(x)), stride=stride, padding=pad,
            groups=groups, dilation=dilation,
        )))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


class TestPoolNorm:
    def test_max_pool(self, rng):
        x = rng.normal(size=(2, 5, 188, 512)).astype(np.float32)
        want = F.max_pool2d(torch.tensor(x), 3, 2, 1).numpy()
        got = to_nchw(np.asarray(fnn.max_pool2d(jnp.asarray(to_nhwc(x)), 3, 2, 1)))
        np.testing.assert_array_equal(got, want)

    def test_frozen_batchnorm(self, rng):
        c = 7
        x = rng.normal(size=(2, c, 5, 6)).astype(np.float32)
        w, b = rng.normal(size=(c,)), rng.normal(size=(c,))
        m, v = rng.normal(size=(c,)), np.abs(rng.normal(size=(c,))) + 0.1
        # reference formula (backbone.py:52-62)
        scale = w * (v + 1e-5) ** -0.5
        want = x * scale[None, :, None, None] + (b - m * scale)[None, :, None, None]
        params = {k: jnp.asarray(a.astype(np.float32)) for k, a in
                  zip(["scale", "bias", "mean", "var"], [w, b, m, v])}
        got = to_nchw(np.asarray(fnn.frozen_batchnorm(params, jnp.asarray(to_nhwc(x)))))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_batchnorm_train_stats_vs_torch(self, rng):
        c = 5
        x = rng.normal(size=(3, c, 4, 4)).astype(np.float32)
        bn = torch.nn.BatchNorm2d(c)
        bn.train()
        with torch.no_grad():
            want = bn(torch.tensor(x)).numpy()
        params = {
            "scale": jnp.ones((c,)), "bias": jnp.zeros((c,)),
            "mean": jnp.zeros((c,)), "var": jnp.ones((c,)),
        }
        got, stats = fnn.batchnorm(params, jnp.asarray(to_nhwc(x)), training=True)
        np.testing.assert_allclose(to_nchw(np.asarray(got)), want, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(stats["mean"]), bn.running_mean.numpy(), rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(stats["var"]), bn.running_var.numpy(), rtol=1e-4, atol=1e-5
        )


class TestDepthwiseSepConv:
    def _torch_forward(self, x, p, stride, expansion, pe=None):
        """Reference DepthwiseSepConv2d semantics built from torch functionals
        (reference: layers.py:13-46), eval-mode BN."""
        xt = torch.tensor(x)
        if stride < 1:
            size = ((1 / stride) * np.array(x.shape[-2:])).astype(np.int64).tolist()
            xt = F.interpolate(xt, size=size, mode="bilinear", align_corners=True)
        indim = x.shape[1]
        out = F.conv2d(xt, torch.tensor(p["dw_w"]), torch.tensor(p["dw_b"]),
                       stride=int(max(1, stride)), padding=1, groups=indim)
        if pe is not None:
            pet = F.silu(torch.tensor(pe))
            pet = F.conv2d(pet, torch.tensor(p["pe_w"]), torch.tensor(p["pe_b"]))
            half = pet.shape[1] // 2
            out = out * pet[:, :half] + pet[:, half:]
        out = F.conv2d(out, torch.tensor(p["pt_w"]), torch.tensor(p["pt_b"]))
        out = F.batch_norm(out, torch.tensor(p["bn_m"]), torch.tensor(p["bn_v"]),
                           torch.tensor(p["bn_w"]), torch.tensor(p["bn_b"]), eps=1e-5)
        return F.silu(out).numpy()

    @pytest.mark.parametrize("stride,with_pe", [(1, False), (2, False), (0.5, False), (1, True)])
    def test_vs_torch(self, rng, stride, with_pe):
        indim, outdim, exp = 4, 6, 2
        x = rng.normal(size=(2, indim, 8, 12)).astype(np.float32)
        p = {
            "dw_w": rng.normal(size=(exp * indim, 1, 3, 3)).astype(np.float32),
            "dw_b": rng.normal(size=(exp * indim,)).astype(np.float32),
            "pt_w": rng.normal(size=(outdim, exp * indim, 1, 1)).astype(np.float32),
            "pt_b": rng.normal(size=(outdim,)).astype(np.float32),
            "bn_w": rng.normal(size=(outdim,)).astype(np.float32),
            "bn_b": rng.normal(size=(outdim,)).astype(np.float32),
            "bn_m": rng.normal(size=(outdim,)).astype(np.float32),
            "bn_v": (np.abs(rng.normal(size=(outdim,))) + 0.1).astype(np.float32),
        }
        pe = rng.normal(size=(2, 3, x.shape[2], x.shape[3])).astype(np.float32) if with_pe else None
        if with_pe:
            p["pe_w"] = rng.normal(size=(2 * exp * indim, 3, 1, 1)).astype(np.float32)
            p["pe_b"] = rng.normal(size=(2 * exp * indim,)).astype(np.float32)
        want = self._torch_forward(x, p, stride, exp, pe)
        params = {
            "depth_wise": {"w": jnp.asarray(p["dw_w"].transpose(2, 3, 1, 0)),
                           "b": jnp.asarray(p["dw_b"])},
            "pt_wise": {"w": jnp.asarray(p["pt_w"].transpose(2, 3, 1, 0)),
                        "b": jnp.asarray(p["pt_b"])},
            "norm": {"scale": jnp.asarray(p["bn_w"]), "bias": jnp.asarray(p["bn_b"]),
                     "mean": jnp.asarray(p["bn_m"]), "var": jnp.asarray(p["bn_v"])},
        }
        if with_pe:
            params["pe_proj"] = {"w": jnp.asarray(p["pe_w"].transpose(2, 3, 1, 0)),
                                 "b": jnp.asarray(p["pe_b"])}
        got = to_nchw(np.asarray(fnn.depthwise_sep_conv(
            params, jnp.asarray(to_nhwc(x)), stride=stride,
            pe=jnp.asarray(to_nhwc(pe)) if with_pe else None,
        )))
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


class TestDepthwiseTapsMode:
    @pytest.mark.parametrize("stride,exp", [(1, 2), (2, 1), (8, 2)])
    def test_taps_equals_lax(self, rng, stride, exp):
        """Training-mode tap formulation == lax grouped conv."""
        indim = 6
        x = jnp.asarray(rng.normal(size=(2, 33, 49, indim)).astype(np.float32))
        p = {
            "w": jnp.asarray(rng.normal(size=(3, 3, 1, exp * indim)).astype(np.float32)),
            "b": jnp.asarray(rng.normal(size=(exp * indim,)).astype(np.float32)),
        }
        base = fnn.conv2d(p, x, stride=stride, padding=1, groups=indim)
        with fnn.depthwise_taps_mode():
            taps = fnn.conv2d(p, x, stride=stride, padding=1, groups=indim)
        np.testing.assert_allclose(np.asarray(taps), np.asarray(base),
                                   rtol=1e-5, atol=1e-5)

    def test_taps_gradient_finite(self, rng):
        import jax

        indim = 4
        x = jnp.asarray(rng.normal(size=(1, 16, 24, indim)).astype(np.float32))
        p = {"w": jnp.asarray(rng.normal(size=(3, 3, 1, 2 * indim)).astype(np.float32))}

        def loss(p):
            with fnn.depthwise_taps_mode():
                return fnn.conv2d(p, x, stride=8, padding=1, groups=indim).sum()

        g = jax.grad(loss)(p)
        assert np.isfinite(np.asarray(g["w"])).all()

    @pytest.mark.parametrize(
        "stride,exp,kernel,padding",
        [
            (8, 4, 3, 1),   # the RPN level-0 OOM case: stride > kernel
            (2, 1, 3, 1),   # overlapping taps (stride < kernel)
            (1, 2, 3, 1),   # dense
            (4, 3, 5, 2),   # stride < kernel with expansion
            (2, 1, (3, 5), (1, 2)),  # asymmetric kernel/padding
        ],
    )
    def test_taps_custom_vjp_matches_autodiff(self, rng, stride, exp, kernel, padding):
        """The hand-written taps backward (custom_vjp in fnn._depthwise_taps,
        one dilated-cotangent buffer instead of kh*kw interior-padded pads)
        must equal autodiff of the lax grouped conv, for both dw and dx."""
        import jax

        indim = 5
        kh, kw = (kernel, kernel) if isinstance(kernel, int) else kernel
        x = jnp.asarray(rng.normal(size=(2, 19, 27, indim)).astype(np.float32))
        p = {"w": jnp.asarray(
            rng.normal(size=(kh, kw, 1, exp * indim)).astype(np.float32))}
        ct_key = rng.normal  # deterministic cotangent via a fixed projection

        def scalar(out):
            # non-uniform cotangent: weight every output element differently
            w = jnp.asarray(ct_key(size=out.shape).astype(np.float32))
            return (out * w).sum()

        def loss_lax(p, x):
            return scalar(fnn.conv2d(p, x, stride=stride, padding=padding,
                                     groups=indim))

        def loss_taps(p, x):
            with fnn.depthwise_taps_mode():
                return scalar(fnn.conv2d(p, x, stride=stride, padding=padding,
                                         groups=indim))

        # same cotangent both times: re-seed the projection
        state = rng.bit_generator.state
        gw_ref, gx_ref = jax.grad(loss_lax, argnums=(0, 1))(p, x)
        rng.bit_generator.state = state
        gw, gx = jax.grad(loss_taps, argnums=(0, 1))(p, x)
        np.testing.assert_allclose(np.asarray(gw["w"]), np.asarray(gw_ref["w"]),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                                   rtol=2e-4, atol=2e-4)
