"""RoI pooling parity: vectorized indicator-matmul pooling vs a direct
per-RoI oracle implementing the reference semantics (reference:
layers.py:399-497): level assignment, round/clamp coordinate casts, the
while-loop growth, torch AdaptiveAvgPool2d on the patch, and the separable
RoI positional encoding."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from birdsoundclassif_tpu.config import NbmConfig
from birdsoundclassif_tpu.models.roi import roi_pool
from birdsoundclassif_tpu.ops.posenc import _one_dim_pe_np


def make_cfg(**kw):
    cfg = NbmConfig()
    for k, v in kw.items():
        setattr(cfg, k, v)
    return cfg


def roi_pool_oracle(rois, fmaps_nchw, cfg):
    """Direct reference reimplementation (python loops, torch pooling)."""
    n_layers = cfg.n_layers
    ph, pw = cfg.roi_pool_h, cfg.roi_pool_w
    c = cfg.out_fpn_chan
    heights = [f.shape[2] for f in fmaps_nchw]
    widths = [f.shape[3] for f in fmaps_nchw]
    b, r = rois.shape[:2]

    size = np.sqrt((rois[..., 2] - rois[..., 0]) * (rois[..., 3] - rois[..., 1]))
    lvl = np.clip(np.trunc(np.log(size * 0.1) / np.log(2)).astype(int), 0, n_layers - 1)

    pe_freq = _one_dim_pe_np(cfg.img_height, c // 2)
    pe_time = _one_dim_pe_np(cfg.img_width, c // 2)

    pool_out = np.zeros((b, r, c, ph, pw), np.float32)
    pe_out = np.zeros((b, r, c, ph, pw), np.float32)
    for bi in range(b):
        for ri in range(r):
            l = lvl[bi, ri]
            s = 2 ** (l + 1)
            h_l, w_l = heights[l], widths[l]
            # torch round = half-to-even (np.round matches)
            x1 = int(np.round(rois[bi, ri, 0] / s))
            y1 = int(np.round(rois[bi, ri, 1] / s))
            x2 = int(np.round(rois[bi, ri, 2] / s))
            y2 = min(int(np.round(rois[bi, ri, 3] / s)), h_l - 1)
            while y2 - y1 + 1 < ph:
                y1 = max(0, y1 - 1)
                y2 = min(h_l - 1, y2 + 1)
            while x2 - x1 + 1 < pw:
                x1 = max(0, x1 - 1)
                x2 = min(w_l - 1, x2 + 1)
            patch = torch.tensor(fmaps_nchw[l][bi:bi + 1, :, y1:y2 + 1, x1:x2 + 1])
            pool_out[bi, ri] = F.adaptive_avg_pool2d(patch, (ph, pw))[0].numpy()
            # positional encoding (reference: layers.py:482-489)
            fpe = pe_freq[s * y1:s * y2]              # (Hf, C/2)
            tpe = pe_time[:s * (x2 - x1)]             # (Wt, C/2)
            grid = np.concatenate(
                [
                    np.broadcast_to(fpe[:, None, :], (fpe.shape[0], tpe.shape[0], c // 2)),
                    np.broadcast_to(tpe[None, :, :], (fpe.shape[0], tpe.shape[0], c // 2)),
                ],
                axis=-1,
            ).transpose(2, 0, 1)  # (C, Hf, Wt)
            pe_out[bi, ri] = F.adaptive_avg_pool2d(
                torch.tensor(grid[None]), (ph, pw)
            )[0].numpy()
    return pool_out, pe_out, lvl


@pytest.fixture
def pyramid(rng):
    cfg = make_cfg(out_fpn_chan=8)
    shapes = [(188, 512), (94, 256), (47, 128), (24, 64), (12, 32)]
    fmaps = [rng.normal(size=(2, 8, h, w)).astype(np.float32) for h, w in shapes]
    return cfg, fmaps


def random_rois(rng, b, r):
    x1 = rng.uniform(0, 1000, (b, r))
    y1 = rng.uniform(0, 360, (b, r))
    w = rng.uniform(2, 400, (b, r))
    h = rng.uniform(2, 200, (b, r))
    rois = np.stack(
        [x1, y1, np.minimum(x1 + w, 1023), np.minimum(y1 + h, 374)], axis=-1
    )
    return np.round(rois).astype(np.float32)


class TestRoiPoolParity:
    def test_random_rois(self, rng, pyramid):
        cfg, fmaps = pyramid
        rois = random_rois(rng, 2, 24)
        want_pool, want_pe, want_lvl = roi_pool_oracle(rois, fmaps, cfg)
        fm_nhwc = [jnp.asarray(np.moveaxis(f, 1, -1)) for f in fmaps]
        got_pool, got_pe, got_lvl = roi_pool(jnp.asarray(rois), fm_nhwc, cfg)
        np.testing.assert_array_equal(np.asarray(got_lvl), want_lvl)
        got_pool = np.moveaxis(np.asarray(got_pool), -1, 2)
        got_pe = np.moveaxis(np.asarray(got_pe), -1, 2)
        np.testing.assert_allclose(got_pool, want_pool, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(got_pe, want_pe, rtol=1e-4, atol=1e-4)

    def test_edge_rois(self, pyramid, rng):
        """Tiny, boundary, and full-image RoIs hit the growth loops and the
        x2 > W-1 truncation path."""
        cfg, fmaps = pyramid
        rois = np.array(
            [[
                [0, 0, 1, 1],            # tiny at origin -> growth
                [1020, 370, 1023, 374],  # corner, level-0 x2 rounds to W_l
                [0, 0, 1023, 374],       # full image -> top level
                [500, 100, 502, 102],    # tiny center
                [1022, 0, 1023, 374],    # 1-px-wide column at right edge
                [0, 373, 1023, 374],     # 1-px-high row at top
            ]],
            np.float32,
        )
        want_pool, want_pe, want_lvl = roi_pool_oracle(rois, [f[:1] for f in fmaps], cfg)
        fm_nhwc = [jnp.asarray(np.moveaxis(f[:1], 1, -1)) for f in fmaps]
        got_pool, got_pe, got_lvl = roi_pool(jnp.asarray(rois), fm_nhwc, cfg)
        np.testing.assert_array_equal(np.asarray(got_lvl), want_lvl)
        np.testing.assert_allclose(
            np.moveaxis(np.asarray(got_pool), -1, 2), want_pool, rtol=1e-4, atol=1e-4
        )
        np.testing.assert_allclose(
            np.moveaxis(np.asarray(got_pe), -1, 2), want_pe, rtol=1e-4, atol=1e-4
        )
