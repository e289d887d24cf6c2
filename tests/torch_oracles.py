"""Independent torch/numpy oracle implementations of the reference formulas,
written from the published Faster-RCNN semantics (reference file:line cited
per function) for cross-checking the JAX ops. CPU-only."""

import numpy as np
import torch


def iou_matrix_oracle(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(Na, Nb) IoU with +1 widths (reference: nets_utils.py:103-126)."""
    a = torch.tensor(a, dtype=torch.float32)
    b = torch.tensor(b, dtype=torch.float32)
    x1 = torch.maximum(a[:, None, 0], b[None, :, 0])
    y1 = torch.maximum(a[:, None, 1], b[None, :, 1])
    x2 = torch.minimum(a[:, None, 2], b[None, :, 2])
    y2 = torch.minimum(a[:, None, 3], b[None, :, 3])
    iw = (x2 - x1 + 1).clamp(min=0)
    ih = (y2 - y1 + 1).clamp(min=0)
    inter = iw * ih
    area_a = (a[:, 2] - a[:, 0] + 1) * (a[:, 3] - a[:, 1] + 1)
    area_b = (b[:, 2] - b[:, 0] + 1) * (b[:, 3] - b[:, 1] + 1)
    return (inter / (area_a[:, None] + area_b[None, :] - inter)).numpy()


def encode_oracle(anchors: np.ndarray, boxes: np.ndarray) -> np.ndarray:
    """reference: bbox_transform, nets_utils.py:129-146."""
    wa = anchors[:, 2] - anchors[:, 0] + 1
    ha = anchors[:, 3] - anchors[:, 1] + 1
    xa = anchors[:, 0] + 0.5 * wa
    ya = anchors[:, 1] + 0.5 * ha
    w = boxes[:, 2] - boxes[:, 0] + 1
    h = boxes[:, 3] - boxes[:, 1] + 1
    x = boxes[:, 0] + 0.5 * w
    y = boxes[:, 1] + 0.5 * h
    return np.stack([(x - xa) / wa, (y - ya) / ha, np.log(w / wa), np.log(h / ha)], axis=1)


def decode_oracle(deltas: np.ndarray, anchors: np.ndarray) -> np.ndarray:
    """reference: bbox_reg_to_coord, nets_utils.py:169-186 (torch.round)."""
    t = torch.tensor(deltas, dtype=torch.float32)
    a = torch.tensor(anchors, dtype=torch.float32)
    wa = a[:, 2] - a[:, 0] + 1
    ha = a[:, 3] - a[:, 1] + 1
    xa = a[:, 0] + 0.5 * wa
    ya = a[:, 1] + 0.5 * ha
    x = t[..., 0] * wa + xa
    y = t[..., 1] * ha + ya
    w = torch.exp(t[..., 2]) * wa
    h = torch.exp(t[..., 3]) * ha
    return torch.stack(
        [(x - 0.5 * w).round(), (y - 0.5 * h).round(), (x + 0.5 * w).round(), (y + 0.5 * h).round()],
        dim=-1,
    ).numpy()


def greedy_nms_oracle(boxes: np.ndarray, scores: np.ndarray, thresh: float):
    """Greedy keep-list on score-desc-sorted boxes
    (reference: nms, nets_utils.py:210-245). Returns kept original indices."""
    order = np.argsort(-scores, kind="stable")
    boxes_s = boxes[order]
    iou = iou_matrix_oracle(boxes_s, boxes_s)
    suppressed = set()
    keep = []
    for i in range(len(boxes_s)):
        if i in suppressed:
            continue
        keep.append(order[i])
        for j in np.nonzero(iou[i, i + 1:] >= thresh)[0]:
            suppressed.add(i + 1 + int(j))
    return np.array(keep, dtype=np.int64)


def adaptive_avg_pool_oracle(x: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """x: (N, C, H, W) — torch.nn.AdaptiveAvgPool2d."""
    return torch.nn.functional.adaptive_avg_pool2d(
        torch.tensor(x, dtype=torch.float32), (out_h, out_w)
    ).numpy()


def bilinear_align_corners_oracle(x: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """x: (N, C, H, W) — torch bilinear interpolate with align_corners=True."""
    return torch.nn.functional.interpolate(
        torch.tensor(x, dtype=torch.float32), size=(out_h, out_w),
        mode="bilinear", align_corners=True,
    ).numpy()


def one_dim_pe_oracle(length: int, cn: int, temp: float = 10000.0) -> np.ndarray:
    """reference: position_encoding.py:10-15."""
    pos = torch.arange(1, length + 1, dtype=torch.float32)
    dt = temp ** (
        2 * torch.div(torch.arange(cn, dtype=torch.float32), 2, rounding_mode="trunc") / cn
    )
    posenc = pos[:, None] / dt[None, :]
    pe = torch.stack([posenc[:, 0::2].sin(), posenc[:, 1::2].cos()], dim=2).flatten(start_dim=1)
    return pe.numpy()


def sine_pe_2d_oracle(h: int, w: int, num_pos_feats: int, only_y: bool = True) -> np.ndarray:
    """reference: PositionEmbeddingSine(normalize=True), position_encoding.py:35-56.
    Returns (h, w, C)."""
    import math

    not_mask = torch.ones((1, h, w))
    y_embed = not_mask.cumsum(1, dtype=torch.float32)
    x_embed = not_mask.cumsum(2, dtype=torch.float32)
    eps = 1e-6
    scale = 2 * math.pi
    y_embed = y_embed / (y_embed[:, -1:, :] + eps) * scale
    x_embed = x_embed / (x_embed[:, :, -1:] + eps) * scale
    dim_t = torch.arange(num_pos_feats, dtype=torch.float32)
    dim_t = 10000.0 ** (2 * torch.div(dim_t, 2, rounding_mode="trunc") / num_pos_feats)
    pos_x = x_embed[:, :, :, None] / dim_t
    pos_y = y_embed[:, :, :, None] / dim_t
    pos_x = torch.stack((pos_x[:, :, :, 0::2].sin(), pos_x[:, :, :, 1::2].cos()), dim=4).flatten(3)
    pos_y = torch.stack((pos_y[:, :, :, 0::2].sin(), pos_y[:, :, :, 1::2].cos()), dim=4).flatten(3)
    if only_y:
        return pos_y[0].numpy()
    return torch.cat((pos_y, pos_x), dim=3)[0].numpy()


def randomize_bn_stats(tree, rng):
    """Give every BN dict in a param subtree non-trivial eval statistics in
    place (parity tests are meaningless with mean=0/var=1 identity BNs)."""
    import jax.numpy as jnp

    if isinstance(tree, dict):
        if set(tree) >= {"scale", "bias", "mean", "var"}:
            ch = tree["mean"].shape[0]
            tree["mean"] = jnp.asarray(rng.normal(size=ch, scale=0.1), jnp.float32)
            tree["var"] = jnp.asarray(1.0 + rng.uniform(size=ch), jnp.float32)
            tree["scale"] = jnp.asarray(
                rng.normal(size=ch, loc=1.0, scale=0.1), jnp.float32
            )
            tree["bias"] = jnp.asarray(rng.normal(size=ch, scale=0.1), jnp.float32)
        else:
            for v in tree.values():
                randomize_bn_stats(v, rng)
