"""Fixed-shape greedy non-maximum suppression, fully on device.

Replaces the reference's per-image Python loop (reference:
nets_utils.py:210-245) with a traced `lax.fori_loop` over a score-sorted
suppression mask: identical keep decisions (suppression when IoU >= thresh,
greedy in descending score order), but no host round-trip and a static
output shape with a validity mask.

Two regimes:
  * N <= _MATRIX_NMS_MAX: materialize the (N, N) IoU matrix once (MXU/VPU
    friendly), then run the O(N)-step sequential keep scan on rows.
  * larger N (cross-window merge): compute each pivot row's IoU on the fly
    inside the loop, O(N^2) flops but O(N) memory.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .boxes import iou_matrix

_MATRIX_NMS_MAX = 2048


def _sequential_keep_from_matrix(iou: jnp.ndarray, valid: jnp.ndarray, thresh: float) -> jnp.ndarray:
    """keep[i] = valid[i] and no kept j < i has iou[j, i] >= thresh."""
    n = iou.shape[0]
    idx = jnp.arange(n)

    def body(i, keep):
        # If box i survives, it suppresses all later boxes with IoU >= thresh.
        row = iou[i]
        suppress = (row >= thresh) & (idx > i) & keep[i]
        return keep & ~suppress

    return jax.lax.fori_loop(0, n, body, valid)


def _sequential_keep_streaming(
    boxes: jnp.ndarray, valid: jnp.ndarray, thresh: float
) -> jnp.ndarray:
    n = boxes.shape[0]
    idx = jnp.arange(n)
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    areas = (x2 - x1 + 1.0) * (y2 - y1 + 1.0)

    def body(i, keep):
        bi = boxes[i]
        iw = jnp.clip(jnp.minimum(x2, bi[2]) - jnp.maximum(x1, bi[0]) + 1.0, 0.0)
        ih = jnp.clip(jnp.minimum(y2, bi[3]) - jnp.maximum(y1, bi[1]) + 1.0, 0.0)
        inter = iw * ih
        row = inter / (areas + areas[i] - inter)
        suppress = (row >= thresh) & (idx > i) & keep[i]
        return keep & ~suppress

    return jax.lax.fori_loop(0, n, body, valid)


def greedy_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    iou_thresh: float,
):
    """Greedy NMS over one image.

    Args:
      boxes: (N, 4) float. scores: (N,). valid: (N,) bool.
    Returns:
      order: (N,) int32 — indices sorted by descending score, invalid last.
      keep_sorted: (N,) bool — keep decision for each sorted slot.
    """
    boxes = boxes.astype(jnp.float32)
    key = jnp.where(valid, scores.astype(jnp.float32), -jnp.inf)
    order = jnp.argsort(-key, stable=True)
    b = boxes[order]
    v = valid[order]
    if boxes.shape[0] <= _MATRIX_NMS_MAX:
        iou = iou_matrix(b, b)
        keep = _sequential_keep_from_matrix(iou, v, iou_thresh)
    else:
        keep = _sequential_keep_streaming(b, v, iou_thresh)
    return order, keep


batched_greedy_nms = jax.vmap(greedy_nms, in_axes=(0, 0, 0, None))


def greedy_nms_prefix(
    boxes: jnp.ndarray,    # (B, N, 4) already in greedy order, valid prefix
    n_valid: jnp.ndarray,  # (B,) int32
    iou_thresh: float,
) -> jnp.ndarray:
    """keep (B, N) for boxes already sorted into greedy order with all valid
    entries first. On TPU this is a single Pallas kernel (the XLA
    fori-formulation measured ~500x slower on v5e); elsewhere a vmap'd
    while_loop bounded by the per-batch valid count.

    The branch is selected by *lowering platform* (lax.platform_dependent),
    not jax.default_backend(): a program jitted onto CPU devices (the
    virtual multi-chip mesh) must take the XLA path even when the process
    default backend is a TPU plugin."""

    def _pallas(boxes, n_valid):
        from .pallas_nms import nms_in_order_pallas

        return nms_in_order_pallas(boxes, n_valid, iou_thresh)

    def _xla(boxes, n_valid):
        n = boxes.shape[1]
        valid = jnp.arange(n)[None, :] < n_valid[:, None]
        return jax.vmap(
            lambda b, v: greedy_nms_in_order(b, v, iou_thresh, valid_prefix=True)
        )(boxes, valid)

    return jax.lax.platform_dependent(boxes, n_valid, tpu=_pallas, default=_xla)


def greedy_nms_in_order(
    boxes: jnp.ndarray,
    valid: jnp.ndarray,
    iou_thresh: float,
    valid_prefix: bool = False,
) -> jnp.ndarray:
    """Greedy NMS iterating in the GIVEN order (no score sort).

    The reference's nms() assumes its input is already ordered and simply
    walks it front-to-back; the cross-window merge feeds it boxes in
    (class, window, rank) order rather than global score order
    (reference: run_detection.py:230-233 with nets_utils.py:210-245), so the
    keep-set depends on that order. Returns keep mask aligned with input.

    valid_prefix=True asserts that all valid entries precede all invalid
    ones; the scan then runs only valid.sum() iterations (a while_loop)
    instead of the full padded length — the fixed-slot arrays are often
    >90% padding in the cross-window merge.
    """
    boxes = boxes.astype(jnp.float32)
    n = boxes.shape[0]
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    areas = (x2 - x1 + 1.0) * (y2 - y1 + 1.0)
    idx = jnp.arange(n)

    def suppress_from(i, keep):
        bi = boxes[i]
        iw = jnp.clip(jnp.minimum(x2, bi[2]) - jnp.maximum(x1, bi[0]) + 1.0, 0.0)
        ih = jnp.clip(jnp.minimum(y2, bi[3]) - jnp.maximum(y1, bi[1]) + 1.0, 0.0)
        inter = iw * ih
        row = inter / (areas + areas[i] - inter)
        return keep & ~((row >= iou_thresh) & (idx > i) & keep[i])

    if valid_prefix:
        n_valid = valid.sum()

        def cond(state):
            i, _ = state
            return i < n_valid

        def body(state):
            i, keep = state
            return i + 1, suppress_from(i, keep)

        _, keep = jax.lax.while_loop(cond, body, (jnp.int32(0), valid))
        return keep
    if n <= _MATRIX_NMS_MAX:
        iou = iou_matrix(boxes, boxes)
        return _sequential_keep_from_matrix(iou, valid, iou_thresh)
    return _sequential_keep_streaming(boxes, valid, iou_thresh)


def select_post_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    order: jnp.ndarray,
    keep_sorted: jnp.ndarray,
    post_nms_top_n: int,
):
    """Gather kept boxes into `post_nms_top_n` fixed slots.

    Reproduces the reference's batch-coupling quirk: the effective top-N is
    min(post_nms_top_n, min over the batch of kept counts)
    (reference: nets_utils.py:236-238).

    Args:
      boxes: (B, N, 4), scores: (B, N), order/keep_sorted from
      batched_greedy_nms.
    Returns:
      (sel_boxes (B, K, 4), sel_scores (B, K), sel_idx (B, K), valid (B, K))
      where K = post_nms_top_n and valid marks live slots.
    """
    # positions of kept slots first (stable), within sorted order
    kept_first = jnp.argsort(~keep_sorted, axis=-1, stable=True)[:, :post_nms_top_n]
    sel_idx = jnp.take_along_axis(order, kept_first, axis=-1)
    counts = keep_sorted.sum(axis=-1)
    k_eff = jnp.minimum(counts.min(), post_nms_top_n)
    valid = jnp.broadcast_to(
        jnp.arange(post_nms_top_n)[None, :] < k_eff,
        (boxes.shape[0], post_nms_top_n),
    )
    sel_boxes = jnp.take_along_axis(boxes, sel_idx[..., None], axis=1)
    sel_scores = jnp.take_along_axis(scores, sel_idx, axis=1)
    return sel_boxes, sel_scores, sel_idx, valid
