"""Pallas NMS kernel vs the XLA greedy reference (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from birdsoundclassif_tpu.ops.pallas_nms import nms_in_order_pallas
from birdsoundclassif_tpu.ops.nms import greedy_nms_in_order


@pytest.mark.parametrize("n,nv", [(64, 64), (300, 120), (300, 0), (256, 1)])
def test_matches_xla_greedy(rng, n, nv):
    b = 3
    boxes = np.zeros((b, n, 4), np.float32)
    boxes[..., 0] = rng.uniform(0, 900, (b, n))
    boxes[..., 1] = rng.uniform(0, 300, (b, n))
    boxes[..., 2] = boxes[..., 0] + rng.uniform(5, 200, (b, n))
    boxes[..., 3] = boxes[..., 1] + rng.uniform(5, 100, (b, n))
    n_valid = np.full((b,), nv, np.int32)
    keep_p = np.asarray(
        nms_in_order_pallas(jnp.asarray(boxes), jnp.asarray(n_valid), 0.3,
                            interpret=True)
    )
    for i in range(b):
        valid = np.arange(n) < nv
        want = np.asarray(
            greedy_nms_in_order(jnp.asarray(boxes[i]), jnp.asarray(valid), 0.3,
                                valid_prefix=True)
        )
        np.testing.assert_array_equal(keep_p[i], want)


def test_per_batch_valid_counts(rng):
    n = 128
    boxes = np.tile(np.array([[0, 0, 50, 50]], np.float32), (2, n, 1))
    n_valid = np.array([5, 0], np.int32)
    keep = np.asarray(
        nms_in_order_pallas(jnp.asarray(boxes), jnp.asarray(n_valid), 0.5,
                            interpret=True)
    )
    assert keep[0].sum() == 1  # identical boxes -> first kept only
    assert keep[1].sum() == 0
