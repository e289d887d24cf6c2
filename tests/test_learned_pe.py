"""Learned position embedding parity vs a torch reconstruction of the
reference's PositionEmbeddingLearned (position_encoding.py:59-83)."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn as tnn

from birdsoundclassif_tpu.ops.posenc import (
    learned_pe_init,
    learned_position_embedding_2d,
)


class TorchLearnedPE(tnn.Module):
    def __init__(self, num_pos_feats=256):
        super().__init__()
        self.row_embed = tnn.Embedding(50, num_pos_feats)
        self.col_embed = tnn.Embedding(50, num_pos_feats)

    def forward(self, h, w):
        i = torch.arange(w)
        j = torch.arange(h)
        x_emb = self.col_embed(i)
        y_emb = self.row_embed(j)
        return torch.cat(
            [
                x_emb.unsqueeze(0).repeat(h, 1, 1),
                y_emb.unsqueeze(1).repeat(1, w, 1),
            ],
            dim=-1,
        ).permute(2, 0, 1)  # (2*npf, h, w)


def test_learned_pe_parity():
    params = learned_pe_init(jax.random.PRNGKey(0), num_pos_feats=8)
    ref = TorchLearnedPE(num_pos_feats=8)
    with torch.no_grad():
        ref.row_embed.weight.copy_(torch.tensor(np.asarray(params["row_embed"])))
        ref.col_embed.weight.copy_(torch.tensor(np.asarray(params["col_embed"])))
        want = ref(12, 40).numpy()
    got = np.moveaxis(np.asarray(learned_position_embedding_2d(params, 12, 40)), -1, 0)
    np.testing.assert_allclose(got, want, rtol=0, atol=0)


def test_learned_pe_oob_clamps():
    """Documented deviation: beyond 50 px JAX clamps instead of crashing —
    columns >= 50 repeat the last embedding row."""
    params = learned_pe_init(jax.random.PRNGKey(1), num_pos_feats=4)
    pe = np.asarray(learned_position_embedding_2d(params, 2, 64))
    np.testing.assert_array_equal(pe[0, 50, :4], pe[0, 63, :4])
    np.testing.assert_array_equal(pe[0, 50, :4], np.asarray(params["col_embed"])[49])


def test_backbone_learned_pe_shapes():
    from birdsoundclassif_tpu.config import NbmConfig
    from birdsoundclassif_tpu.models.backbone import backbone_apply, backbone_init

    cfg = NbmConfig()
    cfg.position_embedding = "learned"
    cfg.compute_dtype = "float32"
    cfg.set_derived()
    params = backbone_init(jax.random.PRNGKey(0), cfg)
    assert "pos_embed" in params
    x = jnp.zeros((1, 48, 64, cfg.inpt_channels), jnp.float32)
    feats, pos = backbone_apply(params, x, cfg)
    assert len(pos) == len(feats)
    for f, p in zip(feats, pos):
        assert p.shape == (1, f.shape[1], f.shape[2], 512)


def test_learned_pe_converter_roundtrip():
    from birdsoundclassif_tpu.config import NbmConfig
    from birdsoundclassif_tpu.models.torch_convert import (
        params_to_state_dict,
        state_dict_to_params,
    )

    cfg = NbmConfig()
    cfg.position_embedding = "learned"
    cfg.set_derived()
    params = {"backbone": {"pos_embed": learned_pe_init(jax.random.PRNGKey(2))}}
    sd = params_to_state_dict(params, cfg)
    assert "backbone.1.row_embed.weight" in sd
    back = state_dict_to_params(sd, cfg)
    np.testing.assert_array_equal(
        np.asarray(back["backbone"]["pos_embed"]["col_embed"]),
        np.asarray(params["backbone"]["pos_embed"]["col_embed"]),
    )
