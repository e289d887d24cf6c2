"""Device-side augmentation (data/device_aug.py): closed-form Butterworth
mask vs the scipy host implementation, op-for-op parity of assemble_image
with the host pipeline given the same noise, bank/stream loader formats,
and driver integration with --device_augment."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from birdsoundclassif_tpu.data import device_aug as da


class TestButterworthClosedForm:
    @pytest.mark.parametrize("cutoff", [500, 1713, 5000, 9999])
    def test_matches_scipy(self, cutoff):
        from birdsoundclassif_tpu.data.image_dataset import (
            _butterworth_lowpass_mask,
        )

        host = _butterworth_lowpass_mask(float(cutoff), 375)
        dev = np.asarray(
            da.butterworth_logmask(jnp.asarray([float(cutoff)]), 375)
        )[0]
        np.testing.assert_allclose(dev, host, rtol=1e-5, atol=1e-6)


def _fake_batch_and_banks(rng, b=2, h=16, w=24, bank_mode=True):
    pos = rng.integers(0, 256, (5, h, w)).astype(np.uint8)
    neg = rng.integers(0, 256, (4, h, w)).astype(np.uint8)
    hard = rng.integers(0, 256, (3, h, w)).astype(np.uint8)
    batch = {
        "aug_seed": rng.integers(0, 1 << 31, b).astype(np.uint32),
        "aug_use_noise": np.ones(b, bool),
        "aug_gain": rng.uniform(-0.1, 0.35, b).astype(np.float32),
        "aug_use_hard": np.array([True, False][:b] + [True] * max(0, b - 2)),
        "hard_idx": rng.integers(0, 3, b).astype(np.int32),
        "aug_hard_coef": rng.uniform(0.1, 0.4, b).astype(np.float32),
        "aug_neg_coef": rng.uniform(0.5, 0.99, b).astype(np.float32),
        "aug_use_butter": np.array([True] * b),
        "aug_cutoff": rng.integers(500, 10000, b).astype(np.float32),
    }
    pos_pick = rng.integers(0, 5, b).astype(np.int32)
    neg_pick = rng.integers(0, 4, b).astype(np.int32)
    if bank_mode:
        batch["pos_idx"], batch["neg_idx"] = pos_pick, neg_pick
        banks = da.AugBanks(pos=jnp.asarray(pos), neg=jnp.asarray(neg),
                            hard=jnp.asarray(hard))
    else:
        batch["pos_u8"] = pos[pos_pick]
        batch["neg_u8"] = neg[neg_pick]
        banks = da.AugBanks(pos=None, neg=None, hard=jnp.asarray(hard))
    return batch, banks, pos[pos_pick], neg[neg_pick], hard


@pytest.mark.parametrize("bank_mode", [True, False])
class TestAssembleImage:
    def test_positive_matches_host_math(self, bank_mode):
        """Same op order as ImgDataset's host transform
        (image_dataset.py:101-119), checked in numpy with the SAME noise
        the device drew (RNG backend differs by design; everything else
        must be exact)."""
        rng = np.random.default_rng(0)
        batch, banks, pos_u8, _, hard_u8 = _fake_batch_and_banks(
            rng, bank_mode=bank_mode)
        out = np.asarray(da.assemble_image(batch, banks, negative=False))

        # replay the device noise: fold_in(base, seed) -> normal
        img = pos_u8.astype(np.float32) / 255.0
        hard = hard_u8[batch["hard_idx"]].astype(np.float32) / 255.0
        expect = np.empty_like(img)
        from birdsoundclassif_tpu.data.image_dataset import (
            _butterworth_lowpass_mask,
        )

        for i in range(img.shape[0]):
            k = jax.random.fold_in(da._NOISE_BASE, np.uint32(batch["aug_seed"][i]))
            noise = np.asarray(jax.random.normal(k, img.shape[1:], jnp.float32))
            noise = np.clip(noise * (img[i].std() / 2.0), -0.5, 0.5)
            x = img[i] + batch["aug_gain"][i] + noise
            coef = batch["aug_hard_coef"][i] if batch["aug_use_hard"][i] else 0.0
            x = (x + coef * hard[i]) / (1.0 + coef)
            if batch["aug_use_butter"][i]:
                x = x + _butterworth_lowpass_mask(
                    float(batch["aug_cutoff"][i]), img.shape[1])[:, None]
            expect[i] = x
        np.testing.assert_allclose(out, expect, rtol=2e-5, atol=2e-5)

    def test_negative_hard_mixing_only(self, bank_mode):
        rng = np.random.default_rng(1)
        batch, banks, _, neg_u8, hard_u8 = _fake_batch_and_banks(
            rng, bank_mode=bank_mode)
        out = np.asarray(da.assemble_image(batch, banks, negative=True))
        neg = neg_u8.astype(np.float32) / 255.0
        hard = hard_u8[batch["hard_idx"]].astype(np.float32) / 255.0
        for i in range(neg.shape[0]):
            coef = batch["aug_neg_coef"][i] if batch["aug_use_hard"][i] else 0.0
            np.testing.assert_allclose(
                out[i], (neg[i] + coef * hard[i]) / (1.0 + coef),
                rtol=1e-6, atol=1e-6)

    def test_disabled_augs_are_identity(self, bank_mode):
        """transform=False items (all gates off, gain 0) must reproduce the
        raw window bit-for-bit (up to the /255 f32 quantization both modes
        share)."""
        rng = np.random.default_rng(2)
        batch, banks, pos_u8, _, _ = _fake_batch_and_banks(
            rng, bank_mode=bank_mode)
        b = len(batch["aug_gain"])
        batch.update({
            "aug_use_noise": np.zeros(b, bool),
            "aug_gain": np.zeros(b, np.float32),
            "aug_use_hard": np.zeros(b, bool),
            "aug_use_butter": np.zeros(b, bool),
        })
        out = np.asarray(da.assemble_image(batch, banks, negative=False))
        np.testing.assert_array_equal(out, pos_u8.astype(np.float32) / 255.0)

    def test_noise_statistics(self, bank_mode):
        """The threefry noise must have the host distribution: mean 0,
        std = img.std()/2 (pre-clip), clipped to [-0.5, 0.5]."""
        rng = np.random.default_rng(3)
        batch, banks, pos_u8, _, _ = _fake_batch_and_banks(
            rng, b=2, h=64, w=96, bank_mode=bank_mode)
        b = len(batch["aug_gain"])
        batch.update({
            "aug_gain": np.zeros(b, np.float32),
            "aug_use_hard": np.zeros(b, bool),
            "aug_use_butter": np.zeros(b, bool),
        })
        out = np.asarray(da.assemble_image(batch, banks, negative=False))
        resid = out - pos_u8.astype(np.float32) / 255.0
        for i in range(b):
            want = pos_u8[i].astype(np.float32).std() / 255.0 / 2.0
            assert abs(resid[i].mean()) < 4 * want / np.sqrt(resid[i].size)
            np.testing.assert_allclose(resid[i].std(), want, rtol=0.1)
            # the residual is reconstructed by subtraction, so the clip
            # bound carries one ulp of f32 rounding
            assert np.abs(resid[i]).max() <= 0.5 + 1e-6


class TestLoaderFormats:
    def test_device_items_collate(self, tmp_path):
        """Dataset device mode emits index or byte items; collate stacks
        them with the GT padding unchanged."""
        from birdsoundclassif_tpu.data.image_dataset import (
            ImgDataset, collate_batch,
        )

        ds = _tiny_png_dataset(tmp_path)
        ds.device_mode = True
        for bank_pos, bank_neg in [(True, True), (False, False)]:
            ds.bank_positives, ds.bank_negatives = bank_pos, bank_neg
            items = [ds[i] for i in range(2)]
            batch = collate_batch(items, max_gt=4)
            assert batch["gt_boxes"].shape == (2, 4, 4)
            if bank_pos:
                assert batch["pos_idx"].shape == (2,)
                assert "pos_u8" not in batch
            else:
                assert batch["pos_u8"].dtype == np.uint8
            assert batch["aug_seed"].dtype == np.uint32

    def test_build_banks_budget(self, tmp_path):
        """Pools that blow cfg.aug_bank_mb stream; pools that fit bank."""
        from birdsoundclassif_tpu.config import NbmConfig

        ds = _tiny_png_dataset(tmp_path)
        cfg = NbmConfig()
        cfg.aug_bank_mb = 1024
        banks = da.build_banks(ds, cfg)
        assert banks.pos is not None and banks.neg is not None
        assert ds.bank_positives and ds.bank_negatives
        assert banks.hard.shape[0] == 1  # zero stand-in, no hard pool

        ds2 = _tiny_png_dataset(tmp_path)
        cfg.aug_bank_mb = 0
        banks2 = da.build_banks(ds2, cfg)
        assert banks2.pos is None and banks2.neg is None
        assert not ds2.bank_positives and not ds2.bank_negatives


class TestMeshMode:
    def test_replicated_banks_sharded_batch(self):
        """Mesh mode: banks replicate (read-only lookup tables), the
        per-item batch leaves shard over the data axis, and the sharded
        assemble_image matches the single-device result exactly."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from birdsoundclassif_tpu.parallel.tp import (
            make_mesh_2d, shard_batch_2d,
        )

        rng = np.random.default_rng(4)
        batch, banks, _, _, _ = _fake_batch_and_banks(rng, b=8)
        want = np.asarray(da.assemble_image(batch, banks, negative=False))

        mesh = make_mesh_2d(jax.devices()[:8], model_parallel=2)
        sbanks = da.replicate_banks(banks, mesh)
        for leaf in [sbanks.pos, sbanks.neg, sbanks.hard]:
            assert leaf.sharding.is_equivalent_to(
                NamedSharding(mesh, P()), leaf.ndim)
        sbatch = shard_batch_2d(batch, mesh)

        fn = jax.jit(lambda b, bk: da.assemble_image(b, bk, negative=False))
        out = fn(sbatch, sbanks)
        # output stays sharded over the data axis (no accidental gather)
        assert len(out.sharding.device_set) == 8
        # jit fusion/reduction order may differ from the eager reference
        # by f32 ulps (the noise scale divides by a reduced std)
        np.testing.assert_allclose(np.asarray(out), want,
                                   rtol=1e-6, atol=1e-6)


def _tiny_png_dataset(tmp_path):
    """Minimal on-disk dataset: 3 positive windows + annotations, 2 negative
    windows, no hard_neg pool."""
    import imageio.v2 as imageio

    from birdsoundclassif_tpu.data.image_dataset import ImgDataset

    root = tmp_path / f"ds{np.random.randint(1 << 30)}"
    rng = np.random.default_rng(7)
    posd = root / "positive_files" / "rec_a"
    negd = root / "negative_files" / "rec_a"
    posd.mkdir(parents=True)
    negd.mkdir(parents=True)
    rows = []
    for i in range(3):
        imageio.imwrite(posd / f"rec_a__{i}.png",
                        rng.integers(0, 256, (16, 24)).astype(np.uint8))
        rows.append(f"{i};[[2.0, 3.0, 10.0, 12.0]];[5]")
    (posd / "annotations.csv").write_text(
        "index;coord;bird_id\n" + "\n".join(rows) + "\n")
    for i in range(2):
        imageio.imwrite(negd / f"rec_a__{i}.png",
                        rng.integers(0, 256, (16, 24)).astype(np.uint8))
    return ImgDataset(str(root), transform=True, rng=np.random.default_rng(0))
