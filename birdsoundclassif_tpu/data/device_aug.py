"""Device-side training augmentation + device-resident sample banks.

TPU-native addition (no reference equivalent: the reference augments on
the host inside Img_dataset, reference: nbm_datasets/image_dataset.py:64-101,
and ships float32 tensors to the accelerator every step).

Why: training through a narrow host link is *transfer*-bound. The flagship
batch (16 x 375 x 1024) is 24.6 MB/step as float32 pairs and 12.3 MB as
bfloat16 — at the dev tunnel's 18-46 MB/s that is 0.5-1.4 s/step against a
343 ms device step (docs/BENCH.md). The spectrogram windows live on disk as
uint8 PNGs, so everything past the PNG bytes is recomputable; this module
moves that recomputation onto the device:

  host:   per item, draw the augmentation *parameters* only (a dozen
          scalars: gain, noise seed, hard-negative index + mix coefs,
          Butterworth cutoff) and ship either the raw uint8 window bytes
          (stream mode, 2-4x fewer wire bytes than float/bf16) or — when
          the corpus fits a configurable HBM budget — just an int32 index
          into a device-resident uint8 bank (bank mode, ~zero wire bytes).
  device: uint8 -> f32/255, additive noise from a folded-in PRNG seed,
          random gain, hard-negative mixing from the (always-banked) hard
          pool, and the 1st-order Butterworth low-pass log-mask in closed
          form. All of it traces into the train step, where XLA fuses it
          with the model's first cast; the math is identical op-for-op to
          the host pipeline (data/image_dataset.py) apart from the noise
          RNG (threefry vs numpy Philox — same distribution, different
          bits; every deterministic op is covered by an exactness test).

The banks are passed to the jitted step as *arguments* (committed device
arrays, re-passed by handle each call), never closed over — closure
capture would embed hundreds of MB as HLO literals in the AOT-compiled
program shipped through the tunnel.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

# frequency-axis geometry of the spectrogram windows (SURVEY §6: rows start
# at ~500 Hz in ~33.3 Hz steps; reference: image_dataset.py:86-92 evaluates
# the filter at 500 + arange(h) * freq_accuracy)
_FREQ0_HZ = 500.0
_FREQ_ACCURACY_HZ = 33.3

# base key for the per-item noise streams; per-item seeds (drawn by the
# host dataset rng, so runs stay reproducible from cfg.seed) are folded in
_NOISE_BASE = jax.random.PRNGKey(2477)


class AugBanks(NamedTuple):
    """Device-resident uint8 sample pools. `hard` is always present (the
    hard-negative pool is curated and small; a zero window stands in when
    the dataset has none). `pos`/`neg` are None in stream mode."""

    pos: Optional[jnp.ndarray]   # (n_pos, h, w) uint8 or None
    neg: Optional[jnp.ndarray]   # (n_neg, h, w) uint8 or None
    hard: jnp.ndarray            # (max(n_hard, 1), h, w) uint8


def butterworth_logmask(cutoff_hz: jnp.ndarray, h_pix: int) -> jnp.ndarray:
    """Closed form of data/image_dataset._butterworth_lowpass_mask.

    scipy's `butter(1, 2*pi*fc, 'low', analog=True)` is H(s) = wc/(s + wc)
    with wc = 2*pi*fc, so |H(jw)| = wc / sqrt(wc^2 + w^2) exactly — no
    polynomial evaluation needed on device. Returns the log-space gain
    column 0.5*log10(clip(|H|, 1e-9)) per batch item, shape (b, h_pix).
    """
    w = 2.0 * jnp.pi * (
        _FREQ0_HZ + jnp.arange(h_pix, dtype=jnp.float32) * _FREQ_ACCURACY_HZ
    )
    wc = 2.0 * jnp.pi * cutoff_hz.astype(jnp.float32)[:, None]
    mag = wc / jnp.sqrt(wc * wc + w[None, :] * w[None, :])
    return 0.5 * jnp.log10(jnp.clip(mag, 1e-9, None))


def _fetch(batch, banks: Optional[AugBanks], kind: str) -> jnp.ndarray:
    """(b, h, w) float32 in [0, 1]: bank gather or streamed uint8 bytes."""
    bank = getattr(banks, kind, None) if banks is not None else None
    if bank is not None:
        u8 = bank[batch[f"{kind}_idx"]]
    else:
        u8 = batch[f"{kind}_u8"]
    return u8.astype(jnp.float32) / 255.0


def assemble_image(batch, banks: Optional[AugBanks],
                   negative: bool) -> jnp.ndarray:
    """The device twin of ImgDataset.__getitem__'s transform block
    (data/image_dataset.py:101-119; reference: image_dataset.py:64-101).
    Same op order: noise scale from the RAW image std, then + gain,
    + noise, hard-negative mixing, Butterworth log-mask. Disabled augs are
    exact no-ops (coef 0 keeps (img + 0)/(1 + 0) bitwise)."""
    if negative:
        # the negative window only receives hard-negative mixing
        neg = _fetch(batch, banks, "neg")
        hard = _fetch(batch, banks, "hard")
        coef = jnp.where(batch["aug_use_hard"],
                         batch["aug_neg_coef"], 0.0)[:, None, None]
        return (neg + coef * hard) / (1.0 + coef)

    img = _fetch(batch, banks, "pos")
    hard = _fetch(batch, banks, "hard")
    std = jnp.std(img, axis=(1, 2), keepdims=True)
    keys = jax.vmap(lambda s: jax.random.fold_in(_NOISE_BASE, s))(
        batch["aug_seed"])
    noise = jax.vmap(
        lambda k: jax.random.normal(k, img.shape[1:], jnp.float32))(keys)
    noise = jnp.clip(noise * (std / 2.0), -0.5, 0.5)
    use_noise = batch["aug_use_noise"].astype(jnp.float32)[:, None, None]
    img = img + batch["aug_gain"][:, None, None] + noise * use_noise
    coef = jnp.where(batch["aug_use_hard"],
                     batch["aug_hard_coef"], 0.0)[:, None, None]
    img = (img + coef * hard) / (1.0 + coef)
    col = butterworth_logmask(batch["aug_cutoff"], img.shape[1])
    img = img + jnp.where(batch["aug_use_butter"][:, None], col, 0.0)[:, :, None]
    return img


def build_banks(dataset, cfg) -> AugBanks:
    """Load the uint8 pools and decide what fits on device.

    The hard pool is always banked (zero window when absent). The
    positive pool is banked first (it is wire traffic on EVERY step),
    then the negative pool (traffic on 1/neg_step_freq of steps), while
    the running total stays under cfg.aug_bank_mb. Marks the dataset's
    bank_positives/bank_negatives so its device-mode items emit indices
    instead of bytes, and returns committed device arrays.
    """
    budget = float(cfg.aug_bank_mb) * 1e6

    def load(sub, names):
        return np.stack([dataset.load_png_u8(sub, n) for n in names])

    if dataset.hard_negative_files:
        hard = load("hard_neg", dataset.hard_negative_files)
    else:
        probe = dataset.load_png_u8(
            "positive_files", dataset.positive_files[0])
        hard = np.zeros((1,) + probe.shape, np.uint8)
    budget -= hard.nbytes

    pos = neg = None
    probe = dataset.load_png_u8("positive_files", dataset.positive_files[0])
    pos_bytes = probe.size * len(dataset.positive_files)
    if pos_bytes <= budget:
        pos = load("positive_files", dataset.positive_files)
        budget -= pos.nbytes
    neg_bytes = probe.size * len(dataset.negative_files)
    if dataset.negative_files and neg_bytes <= budget:
        neg = load("negative_files", dataset.negative_files)

    dataset.device_mode = True
    dataset.bank_positives = pos is not None
    dataset.bank_negatives = neg is not None
    put = jax.device_put
    return AugBanks(
        pos=put(pos) if pos is not None else None,
        neg=put(neg) if neg is not None else None,
        hard=put(hard),
    )


def replicate_banks(banks: AugBanks, mesh) -> AugBanks:
    """Mesh mode: banks are read-only lookup tables — replicate them (the
    per-item batch leaves are what shard over the data axis).

    Multi-host: device_put of host data onto a mesh with devices this
    process cannot address is illegal; every process holds the same pools
    (build_banks is deterministic given the dataset), so each device
    fetches its full copy via make_array_from_callback — the same
    discipline as parallel/tp.shard_batch_2d."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = NamedSharding(mesh, P())
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), banks)

    def leaf(x):
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])

    return jax.tree_util.tree_map(leaf, banks)
