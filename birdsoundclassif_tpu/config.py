"""Typed configuration for the NBM TPU detector.

One dataclass is the single source of truth, replacing the reference's ~70
argparse flags (reference: nbm_model/train.py:21-168) plus the magic constants
that live outside its config (reference: nbm_datasets/prepare_dataset.py:96-138,
nets/util/nets_utils.py:13,586).

The JSON (de)serialization is compatible with the reference's dumped
``args`` file (reference: train.py:286-288, run_detection.py:89-99), so a
config saved by the PyTorch code can be loaded directly.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass
from typing import Tuple

import numpy as np


@dataclass(frozen=True)
class FrontendConfig:
    """Audio front-end invariants.

    These values define the pixel grid of the spectrogram "images" and hence
    every box coordinate downstream; they must match the reference exactly
    (reference: prepare_dataset.py:96-138 and process_file defaults :108).
    """

    sample_rate: int = 44_100               # FREQ
    freq_accuracy: float = 33.3             # requested Hz/px (actual derived)
    dt: float = 0.003                       # requested s/px (actual derived)
    h_pix: int = 375                        # H_PIX: spectrogram rows kept
    low_freq_request: float = 500.0         # LOW_FREQ before derivation
    w_pix: int = 1024                       # window width in px
    overlap_spectro: float = 0.2            # window overlap fraction
    db_floor: float = -100.0                # amp_to_db min level (dB)
    stft_chunk_samples: int = int(5e7)      # per-chunk STFT bound (:234)
    long_file_samples: int = int(15e7)      # host split threshold (:194)

    # ---- derived (exact integer arithmetic as in the reference) ----
    @property
    def win_length(self) -> int:
        """n_fft = int(44100 / 33.3) = 1324 (reference :125)."""
        return int(self.sample_rate / self.freq_accuracy)

    @property
    def hop_length(self) -> int:
        """hop = int(44100 * 0.003) = 132 (reference :126)."""
        return int(self.sample_rate * self.dt)

    @property
    def freq_accuracy_actual(self) -> float:
        """44100 / 1324 ≈ 33.308 Hz/px (reference :130)."""
        return self.sample_rate / self.win_length

    @property
    def dt_actual(self) -> float:
        """Actual seconds per pixel ≈ 2.9932 ms (reference :127-131)."""
        overlap_fft = np.round(1 - self.hop_length / self.win_length, 3)
        return int((1 - overlap_fft) * self.win_length) / self.sample_rate

    @property
    def low_idx(self) -> int:
        """First kept STFT row = 16 (reference :134)."""
        return 1 + int(self.low_freq_request / self.freq_accuracy_actual)

    @property
    def high_idx(self) -> int:
        return self.low_idx + self.h_pix

    @property
    def low_freq(self) -> float:
        """Frequency of kept row 0 ≈ 499.6 Hz (reference :137)."""
        return (self.low_idx - 1) * self.freq_accuracy_actual

    @property
    def high_freq(self) -> float:
        return (self.high_idx - 1) * self.freq_accuracy_actual

    @property
    def hop_spectro(self) -> int:
        """Window hop = int(0.8 * 1024) = 819 (reference :115)."""
        return int((1 - self.overlap_spectro) * self.w_pix)

    @property
    def n_freq_bins(self) -> int:
        """rFFT bin count = n_fft // 2 + 1 = 663."""
        return self.win_length // 2 + 1


# Fields the reference recomputes post-load (setattr_others,
# nets_utils.py:405-416) — excluded from JSON round-trips.
_DERIVED_FIELDS = ("ratios", "n_layers", "top_size", "scales")


@dataclass
class NbmConfig:
    """Full detector + training configuration (defaults = reference defaults)."""

    # general / optimization (train.py:25-43)
    lr: float = 1e-4
    lr_backbone: float = 1e-5
    batch_size: int = 2
    weight_decay: float = 1e-4
    lr_drop: int = 383
    clip_max_norm: float = 0.1
    model_name: str = "new_model"
    data_path: str = "dataset"
    save_dir: str = "models"
    max_steps: float = 5e5
    first_neg_step: float = 0
    neg_step_freq: int = 10
    save_step: float | None = None
    img_width: int = 1024
    img_height: int = 375
    inpt_channels: int = 1

    # backbone (train.py:46-59)
    backbone: str = "resnet50"
    dilation: bool = False
    position_embedding: str = "sine"
    add_posenc: bool = False
    one_dim_posenc: bool = True
    norm_layer_backbone: str = "frozen_batchnorm"

    # loss coefficients (train.py:62-69)
    fs_cls_loss_coef: float = 1.0
    fs_neg_cls_loss_coef: float = 1.0
    fs_reg_loss_coef: float = 1.0
    sec_cls_loss_coef: float = 1.0
    sec_neg_cls_loss_coef: float = 1.0
    sec_reg_loss_coef: float = 1.0
    focal_loss: bool = False
    fixed_neg_objective: bool = False  # opt-in: stage-1 hard-negative loss
                                      # as the reference INTENDS (bg CE over
                                      # the rcnn_batch_size*20 most confident
                                      # anchors) instead of its degenerate
                                      # top-1 collapse (PARITY.md dev. 10)

    device: str = "tpu"
    seed: int = 42
    num_workers: int = 4

    # anchors & FRCNN (train.py:77-124)
    n_ratios: int = 3
    anchor_stride: int = 16
    base_size: int = 16
    rpn_neg_label: float = 0.3
    rpn_pos_label: float = 0.7
    rpn_batchsize: int = 16
    rpn_fg_fraction: float = 0.5
    rcnn_batch_size: int = 16
    rcnn_fg_prop: float = 0.4
    fg_threshold: float = 0.5
    bg_threshold_lo: float = 0.1
    bg_threshold_hi: float = 0.5
    depth_rcnn: int = 3
    pre_nms_topN: int = 3000
    min_threshold: int = 5
    nms_thresh: float = 0.7
    post_nms_topN: int = 1000
    post_nms_topN_eval: int = 50
    pre_nms_topN_eval: int = 500
    roi_pool_h: int = 2
    roi_pool_w: int = 2
    hidden_size_rcnn: int = 512
    dropout: float = 0.0
    proposal_number: int = 50

    # FPN (train.py:127-140)
    fpn: str = "fpn"
    n_bifpn_layers: int = 5
    fpn_p_chan: int = 384
    out_fpn_chan: int = 256
    fpn_first: bool = False
    sandwich_attn: bool = False

    # transformer RCNN variant (train.py:143-154)
    tf_rcnn: bool = False
    tf_pe_qk: bool = False
    tf_model_dim: int = 512
    tf_nhead: int = 8
    tf_num_encoder_layers: int = 6
    tf_dim_feedforward: int = 1024

    # attention / classes (train.py:159-161)
    pyramid_top_n_attn: int = 2
    num_classes: int = 150
    validation_prop: float = 0.03

    # ---- TPU-native additions (not in the reference) ----
    compute_dtype: str = "bfloat16"   # backbone/FPN/attn matmul dtype
    param_dtype: str = "float32"
    batch_transfer_dtype: str = "float32"
                                      # dtype the training batch images are
                                      # shipped to the device in. "bfloat16"
                                      # halves the H2D bytes/step (the link is
                                      # the bottleneck behind the dev tunnel)
                                      # and is bitwise-identical compute when
                                      # compute_dtype is bfloat16: the model's
                                      # first op casts samples there anyway
                                      # (models/detector.py forward_first_stage)
    ablate_roi_pe: bool = False       # eval diagnostic: zero the RoI
                                      # positional encoding before the RCNN
                                      # head. The PE encodes ABSOLUTE box
                                      # coordinates (reference
                                      # layers.py:482-489); on a corpus
                                      # where species have fixed bands it
                                      # lets the head classify by frequency
                                      # position alone — this knob measures
                                      # that leak (ATTRIBUTION_r5.json)
    neutral_roi_pe: bool = False      # eval diagnostic: every RoI's PE is
                                      # computed for a FIXED mid-height
                                      # frequency band (own time extent) —
                                      # in-distribution magnitudes, zero
                                      # frequency-position information.
                                      # The sharper version of
                                      # ablate_roi_pe (zeroing collapses
                                      # the FiLM head outright); see
                                      # ATTRIBUTION_r5.json
    rpn_head_f32: bool = True         # run the stage-1 RPN head (depthwise
                                      # conv + BN + 1x1 heads) in float32
                                      # regardless of compute_dtype. The r4
                                      # campaign found training takeoff is
                                      # BISTABLE under compile-level bf16
                                      # reduction-order noise, and the dead
                                      # basin lives exactly here: the RPN
                                      # head behind its BN (running var up
                                      # to 2e4) emitting ~constant 0.5
                                      # objectness (docs/BENCH.md r4). The
                                      # head is <1% of step FLOPs; f32
                                      # removes the numerical knife-edge.
                                      # DEFAULT TRUE since the r5 on-chip
                                      # 4-seed A/B (AB_TAKEOFF_r5.json /
                                      # docs/BENCH.md r5): bf16 controls
                                      # sat FLAT in the saddle 3/4 seeds;
                                      # f32 arms descended in 4/4 (3/4
                                      # crossed fcl 0.3 within 1.5k steps).
                                      # Memory note: the f32 activation
                                      # casts need microbatch <= 4 at the
                                      # flagship 375x1024/batch-16 config
                                      # (grad_accum_steps >= 4) — a
                                      # measured ResourceExhausted at
                                      # microbatch 8 (docs/BENCH.md r5).
                                      # The takeoff watchdog in
                                      # scripts/train_hard.py remains as
                                      # belt-and-suspenders.
    quantize_fpn: bool = False        # opt-in int8 inference for the FPN
                                      # 3x3 out-convs (ops/qconv.py): per-
                                      # channel int8 weights folded at load,
                                      # per-image dynamic activation scales.
                                      # 2x MXU peak on the forward's largest
                                      # block; approximate (docs/BENCH.md)
    max_gt_boxes: int = 48            # fixed-shape padding of GT boxes
    merge_nms_max_boxes: int = 8192   # cap for the cross-window merge NMS
    remat_backbone: bool = False      # jax.checkpoint the backbone in training
                                      # (trades FLOPs for activation memory)
    grad_accum_steps: int = 1         # split each optimizer batch into this
                                      # many sequential microbatches (scanned
                                      # in one traced step): optimizer-step
                                      # batch sizes beyond the HBM wall at
                                      # one microbatch's activation footprint
    device_augment: bool = False      # run the training augmentations on
                                      # device (data/device_aug.py): the host
                                      # ships uint8 window bytes or bank
                                      # indices + a dozen aug scalars instead
                                      # of float images — 2-4x fewer wire
                                      # bytes/step on link-bound hosts
    aug_bank_mb: int = 1024           # HBM budget for device-resident uint8
                                      # sample banks (device_augment mode);
                                      # pools that fit are indexed on device
                                      # with ~zero per-step wire traffic
    eval_every: int = 500             # validation + test-AP cadence in steps.
                                      # The reference hardcodes 500
                                      # (train.py:361); long runs raise it so
                                      # the every-eval test sweep doesn't
                                      # dominate wall time (docs/TRAINING.md)
    ckpt_every_steps: int = 0         # >0: additionally save the full
                                      # resumable ckpt_last every N steps. The
                                      # reference only saves 'last' every 10
                                      # epochs (train.py:400-401), which on a
                                      # small corpus can be hours apart —
                                      # step-based saves bound what a crash
                                      # costs on long runs (VERDICT r3 weak 3)
    remat_granularity: str = "stages"  # "stages": one checkpoint per resnet
                                      # stage + attn + FPN (backward peak =
                                      # boundaries + one stage); "blocks":
                                      # per-bottleneck (lowest peak, but the
                                      # many-region HLO breaks the remote
                                      # compile helper above B=8); "trunk":
                                      # one checkpoint around the whole trunk

    def __post_init__(self) -> None:
        self.set_derived()

    # hashable so a config can be a jit static argument (derived fields are
    # pure functions of the declared ones, so the JSON dump is a sound key)
    def __hash__(self) -> int:
        return hash(self.to_json())

    def __eq__(self, other) -> bool:
        return isinstance(other, NbmConfig) and self.to_json() == other.to_json()

    # reference: setattr_others (nets_utils.py:405-416)
    def set_derived(self) -> None:
        if self.n_ratios == 3:
            self.ratios = (0.5, 1.0, 2.0)
        elif self.n_ratios == 5:
            self.ratios = (0.2, 0.5, 1.0, 2.0, 5.0)
        else:
            raise ValueError(f"unsupported n_ratios={self.n_ratios}")
        if "vgg" in self.backbone:
            self.n_layers = 4
            self.top_size = (23, 64)
        else:
            self.n_layers = 5
            self.top_size = (24, 64)
        self.scales = tuple(int(2 ** i) for i in range(self.n_layers))

    # ---- convenience ----
    @property
    def num_anchors_per_cell(self) -> int:
        return self.n_ratios * self.n_layers

    @property
    def frontend(self) -> FrontendConfig:
        return FrontendConfig(w_pix=self.img_width, h_pix=self.img_height)

    def to_json(self) -> str:
        d = {
            f.name: getattr(self, f.name)
            for f in dataclasses.fields(self)
        }
        return json.dumps(d)

    @classmethod
    def from_json(cls, text: str) -> "NbmConfig":
        """Load either our JSON or a reference-style ``args`` dump."""
        raw = json.loads(text)
        names = {f.name for f in dataclasses.fields(cls)}
        kwargs = {k: v for k, v in raw.items() if k in names and k not in _DERIVED_FIELDS}
        # rpn_head_f32 flipped default False -> True in r5. A saved config
        # predating the field was trained with the bf16 head; absence must
        # keep meaning bf16 so old checkpoints evaluate exactly as trained
        # (reference-style args dumps predate it too).
        kwargs.setdefault("rpn_head_f32", False)
        return cls(**kwargs)

    @classmethod
    def load(cls, path: str) -> "NbmConfig":
        with open(path, "r") as f:
            return cls.from_json(f.read())

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            f.write(self.to_json())


# fields set dynamically by set_derived (declared for type checkers)
NbmConfig.ratios: Tuple[float, ...]
NbmConfig.n_layers: int
NbmConfig.top_size: Tuple[int, int]
NbmConfig.scales: Tuple[int, ...]
