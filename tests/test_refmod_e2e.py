"""End-to-end detection parity: the GENUINE reference run_detection.py vs
our infer.pipeline, with IDENTICAL converted weights on identical wavs
(VERDICT r2 next-round #2 — the strongest parity gate available without the
LFS checkpoint artifacts).

Both sides share: the same torch checkpoint (exported from our random-init
params through torch_convert), the same args JSON, the same bird_dict, and
the same wav bytes. The reference runs with torchvision/librosa stand-ins
validated elsewhere (tests/refbridge). Assertions are box-for-box: same
species, same integer box coordinates, scores allclose — compared in a
canonical (score, coords) order, because equal-score candidates (periodic
synthetic tones produce identical logits at translated anchors) come back
in sort-tie order, which torch's sort and our lexsort break differently.
The box/score SETS are exact; only the within-tie order is
implementation-defined on both sides.

Reference: run_detection.py:28-122,163-249; nbm_model.py:66-80,325-341.
"""

import json
import os
import wave

import numpy as np
import pytest
import torch

import refbridge as rb
from birdsoundclassif_tpu.config import NbmConfig
from birdsoundclassif_tpu.infer.pipeline import run_detection as our_run_detection


def write_wav(path, seconds, rng, tones=((3000.0, 0.3, 1.0),), sr=44_100):
    """noise + (freq, start, dur) tone bursts, PCM16 mono."""
    n = int(seconds * sr)
    t = np.arange(n) / sr
    sig = 0.02 * rng.standard_normal(n)
    for freq, start, dur in tones:
        m = (t >= start) & (t < start + dur)
        sig = sig + 0.35 * np.sin(2 * np.pi * freq * t) * m
    pcm = np.clip(np.round(sig * 32767), -32768, 32767).astype(np.int16)
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())


@pytest.fixture(scope="module")
def e2e_dir(tmp_path_factory):
    """Checkpoint dir (args + model_chkpt.pt + bird_dict.json) + wavs."""
    import jax

    from birdsoundclassif_tpu.models.detector import NbmModel
    from birdsoundclassif_tpu.models.torch_convert import params_to_state_dict

    d = tmp_path_factory.mktemp("refmod_e2e")
    cfg = NbmConfig()
    cfg.compute_dtype = "float32"
    cfg.num_classes = 9  # small class count keeps both cascades fast
    params = NbmModel.init(jax.random.PRNGKey(11), cfg)
    sd = {
        k: torch.tensor(np.asarray(v))
        for k, v in params_to_state_dict(params, cfg).items()
    }
    torch.save({"checkpoints": sd}, d / "model_chkpt.pt")
    raw = json.loads(cfg.to_json())
    raw["device"] = "cpu"  # the reference .to()s config.device everywhere
    (d / "args").write_text(json.dumps(raw))
    bird_dict = {f"Species {i}": i for i in range(1, cfg.num_classes + 1)}
    bird_dict["Other"] = cfg.num_classes
    (d / "bird_dict.json").write_text(json.dumps(
        {f"Species {i}": i for i in range(1, cfg.num_classes + 1)}))

    rng = np.random.default_rng(7)
    wavs = []
    # single-window file with reflect-pad tail (1003 px < 1024)
    p = d / "short.wav"
    write_wav(p, 3.0, rng, tones=((2500.0, 0.4, 0.5), (6000.0, 1.8, 0.3)))
    wavs.append(p)
    # exactly one window, no pad: (1024 - 1) * 132 samples
    p = d / "exact.wav"
    write_wav(p, (1023 * 132) / 44100, rng, tones=((4000.0, 0.5, 0.8),))
    wavs.append(p)
    # multi-window file (10 s -> 4 overlapping windows + merge)
    p = d / "long.wav"
    write_wav(p, 10.0, rng, tones=(
        (1500.0, 0.5, 0.6), (3000.0, 2.9, 0.5), (5000.0, 5.0, 1.0),
        (7500.0, 8.7, 0.8)))
    wavs.append(p)
    return d, wavs


def test_reference_and_ours_agree_box_for_box(e2e_dir):
    d, wavs = e2e_dir
    rd = rb.ref("run_detection")
    ref_model, ref_args = rd.load_model(str(d))
    assert ref_model.training is False

    from birdsoundclassif_tpu.infer.pipeline import load_model

    params, cfg = load_model(str(d))

    for wav in wavs:
        with torch.no_grad():
            want = rd.run_detection(
                ref_model, ref_args, str(wav), str(d / "bird_dict.json"),
                min_score=0.001, bs=4)
        got = our_run_detection(
            params, cfg, str(wav), str(d / "bird_dict.json"),
            min_score=0.001, bs=4)

        assert set(got) == set(want), (
            f"{wav.name}: species mismatch {set(got) ^ set(want)}")

        def canonical(boxes, scores):
            """(score desc rounded past float noise, then coords) — a
            side-independent order; exact-score ties land on coords."""
            boxes = np.asarray(boxes, np.float64).reshape(-1, 4)
            scores = np.asarray(scores, np.float64).reshape(-1)
            idx = np.lexsort(
                (boxes[:, 3], boxes[:, 2], boxes[:, 1], boxes[:, 0],
                 -np.round(scores, 4)))
            return boxes[idx], scores[idx]

        for sp in want:
            w_boxes, w_scores = canonical(want[sp]["bbox_coord"],
                                          want[sp]["scores"])
            g_boxes, g_scores = canonical(got[sp]["bbox_coord"],
                                          got[sp]["scores"])
            assert g_boxes.shape == w_boxes.shape, (
                f"{wav.name}/{sp}: {g_boxes.shape} vs {w_boxes.shape}")
            np.testing.assert_array_equal(
                g_boxes, w_boxes, err_msg=f"{wav.name}/{sp}")
            np.testing.assert_allclose(
                g_scores, w_scores, rtol=2e-4, atol=1e-6,
                err_msg=f"{wav.name}/{sp}")
