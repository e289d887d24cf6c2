"""Integration: the in-training test-eval path (run_detection over a test
directory with Audacity ground truth -> AP scores), as the training driver
invokes it every 500 steps (reference: train.py:389-396)."""

import wave

import numpy as np
import jax
import pytest

from birdsoundclassif_tpu.config import NbmConfig
from birdsoundclassif_tpu.models import NbmModel
from birdsoundclassif_tpu.eval.ap import evaluate_test_dir


def write_wav(path, samples, sr=44100):
    x = (np.clip(samples, -1, 1) * 32767).astype("<i2")
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(x.tobytes())


def test_evaluate_test_dir(tmp_path, rng):
    cfg = NbmConfig()
    cfg.num_classes = 5
    cfg.out_fpn_chan = 16
    cfg.fpn_p_chan = 24
    cfg.depth_rcnn = 1
    cfg.img_height, cfg.img_width = 128, 256
    cfg.pre_nms_topN_eval = 64
    cfg.post_nms_topN_eval = 16
    params = NbmModel.init(jax.random.PRNGKey(0), cfg)

    d = tmp_path / "XC_annots"
    d.mkdir()
    sr = 44100
    t = np.arange(sr * 2) / sr
    sig = 0.05 * rng.standard_normal(len(t))
    sig[(t > 0.5) & (t < 1.0)] += 0.4 * np.sin(2 * np.pi * 2000 * t[(t > 0.5) & (t < 1.0)])
    write_wav(d / "turdus_merula#1.wav", sig)
    (d / "turdus_merula#1.txt").write_text(
        "0.50\t1.00\tTurdus merula\n\\\t1500\t2500\n"
    )

    metrics = evaluate_test_dir(params, cfg, str(d), min_score=0.0, bs=4)
    assert set(metrics) == {"AP", "mAP", "Rec", "mRec"}
    for v in metrics.values():
        assert np.isfinite(v)
        assert 0.0 <= v <= 1.0 or v == -1
