"""Training-driver integration: ETL dataset -> driver main() for a few
steps -> checkpoint artifacts -> resume continues from the saved step."""

import json
import os
import wave

import numpy as np
import pytest

from birdsoundclassif_tpu.data.etl import prepare_dataset


def write_wav(path, samples, sr=44100):
    x = (np.clip(samples, -1, 1) * 32767).astype("<i2")
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(x.tobytes())


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    rng = np.random.default_rng(0)
    tmp = tmp_path_factory.mktemp("drv")
    rec = tmp / "rec"
    rec.mkdir()
    sr = 44100
    t = np.arange(sr * 7) / sr
    sig = 0.02 * rng.standard_normal(len(t))
    m = (t > 1.0) & (t < 2.0)
    sig[m] += 0.5 * np.sin(2 * np.pi * 3000 * t[m])
    write_wav(rec / "turdus_merula#XC9.wav", sig, sr)
    (rec / "turdus_merula#XC9.txt").write_text(
        "1.00\t2.00\tTurdus merula\n\\\t2500\t3500\n"
    )
    out = tmp / "dataset"
    prepare_dataset(str(rec), str(out))
    return out


def _flags(dataset_dir, save_root, max_steps):
    return [
        "--data_path", str(dataset_dir),
        "--save_dir", str(save_root),
        "--model_name", "itest",
        "--batch_size", "1",
        "--max_steps", str(max_steps),
        "--out_fpn_chan", "16",
        "--fpn_p_chan", "24",
        "--depth_rcnn", "1",
        "--pre_nms_topN", "256",
        "--post_nms_topN", "64",
        "--max_gt_boxes", "4",
        "--validation_prop", "0",
        "--first_neg_step", "100",  # keep all steps positive
        "--compute_dtype", "float32",
    ]


def test_driver_runs_and_resumes(dataset_dir, tmp_path):
    from birdsoundclassif_tpu.train import driver

    save_root = tmp_path / "models"
    rc = driver.main(_flags(dataset_dir, save_root, max_steps=2))
    assert rc == 0
    mdir = save_root / "itest"
    assert (mdir / "args").exists()
    assert (mdir / "ckpt_last" / "params.npz").exists()
    with open(mdir / "ckpt_last" / "meta.json") as f:
        meta = json.load(f)
    assert meta["steps"] == 2
    # metrics were written
    assert (mdir / "metrics.jsonl").stat().st_size > 0

    # resume: continues to 4 steps from the saved state
    rc = driver.main(_flags(dataset_dir, save_root, max_steps=4))
    assert rc == 0
    with open(mdir / "ckpt_last" / "meta.json") as f:
        meta = json.load(f)
    assert meta["steps"] == 4
