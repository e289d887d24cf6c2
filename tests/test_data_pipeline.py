"""Dataset ETL + training pipeline integration tests: synthetic wav +
Audacity annotations -> prepare_dataset -> ImgDataset -> collate ->
train_step on a tiny config."""

import json
import os
import wave

import numpy as np
import pandas as pd
import pytest

from birdsoundclassif_tpu.config import FrontendConfig, NbmConfig
from birdsoundclassif_tpu.data.etl import (
    create_label_dataset,
    prepare_dataset,
    read_txt_file,
)
from birdsoundclassif_tpu.data.image_dataset import BatchLoader, ImgDataset, collate_batch


def write_wav(path, samples, sr):
    x = (np.clip(samples, -1, 1) * 32767).astype("<i2")
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(x.tobytes())


@pytest.fixture
def audio_dir(tmp_path, rng):
    sr = 44100
    d = tmp_path / "recordings"
    d.mkdir()
    t = np.arange(sr * 8) / sr
    # a "call" at 2.0-3.0s around 3kHz
    sig = 0.01 * rng.standard_normal(len(t))
    call = (t >= 2.0) & (t <= 3.0)
    sig[call] += 0.4 * np.sin(2 * np.pi * 3000 * t[call])
    write_wav(d / "turdus_merula#XC1.wav", sig, sr)
    # Audacity annotation: 2.0-3.0 s, 2500-3500 Hz
    (d / "turdus_merula#XC1.txt").write_text(
        "2.00\t3.00\tTurdus merula\n\\\t2500\t3500\n"
        "5.00\t5.50\tBruit de fond\n\\\t500\t1000\n"
    )
    return d


class TestLabelETL:
    def test_read_txt(self, audio_dir):
        df = read_txt_file(str(audio_dir / "turdus_merula#XC1.txt"))
        assert len(df) == 2
        assert set(df["species"]) == {"Turdus merula", "Bruit de fond"}
        assert df.loc[df["species"] == "Turdus merula", "t_start"].iloc[0] == 2.0

    def test_create_label_dataset(self, audio_dir):
        labels = create_label_dataset(str(audio_dir))
        # noise suppressed by default, turdus mapped to its bird_dict id
        assert len(labels) == 1
        with open(os.path.join(os.path.dirname(__file__), "..",
                               "birdsoundclassif_tpu", "assets", "bird_dict.json")) as f:
            bd = json.load(f)
        assert labels["bird_id"].iloc[0] == bd["Turdus merula"]

    def test_species_replacement_and_other(self, tmp_path):
        (tmp_path / "x.txt").write_text(
            "0.5\t1.0\tErithacus rubecola\n\\\t1000\t2000\n"    # typo -> replaced
            "2.0\t2.5\tMartian bird\n\\\t1000\t2000\n"          # unknown -> Other
        )
        labels = create_label_dataset(str(tmp_path))
        ids = dict(zip(labels["species"], labels["bird_id"]))
        assert "Erithacus rubecula" in ids
        assert ids["Martian bird"] == 132  # "Other"


class TestPrepareDataset:
    def test_full_etl(self, audio_dir, tmp_path):
        out = tmp_path / "dataset"
        prepare_dataset(str(audio_dir), str(out))
        pos_dirs = os.listdir(out / "positive_files")
        assert len(pos_dirs) == 1
        pos_dir = out / "positive_files" / pos_dirs[0]
        annots = pd.read_csv(pos_dir / "annotations.csv", sep=";")
        assert len(annots) >= 1
        annots["coord"] = annots["coord"].apply(eval)
        # the 2-3s call lands in window 0 (0-3.06s) around x=2.0/dt..3.0/dt
        coords = annots.iloc[0]["coord"][0]
        dt = FrontendConfig().dt_actual
        assert abs(coords[0] - int(2.0 / dt)) <= 1
        # y rows: (2500-500)/33.3 ~ 60
        assert 50 < coords[1] < 70
        pngs = [f for f in os.listdir(pos_dir) if f.endswith(".png")]
        assert len(pngs) == len(annots)
        # negatives exist for the windows without calls
        assert len(os.listdir(out / "negative_files")) == 1

    def test_dataset_loader_and_train_step(self, audio_dir, tmp_path):
        import jax

        out = tmp_path / "dataset"
        prepare_dataset(str(audio_dir), str(out))
        ds = ImgDataset(str(out), transform=True, rng=np.random.default_rng(0))
        assert len(ds) >= 1
        img, neg, boxes, ids = ds[0]
        assert img.shape == (375, 1024)
        assert boxes.shape[1] == 4 and len(ids) == len(boxes)

        loader = BatchLoader(ds, np.arange(len(ds)), batch_size=1, max_gt=4,
                             rng=np.random.default_rng(0), drop_last=False)
        batch = next(iter(loader))
        assert batch["img"].shape == (1, 375, 1024)
        assert batch["gt_valid"][0].sum() == len(ids)

        from birdsoundclassif_tpu.train.loop import create_train_state, make_train_step

        cfg = NbmConfig()
        cfg.num_classes = 150
        cfg.out_fpn_chan = 16
        cfg.fpn_p_chan = 24
        cfg.depth_rcnn = 1
        cfg.max_gt_boxes = 4
        cfg.pre_nms_topN = 256
        cfg.post_nms_topN = 64
        state, tx = create_train_state(jax.random.PRNGKey(0), cfg)
        train_step, _ = make_train_step(cfg, tx)
        batch_j = {k: np.asarray(v) for k, v in batch.items()}
        state2, losses = train_step(state, batch_j, jax.random.PRNGKey(1),
                                    negative_sample=False)
        assert np.isfinite(float(losses["total"]))


class TestEtlSkipRules:
    def test_unannotated_file_skipped(self, tmp_path, rng):
        """A wav with no usable annotation rows is skipped entirely in a
        labeled ETL run (reference: prepare_dataset.py:150-154)."""
        sr = 44100
        d = tmp_path / "rec"
        d.mkdir()
        write_wav(d / "labeled#XC1.wav", 0.1 * rng.standard_normal(sr * 2), sr)
        (d / "labeled#XC1.txt").write_text(
            "0.50\t1.00\tTurdus merula\n\\\t2500\t3500\n"
        )
        write_wav(d / "unlabeled#XC2.wav", 0.1 * rng.standard_normal(sr * 2), sr)
        # annotation present but only noise rows -> suppressed -> empty
        (d / "unlabeled#XC2.txt").write_text(
            "0.50\t1.00\tBruit de fond\n\\\t500\t900\n"
        )
        out = tmp_path / "ds"
        prepare_dataset(str(d), str(out))
        pos = os.listdir(out / "positive_files")
        assert len(pos) == 1 and "labeled" in pos[0]
        neg_root = out / "negative_files"
        negs = os.listdir(neg_root) if neg_root.exists() else []
        # the short labeled file has a single window (all positive), the
        # unlabeled file must be skipped -> no negative dirs at all here
        assert all("unlabeled" not in n for n in negs)


class TestLongFileSlicing:
    def test_long_file_label_offsets(self, tmp_path, rng):
        """Files above long_file_samples are processed in slices with label
        time offsets (reference: process_long_file, prepare_dataset.py:187-225).
        Shrunken thresholds make a 6s file 'long' (2 slices of ~3s)."""
        from birdsoundclassif_tpu.data.etl import process_file
        from birdsoundclassif_tpu.data.etl import create_label_dataset

        sr = 44100
        d = tmp_path / "rec"
        d.mkdir()
        t = np.arange(sr * 6) / sr
        sig = 0.02 * rng.standard_normal(len(t))
        # one call in slice 0 (1-2s), one in slice 1 (4-5s)
        for lo, hi in [(1.0, 2.0), (4.0, 5.0)]:
            m = (t > lo) & (t < hi)
            sig[m] += 0.5 * np.sin(2 * np.pi * 3000 * t[m])
        write_wav(d / "turdus_merula#XC5.wav", sig, sr)
        (d / "turdus_merula#XC5.txt").write_text(
            "1.00\t2.00\tTurdus merula\n\\\t2500\t3500\n"
            "4.00\t5.00\tTurdus merula\n\\\t2500\t3500\n"
        )
        labels = create_label_dataset(str(d))
        # long-file threshold: ~3s slices (rounded down to a multiple of sr)
        cfg = FrontendConfig(long_file_samples=sr * 3 + 1000)
        wins, annots = process_file(str(d / "turdus_merula#XC5.wav"), labels, cfg)
        assert wins is not None and annots is not None
        # slice 0: 3s -> 1 window; slice 1: 3s -> 1 window
        assert len(wins) == 2
        idx = sorted(annots["index"].tolist())
        assert idx == [0, 1]  # one positive annotation row per slice window
        # the second slice's call at absolute 4-5s must appear at ~1-2s
        # within its own slice (offset by 3s)
        row1 = annots.loc[annots["index"] == 1].iloc[0]
        x1 = row1["coord"][0][0]
        dt = cfg.dt_actual
        assert abs(x1 - int(1.0 / dt)) <= 2


class TestHardCorpus:
    """The class-scale synthetic corpus (VERDICT r2 next #3): overlapping
    bands, morphology-coded species, interference beds, negative files."""

    def test_bank_deterministic_and_overlapping(self):
        import numpy as np

        from birdsoundclassif_tpu.data.synthetic import species_bank, synth_call

        names = [f"Sp {i}" for i in range(150)]
        b1 = species_bank(names, np.random.default_rng(42))
        b2 = species_bank(names, np.random.default_rng(42))
        assert b1 == b2
        # heavy band overlap: many distinct species pairs share band range
        overlaps = 0
        for i in range(0, 60, 3):
            for j in range(1, 60, 7):
                if i == j:
                    continue
                a, b = b1[i], b1[j]
                lo = max(a["fc"] - a["bw"] / 2, b["fc"] - b["bw"] / 2)
                hi = min(a["fc"] + a["bw"] / 2, b["fc"] + b["bw"] / 2)
                overlaps += hi > lo
        assert overlaps > 20
        rng = np.random.default_rng(0)
        for spec in b1[:12]:
            call, f_lo, f_hi = synth_call(spec, rng)
            assert np.isfinite(call).all()
            assert f_lo < f_hi <= 22_050

    def test_write_hard_corpus_feeds_etl(self, tmp_path):
        import numpy as np

        from birdsoundclassif_tpu.data.etl import prepare_dataset
        from birdsoundclassif_tpu.data.synthetic import write_hard_corpus

        rng = np.random.default_rng(3)
        # real bird_dict names so the label ETL maps species -> ids
        names = ["Turdus merula", "Erithacus rubecula"]
        counts = write_hard_corpus(
            str(tmp_path / "rec"), str(tmp_path / "test"),
            str(tmp_path / "neg"), rng, names,
            files_per_species=1, n_negative_files=1, train_duration_s=7.0)
        assert counts == {"train_files": 2, "test_files": 2, "neg_files": 1}
        out = tmp_path / "dataset"
        prepare_dataset(str(tmp_path / "rec"), str(out))
        pos = list((out / "positive_files").iterdir())
        assert len(pos) == 2
        # every train recording produced an annotations.csv with boxes
        for d in pos:
            assert (d / "annotations.csv").exists()
        # negative files carry no annotations at all
        neg_wavs = list((tmp_path / "neg").glob("*.wav"))
        assert len(neg_wavs) == 1
        assert not list((tmp_path / "neg").glob("*.txt"))
