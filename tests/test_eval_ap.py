"""Evaluation-suite tests: annotation parsing, AP formula hand-checks, and
the sliding-window protocol."""

import numpy as np
import pandas as pd
import pytest

from birdsoundclassif_tpu.eval.ap import (
    compute_AP_scores,
    calculate_ap,
    format_txt_annots,
    find_windows,
    compute_metrics_sliding_windows,
    PIX_PRECISION_X,
)


@pytest.fixture
def annot_file(tmp_path):
    # Audacity 2-line format: t0 t1 species / '\' f0 f1
    content = (
        "1.00\t2.00\tTurdus merula\n"
        "\\\t1000\t3000\n"
        "5.50\t6.10\tErithacus rubecula\n"
        "\\\t2000\t4500\n"
    )
    p = tmp_path / "a.txt"
    p.write_text(content)
    return str(p)


class TestAnnotParsing:
    def test_format_txt_annots(self, annot_file):
        out = format_txt_annots(annot_file)
        assert set(out) == {"Turdus merula", "Erithacus rubecula"}
        box = out["Turdus merula"][0]
        assert box[0] == np.round(1.0 / PIX_PRECISION_X)
        assert box[2] == np.round(2.0 / PIX_PRECISION_X)
        assert box[1] == np.round((1000 - 500) / 33.3)
        assert box[3] == np.round((3000 - 500) / 33.3)


class TestAPFormula:
    def test_single_perfect_box(self):
        out = {"A": {"bbox_coord": [[0, 0, 10, 10]], "scores": [0.9]}}
        ann = {"A": [[0, 0, 10, 10]]}
        scores = compute_AP_scores([(out, ann)])
        # one TP, recall 1.0 -> occupies only the last recall bin
        assert scores["Rec"] == 1.0
        assert scores["mRec"] == 1.0
        assert abs(scores["AP"] - 0.1) < 1e-9  # 1 bin of 10 at precision 1

    def test_fp_and_fn(self):
        out = {
            "A": {"bbox_coord": [[0, 0, 10, 10], [500, 100, 520, 130]],
                  "scores": [0.9, 0.8]},
            "B": {"bbox_coord": [[30, 30, 50, 50]], "scores": [0.7]},
        }
        ann = {"A": [[0, 0, 10, 10]], "C": [[600, 20, 640, 80]]}
        scores = compute_AP_scores([(out, ann)])
        # A: 1 TP 1 FP; B: 1 FP; C: 1 FN
        assert scores["Rec"] == 0.5  # 1 TP / (1 TP + 1 FN)
        assert 0 < scores["AP"] <= 1

    def test_iou_threshold_boundary(self):
        # IoU slightly below 0.5 -> FP
        out = {"A": {"bbox_coord": [[0, 0, 10, 4]], "scores": [0.9]}}
        ann = {"A": [[0, 0, 10, 10]]}
        scores = compute_AP_scores([(out, ann)])
        assert scores["Rec"] == 0.0

    def test_filter_species(self):
        out = {"A": {"bbox_coord": [[0, 0, 10, 10]], "scores": [0.9]}}
        ann = {"A": [[0, 0, 10, 10]], "B": [[40, 40, 60, 60]]}
        s_all = compute_AP_scores([(out, ann)])
        s_filt = compute_AP_scores([(out, ann)], filter_sp=["A"])
        assert s_filt["Rec"] == 1.0
        assert s_all["Rec"] == 0.5


class TestSlidingWindows:
    def test_find_windows(self):
        # a call from 1.2s to 2.5s with delta 0 -> window (0, 3)
        assert find_windows(1.2, 2.5, 0.0) == [(0.0, 3.0)]
        # spanning two windows
        assert find_windows(2.0, 4.0, 0.0) == [(0.0, 3.0), (3.0, 6.0)]

    def test_end_to_end_protocol(self):
        px = PIX_PRECISION_X
        # model found turdus at 1-2s in file 'turdus_merula#1.wav'
        model_outputs = [
            (
                "turdus_merula#1.wav",
                {"Turdus merula": {
                    "bbox_coord": [[1.0 / px, 10, 2.0 / px, 40]],
                    "scores": [0.85],
                }},
            )
        ]
        annotations = [
            (
                "turdus_merula#1.wav",
                {"Turdus merula": [[1.1 / px, 12, 2.2 / px, 38]]},
            )
        ]
        ap, recall, m_ap, m_rec, _ = compute_metrics_sliding_windows(
            model_outputs, annotations, src="nbm"
        )
        assert recall == 1.0
        assert ap > 0


class TestBirdnetFormat:
    def test_format_model_output_birdnet(self):
        from birdsoundclassif_tpu.eval.ap import format_model_output_df

        # birdnet output shape: {(t0, t1): {"Genus species_Common": conf}}
        model_outputs = [
            ("f1.wav", {(0.0, 3.0): {"Turdus merula_Common Blackbird": 0.8},
                        (3.0, 6.0): {"Erithacus rubecula_Robin": 0.5}}),
        ]
        df = format_model_output_df(model_outputs, src="birdnet")
        assert len(df) == 2
        assert set(df["species"]) == {"Turdus merula", "Erithacus rubecula"}
        assert (df["file_idx"] == "f1").all()


def test_ap_ceiling_vs_gt_count():
    """The 10-recall-bin protocol caps a PERFECT detector's AP at
    min(1, n_gt/10): with n_gt ground-truth boxes only n_gt distinct recall
    values (j/n_gt) exist, so at most n_gt of the 10 bins are occupied and
    empty bins contribute zero (reference: nets_utils.py:513-534 pd.cut
    binning). This is why the r4 test corpus (4 GT/species) capped mAP at
    exactly 0.400 (ATTRIBUTION_r4.json) and why the r5 rebuild
    (scripts/rebuild_eval_corpus.py) gives every tested species >=10 GT."""
    from birdsoundclassif_tpu.eval.ap import compute_AP_scores

    def perfect(n_gt):
        boxes = [[i * 100, 10, i * 100 + 50, 60] for i in range(n_gt)]
        out = {"Sp": {"bbox_coord": boxes, "scores": [0.9] * n_gt}}
        return compute_AP_scores([(out, {"Sp": boxes})])

    for n_gt, ceiling in ((4, 0.4), (8, 0.8), (10, 1.0), (12, 1.0)):
        m = perfect(n_gt)
        assert m["mAP"] == pytest.approx(ceiling), (n_gt, m)
        assert m["Rec"] == 1.0
