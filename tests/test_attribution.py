"""mAP-attribution tooling (scripts/attribute_map.py): per-class AP math,
the localization/classification split, and the oracle crop classifier —
all on fabricated data (the on-chip run against a trained checkpoint is
recorded in ATTRIBUTION_r4.json)."""

import importlib.util
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def am():
    spec = importlib.util.spec_from_file_location(
        "attribute_map", os.path.join(os.path.dirname(__file__), "..",
                                      "scripts", "attribute_map.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _entry(boxes, scores):
    return {"bbox_coord": [list(map(float, b)) for b in boxes],
            "scores": [float(s) for s in scores]}


def test_per_class_ap(am):
    # species A: both GT found exactly; species B: one GT, missed entirely
    outputs = [(
        "f0.wav",
        {"A": _entry([[10, 10, 50, 40], [100, 10, 150, 40]], [0.9, 0.8])},
        {"A": [[10, 10, 50, 40], [100, 10, 150, 40]],
         "B": [[200, 50, 260, 90]]},
    )]
    pc = am.per_class_ap(outputs)
    # reference AP protocol (nets_utils.py:513-534): sum of per-recall-bin
    # mean interpolated precision / 10 — two perfect TPs populate exactly
    # the 0.5 and 1.0 recall bins, so AP = 2/10 even at precision 1.0
    assert pc["A"]["AP"] == pytest.approx(0.2)
    assert pc["A"]["Rec"] == pytest.approx(1.0)
    assert pc["B"]["Rec"] == 0.0
    assert pc["B"]["n_gt"] == 1
    # AP -1 sentinel: no predictions at all for B (reference calculate_ap)
    assert pc["B"]["AP"] == -1.0


def test_confusion_split(am):
    # one detection localizes B's GT but calls it A -> confusion, not a miss
    outputs = [(
        "f0.wav",
        {"A": _entry([[200, 50, 260, 90]], [0.9]),
         "B": _entry([[10, 10, 50, 40]], [0.7])},
        {"A": [[10, 10, 50, 40]],
         "B": [[200, 50, 260, 90]]},
    )]
    conf = am.confusion_split(outputs)
    assert conf["n_detections"] == 2
    assert conf["det_localized_rate"] == 1.0
    assert conf["cls_acc_on_localized"] == 0.0
    assert conf["gt_found_rate"] == 1.0
    assert conf["top_confusions"] == {"B -> A": 1, "A -> B": 1}

    # same boxes, right species -> clean split
    outputs_ok = [(
        "f0.wav",
        {"A": _entry([[10, 10, 50, 40]], [0.9]),
         "B": _entry([[200, 50, 260, 90]], [0.7])},
        {"A": [[10, 10, 50, 40]], "B": [[200, 50, 260, 90]]},
    )]
    conf = am.confusion_split(outputs_ok)
    assert conf["cls_acc_on_localized"] == 1.0
    assert conf["top_confusions"] == {}


def test_oracle_classifier_separates_separable_classes(am):
    """Two trivially distinct crop patterns -> the oracle CNN must reach
    high accuracy; it is the measuring stick for corpus ambiguity, so it
    has to be able to hit ~1.0 when classes ARE separable."""
    rng = np.random.default_rng(0)
    n = 240
    xs = np.zeros((n, am.CROP_H, am.CROP_W), np.float32)
    ys = np.zeros(n, np.int32)
    for i in range(n):
        cls = i % 2
        ys[i] = cls + 1
        x = 0.05 * rng.standard_normal((am.CROP_H, am.CROP_W))
        if cls == 0:
            x[8:12, :] += 1.0     # horizontal band
        else:
            x[:, 28:34] += 1.0    # vertical band
        xs[i] = x
    apply, params, val_acc = am.fit_oracle(xs, ys, 3, steps=300, batch=64)
    assert val_acc >= 0.9, val_acc
    acc, per_cls = am.oracle_eval(apply, params, xs, ys)
    assert acc >= 0.95, acc
    assert set(per_cls) == {1, 2}
