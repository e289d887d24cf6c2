"""Evaluation suite: box-level AP/mAP/recall and the 3-second sliding-window
protocol (reference: nets_utils.py:419-534 and :580-706).

Protocol (box level): a prediction is a TP if its best IoU against same-
species ground truth is >= 0.5; predictions are sorted by confidence,
precision is interpolated per unique recall value, recall is bucketed into
10 bins, and AP = sum of per-bin mean interpolated precision / 10. mAP/mRec
average the same quantities per species. FNs enter with score 0 so they
depress recall but not precision.
"""

from __future__ import annotations

import glob
import itertools
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd

PIX_PRECISION_X = 0.002993197278911565  # s/px (reference: nets_utils.py:586)
PIX_PRECISION_Y = 33.3                  # Hz/px


def _iou_matrix_np(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """+1-convention IoU (same math as ops.boxes.iou_matrix, host-side)."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    x1 = np.maximum(a[:, None, 0], b[None, :, 0])
    y1 = np.maximum(a[:, None, 1], b[None, :, 1])
    x2 = np.minimum(a[:, None, 2], b[None, :, 2])
    y2 = np.minimum(a[:, None, 3], b[None, :, 3])
    inter = np.clip(x2 - x1 + 1, 0, None) * np.clip(y2 - y1 + 1, 0, None)
    area_a = (a[:, 2] - a[:, 0] + 1) * (a[:, 3] - a[:, 1] + 1)
    area_b = (b[:, 2] - b[:, 0] + 1) * (b[:, 3] - b[:, 1] + 1)
    return inter / (area_a[:, None] + area_b[None, :] - inter)


# ---------------------------------------------------------------------------
# Audacity annotation parsing (reference: nets_utils.py:419-451)
# ---------------------------------------------------------------------------


def read_annot_file(annot_path: str) -> List[List[str]]:
    """Pairs of consecutive lines (time line + frequency line)."""
    annots = []
    with open(annot_path, "r") as f:
        pair: List[str] = []
        for i, line in enumerate(f):
            if i % 2 == 0:
                pair = [line]
            else:
                pair.append(line)
                annots.append(pair)
    return annots


def format_single_annot(
    annot: Sequence[str],
    pix_precision_y: float = PIX_PRECISION_Y,
    pix_precision_x: float = PIX_PRECISION_X,
    low_freq: float = 500.0,
    h_pix: int = 375,
) -> Tuple[str, List[float]]:
    t0, t1, spec = annot[0].replace("\n", "").split("\t")
    f0, f1 = annot[1].replace("\n", "").replace("\\\t", "").split("\t")
    return (
        spec,
        [
            float(np.round(float(t0) / pix_precision_x)),
            float(np.round((float(f0) - low_freq) / pix_precision_y).clip(min=0)),
            float(np.round(float(t1) / pix_precision_x)),
            float(np.round((float(f1) - low_freq) / pix_precision_y).clip(max=h_pix - 1)),
        ],
    )


def format_txt_annots(annot_path: str) -> Dict[str, List[List[float]]]:
    out: Dict[str, List[List[float]]] = {}
    for annot in read_annot_file(annot_path):
        spec, coords = format_single_annot(annot)
        out.setdefault(spec, []).append(coords)
    return out


# ---------------------------------------------------------------------------
# AP scores (reference: nets_utils.py:454-534)
# ---------------------------------------------------------------------------


def calculate_ap(df: pd.DataFrame) -> Tuple[float, float]:
    """(AP, recall) of a TP/FP/FN-typed, confidence-sorted frame."""
    count = {k: int((df["type"] == k).sum()) for k in ("TP", "FP", "FN")}
    recall = count["TP"] / max(1, count["TP"] + count["FN"])
    if count["TP"] + count["FP"] == 0:
        return -1.0, recall
    df = df.copy()
    tp_cum = (df["type"] == "TP").astype(int).cumsum()
    denom = np.arange(1, len(df) + 1).clip(max=count["TP"] + count["FP"])
    df["precision"] = tp_cum / denom
    df["recall"] = tp_cum / max(1, count["TP"] + count["FN"])
    interp = (
        df.groupby("recall")["precision"].max().rename("prec_interp").reset_index()
    )
    df = df.merge(interp, on="recall")
    df["recall_bins"] = pd.cut(
        df["recall"], bins=np.arange(0, 1.1, 0.1), include_lowest=True,
        labels=np.arange(10),
    )
    bin_means = df.groupby("recall_bins", observed=True)["prec_interp"].mean()
    ap = float(bin_means.values.sum() / 10.0)
    return ap, float(recall)


def compute_AP_scores(
    outputs: List[Tuple[Dict, Dict]], filter_sp: Optional[Sequence[str]] = None
) -> Dict[str, float]:
    """outputs: [(model_output, formatted_annots)] per file, both keyed by
    species; model_output values hold 'bbox_coord' and 'scores'."""
    rows = []
    for i, (output, annots) in enumerate(outputs):
        fp = [s for s in output if s not in annots]
        fn = [s for s in annots if s not in output]
        tp = [s for s in output if s in annots]
        for spec in tp:
            pred = np.asarray(output[spec]["bbox_coord"], np.float64)
            iou = _iou_matrix_np(pred, np.asarray(annots[spec], np.float64)).max(axis=1)
            for v, sc in zip(iou, np.ravel(output[spec]["scores"])):
                rows.append((i, spec, float(v), float(sc)))
        for spec in fp:
            for sc in np.ravel(output[spec]["scores"]):
                rows.append((i, spec, 0.0, float(sc)))
        for spec in fn:
            for _ in annots[spec]:
                rows.append((i, spec, 0.0, 0.0))
    if not rows:
        return {"AP": 0, "mAP": 0, "Rec": 0, "mRec": 0}
    df = pd.DataFrame(rows, columns=["file_idx", "species", "iou", "scores"])
    df["type"] = "FP"
    df.loc[df["iou"] >= 0.5, "type"] = "TP"
    df.loc[df["scores"] == 0, "type"] = "FN"
    df = df.sort_values("scores", ascending=False)
    if filter_sp is not None:
        df = df.loc[df["species"].isin(filter_sp)]
    ap, rec = calculate_ap(df)
    m_aps, m_recs = [], []
    for _, g in df.groupby("species"):
        a, r = calculate_ap(g)
        if a > -1:
            m_aps.append(a)
        m_recs.append(r)
    return {
        "AP": ap,
        "mAP": float(np.mean(m_aps)) if m_aps else 0.0,
        "Rec": rec,
        "mRec": float(np.mean(m_recs)) if m_recs else 0.0,
    }


def match_detection_sets(out_a: Dict, out_b: Dict, iou_thresh: float = 0.5
                         ) -> Dict[str, float]:
    """Greedy IoU matching between two per-species detection dicts (the
    run_detection output schema). Used for codec-robustness checks (the
    mp3 twin vs its wav source) and quantization A/Bs, where slot indices
    churn under NMS ties so per-slot diffs are meaningless."""
    def flat(out):
        rows = []
        for sp, entry in out.items():
            for b, s in zip(entry["bbox_coord"], entry["scores"]):
                rows.append((sp, np.asarray(b, np.float64), float(s)))
        return rows

    a, b = flat(out_a), flat(out_b)

    def greedy(use_class):
        used, m, ious, sdel = set(), 0, [], []
        for sp, box, sc in a:
            best, best_iou = None, iou_thresh
            for idx, (sp2, box2, sc2) in enumerate(b):
                if idx in used or (use_class and sp2 != sp):
                    continue
                ix = max(0.0, min(box[2], box2[2]) - max(box[0], box2[0]))
                iy = max(0.0, min(box[3], box2[3]) - max(box[1], box2[1]))
                inter = ix * iy
                ua = (box[2] - box[0]) * (box[3] - box[1])
                ub = (box2[2] - box2[0]) * (box2[3] - box2[1])
                iou = inter / max(ua + ub - inter, 1e-9)
                if iou > best_iou:
                    best, best_iou = idx, iou
            if best is not None:
                used.add(best)
                m += 1
                ious.append(best_iou)
                sdel.append(abs(sc - b[best][2]))
        return m, ious, sdel

    cm, cious, csdel = greedy(True)
    am, _, _ = greedy(False)
    denom = max(len(a), len(b), 1)
    return {
        "n_a": len(a),
        "n_b": len(b),
        "class_match": cm,
        "agnostic_match": am,
        "class_rate": round(cm / denom, 4),
        "agnostic_rate": round(am / denom, 4),
        "mean_match_iou": round(float(np.mean(cious)), 4) if cious else 1.0,
        "max_score_delta": round(float(np.max(csdel)), 5) if csdel else 0.0,
    }


# ---------------------------------------------------------------------------
# 3-second sliding-window protocol (reference: nets_utils.py:580-706)
# ---------------------------------------------------------------------------


def find_windows(left: float, right: float, delta: float, win_size: float = 3.0):
    return [
        (win_size * i, win_size * (i + 1))
        for i in range(
            int(left + delta) // int(win_size), int((right - delta) // int(win_size)) + 1
        )
    ]


def format_model_output_df(model_outputs, src: str = "nbm", delta_px: int = 5) -> pd.DataFrame:
    """Flatten per-file model outputs into 3s-window rows."""
    px = PIX_PRECISION_X
    frames = []
    if src == "nbm":
        delta = delta_px * px
        for file, out in model_outputs:
            flat = []
            for sp, info in out.items():
                for i in range(len(info["scores"])):
                    b = info["bbox_coord"][i]
                    flat.append((sp, b[0] * px, b[2] * px, info["scores"][i]))
            rows = []
            for (s, t0, t1, c) in flat:
                for (l, r) in find_windows(t0, t1, delta):
                    rows.append((s, np.round(l / px), np.round(r / px), c))
            df = pd.DataFrame(rows, columns=["species", "t_0", "t_f", "scores"])
            df["file_idx"] = file.replace(".wav", "")
            frames.append(df)
        df = pd.concat(frames, ignore_index=True) if frames else pd.DataFrame(
            columns=["species", "t_0", "t_f", "scores", "file_idx"]
        )
        return df.sort_values("scores", ascending=False).drop_duplicates(
            ["species", "t_0", "file_idx"]
        )
    if src == "birdnet":
        for file, out in model_outputs:
            rows = []
            for (t, win_dict) in out.items():
                for s, c in win_dict.items():
                    rows.append(
                        (np.round(float(t[0]) / px), np.round(float(t[1]) / px),
                         s.split("_")[0], c)
                    )
            df = pd.DataFrame(rows, columns=["t_0", "t_f", "species", "scores"])
            df["file_idx"] = file.replace(".wav", "")
            frames.append(df)
        return pd.concat(frames, ignore_index=True)
    raise ValueError(f"unknown src {src}")


def format_annotations_df(annotations, delta_px: int = 5) -> pd.DataFrame:
    px = PIX_PRECISION_X
    delta = delta_px * px
    frames = []
    for file, out in annotations:
        rows = []
        for s, box_list in out.items():
            for coord in box_list:
                t0, t1 = coord[0] * px, coord[2] * px
                for (l, r) in find_windows(t0, t1, delta):
                    rows.append((s, np.round(l / px), np.round(r / px)))
        df = pd.DataFrame(rows, columns=["species", "t_0", "t_f"])
        df["file_idx"] = file.replace(".wav", "")
        frames.append(df)
    df = pd.concat(frames, ignore_index=True) if frames else pd.DataFrame(
        columns=["species", "t_0", "t_f", "file_idx"]
    )
    return df.drop_duplicates()


# species without enough training data (reference: nets_utils.py:666)
EXCLUDED_SPECIES = ["Anas platyrhynchos", "Anthus campestris", "Luscinia megarhynchos"]


def compute_metrics_sliding_windows(
    model_outputs, annotations, src: str = "nbm", delta_px: int = 5
):
    """Merge model 3s windows with annotation 3s windows and score
    (reference: compute_metrics_sliding_windows_out, nets_utils.py:659-706;
    takes in-memory outputs instead of a pickle path)."""
    tgt_species = sorted(
        {a[0].split("#")[0].capitalize().replace("_", " ") for a in annotations}
    )
    tgt_species = [s for s in tgt_species if s not in EXCLUDED_SPECIES]

    out_df = format_model_output_df(model_outputs, src, delta_px)
    ann_df = format_annotations_df(annotations)
    merged = pd.merge(
        out_df, ann_df, on=["file_idx", "species"], how="outer",
        suffixes=["_out", "_annot"],
    )
    merged["intersection"] = np.minimum(merged["t_f_out"], merged["t_f_annot"]) - np.maximum(
        merged["t_0_out"], merged["t_0_annot"]
    )
    merged.loc[
        merged["t_f_out"].isnull() | merged["t_f_annot"].isnull(), "intersection"
    ] = np.nan
    merged = merged.sort_values("intersection", ascending=False)
    merged = merged.loc[
        ~merged["file_idx"].map(
            lambda x: x.split("#")[0].capitalize().replace("_", " ") in EXCLUDED_SPECIES
        )
    ]

    recall_matrix = merged.loc[~merged["t_0_annot"].isnull()].drop_duplicates(
        ["file_idx", "species", "t_0_annot", "t_f_annot"]
    ).copy()
    recall_matrix["type"] = "FN"
    recall_matrix.loc[recall_matrix["intersection"] > delta_px, "type"] = "TP"
    recall = _calc_recall(recall_matrix)
    m_rec = _calc_mscore(recall_matrix, "recall", min_n_boxes=5)

    precision_matrix = merged.loc[~merged["t_0_out"].isnull()].drop_duplicates(
        ["file_idx", "species", "t_0_out"]
    ).copy()
    precision_matrix["type"] = "FP"
    precision_matrix.loc[precision_matrix["intersection"] > delta_px, "type"] = "TP"
    precision_matrix = precision_matrix.sort_values("scores", ascending=False)
    precision_matrix = pd.concat(
        [precision_matrix, recall_matrix.loc[recall_matrix["type"] == "FN"]],
        ignore_index=True,
    )
    ap, _ = calculate_ap(precision_matrix)
    m_ap = _calc_mscore(precision_matrix, "ap", filter_sp=tgt_species)
    return ap, recall, m_ap, m_rec, precision_matrix


def _calc_recall(m: pd.DataFrame) -> float:
    count = {k: int((m["type"] == k).sum()) for k in ("TP", "FN")}
    return count["TP"] / max(1, count["TP"] + count["FN"])


def _calc_mscore(mat, score, min_n_boxes=0, filter_sp=None):
    vals = []
    if filter_sp is not None:
        mat = mat.loc[mat["species"].isin(filter_sp)].copy()
    for _, df in mat.groupby("species"):
        if len(df) > min_n_boxes:
            if score == "ap":
                a, _ = calculate_ap(df)
                if a > -1:
                    vals.append(a)
            else:
                vals.append(_calc_recall(df))
    return float(np.mean(vals)) if vals else 0.0


def evaluate_test_dir(params, cfg, test_dir: str, min_score: float = 0.02, bs: int = 4):
    """Full inference + AP scoring over a directory of wav + Audacity txt
    pairs (the reference's in-training test eval, train.py:389-396).

    Uses the streaming whole-file pipeline (one XLA dispatch + one packed
    readback per file, next file's decode/STFT overlapped) rather than the
    per-batch run_detection path — the every-500-step in-training eval would
    otherwise pay one link round trip per window batch."""
    from ..audio.frontend import SpectrogramFrontend
    from ..infer.pipeline import (
        load_bird_dict,
        packed_to_class_dict,
        stream_detections,
    )

    files = sorted(glob.glob(os.path.join(test_dir, "*.wav")))
    _, reverse = load_bird_dict(None)
    frontend = SpectrogramFrontend(cfg.frontend)
    outputs = []
    for wav_path, packed in stream_detections(
        params, cfg, frontend, files, min_score, bs,
        sample_rate=cfg.frontend.sample_rate,
    ):
        class_bbox = packed_to_class_dict(np.asarray(packed), cfg)
        out = {}
        for idx in range(1, cfg.num_classes + 1):
            entry = class_bbox[str(idx)]
            if len(entry["bbox_coord"]) > 0:
                out[reverse[idx]] = {
                    "bbox_coord": entry["bbox_coord"].tolist(),
                    "scores": entry["scores"].tolist(),
                }
        outputs.append((out, format_txt_annots(wav_path.replace(".wav", ".txt"))))
    return compute_AP_scores(outputs)
