"""Visualization helpers: spectrograms with detection / annotation boxes.

Equivalents of the reference's inspection tools (reference:
run_detection.py:252-316 visualise_model_out, nbm_datasets/utils.py:238-309
visualise_file_annot, image_dataset.py:127-153 plot_img_bb). Axis labels
convert pixels back to seconds / Hz with the canonical precisions.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

PIX_PRECISION_X = 0.002993197278911565
PIX_PRECISION_Y = 33.3


def _axes_in_units(ax, window_index: int, hop_spectro: int = 819) -> None:
    import matplotlib.ticker as mticker

    y_labels = [500 + int(y * PIX_PRECISION_Y) for y in ax.get_yticks()]
    x_labels = [
        int(1000 * (x + window_index * hop_spectro) * PIX_PRECISION_X) / 1000
        for x in ax.get_xticks()
    ]
    ax.yaxis.set_major_locator(mticker.FixedLocator(ax.get_yticks().tolist()))
    ax.xaxis.set_major_locator(mticker.FixedLocator(ax.get_xticks().tolist()))
    ax.set_xticklabels(x_labels)
    ax.set_yticklabels(y_labels)
    ax.set_ylabel("Frequency [Hz]")
    ax.set_xlabel("Time [s]")


def plot_window_with_boxes(
    window: np.ndarray,
    boxes: Sequence[Sequence[float]],
    labels: Optional[Sequence[str]] = None,
    scores: Optional[Sequence[float]] = None,
    window_index: int = 0,
    save_path: Optional[str] = None,
    show: bool = False,
):
    """One spectrogram window (h, w) with boxes in window coordinates."""
    import matplotlib

    if not show:
        matplotlib.use("Agg")
    import matplotlib.patches as patches
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(16, 8))
    ax.imshow(np.asarray(window), origin="lower")
    for j, (x1, y1, x2, y2) in enumerate(boxes):
        rect = patches.Rectangle(
            (x1, y1), x2 - x1, y2 - y1, linewidth=1, edgecolor="b", facecolor="none"
        )
        ax.add_patch(rect)
        if labels is not None:
            y_anchor = y1 - 20
            if y_anchor < 10:
                y_anchor = y2 + 15
            text = labels[j]
            if scores is not None:
                text = f"{text}, {scores[j]:.2f}"
            ax.annotate(text, (x1, y_anchor), backgroundcolor="b", color="white",
                        fontsize="medium")
    _axes_in_units(ax, window_index)
    if save_path:
        fig.savefig(save_path, bbox_inches="tight")
    if show:
        plt.show()
    plt.close(fig)
    return save_path


def visualise_model_out(
    output: Dict[str, Dict[str, list]],
    spec: np.ndarray,
    w_pix: int = 1024,
    hop_spectro: int = 819,
    min_plot_score: float = 0.01,
    out_dir: Optional[str] = None,
    show: bool = False,
) -> List[str]:
    """Per-window plots of merged file-level detections
    (reference: visualise_model_out, run_detection.py:252-316)."""
    total = spec.shape[1]
    n_win = max(1, int(1 + np.ceil((total - w_pix) / hop_spectro)))
    paths = []
    for i in range(n_win):
        start = i * hop_spectro
        end = start + w_pix
        boxes, labels, scores = [], [], []
        for species, entry in output.items():
            for box, sc in zip(entry["bbox_coord"], entry["scores"]):
                x1, y1, x2, y2 = box
                if (start <= x1 < end) or (start <= x2 < end):
                    boxes.append(
                        [max(x1, start) - start, y1, min(x2, end - 1) - start, y2]
                    )
                    labels.append(species if sc >= min_plot_score else "Unsure")
                    scores.append(sc)
        if not boxes:
            continue
        window = spec[:, start:end]
        save_path = None
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)
            save_path = os.path.join(out_dir, f"window_{i:05d}.png")
        paths.append(
            plot_window_with_boxes(window, boxes, labels, scores, i, save_path, show)
        )
    return [p for p in paths if p]


def visualise_dataset_window(
    dataset_dir: str,
    folder: str,
    index: int,
    bird_dict_path: Optional[str] = None,
    save_path: Optional[str] = None,
    show: bool = False,
):
    """Plot one ETL'd positive window with its annotations
    (reference: visualise_file_annot, utils.py:238-309)."""
    import imageio.v2 as imageio
    import json
    import pandas as pd

    from ..infer.pipeline import load_bird_dict

    pos_dir = os.path.join(dataset_dir, "positive_files", folder)
    annots = pd.read_csv(os.path.join(pos_dir, "annotations.csv"), sep=";")
    annots["coord"] = annots["coord"].apply(eval)
    annots["bird_id"] = annots["bird_id"].apply(eval)
    row = annots.loc[annots["index"] == index]
    pngs = sorted(f for f in os.listdir(pos_dir) if f.endswith(f"{index:05d}.png"))
    img = np.asarray(imageio.imread(os.path.join(pos_dir, pngs[0]))) / 255.0
    _, reverse = load_bird_dict(bird_dict_path)
    boxes, labels = [], []
    if len(row):
        for box, bid in zip(row.iloc[0]["coord"], row.iloc[0]["bird_id"]):
            boxes.append(box)
            labels.append(reverse.get(int(bid), str(bid)))
    return plot_window_with_boxes(img, boxes, labels, window_index=index,
                                  save_path=save_path, show=show)
