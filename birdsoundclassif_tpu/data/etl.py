"""Dataset build ETL: audio + Audacity annotations -> PNG windows + CSV.

Reimplements the reference's dataset builder (reference:
nbm_datasets/prepare_dataset.py:12-89, merge_and_filter_labels :297-375,
nbm_datasets/utils.py:59-173) on top of the device front-end. Output format
is byte-compatible: `positive_files/<dir>__<file>/NNNNN.png` uint8 windows,
`negative_files/...`, and a per-source `annotations.csv` (sep=';') with one
row per positive window holding the box list and bird-id list.

Long files (> 15e7 samples) are processed in slices with label time
offsets; unlike the reference we slice in memory instead of writing 16-bit
temp wavs (bit-identical pipeline except for the reference's lossy PCM16
round-trip, which we deliberately skip).
"""

from __future__ import annotations

import glob
import json
import os
from typing import Dict, List, Optional, Tuple

import numpy as np
import pandas as pd

from ..audio.frontend import SpectrogramFrontend
from ..audio.wavio import load_audio
from ..config import FrontendConfig
from .labels import NOISE_LABELS, NOT_BIRD_LABELS, SPECIES_REPLACEMENTS, UNIDENTIFIED

_ASSET_BIRD_DICT = os.path.join(os.path.dirname(__file__), "..", "assets", "bird_dict.json")


def read_txt_file(path: str, extra_str_label: str = "") -> pd.DataFrame:
    """One Audacity export -> rows (t_start, t_end, f_start, f_end, species,
    filename) (reference: utils.py:59-92)."""
    df = pd.read_table(path, header=None)
    df["line_type"] = (df[0] == "\\").astype(int)
    ids, idx = [], -1
    for lt in df["line_type"]:
        if lt == 0:
            idx += 1
        ids.append(idx)
    df["id"] = ids
    df = df.drop_duplicates(["line_type", "id"])
    df = (
        df.loc[df["line_type"] == 0]
        .merge(df.loc[df["line_type"] == 1], on="id")
        .dropna()
        .rename(columns={"0_x": "t_start", "1_x": "t_end", "2_x": "species",
                         "1_y": "f_start", "2_y": "f_end"})
    )
    df = df[["t_start", "t_end", "f_start", "f_end", "species"]]
    df["filename"] = os.path.basename(path).split(".")[0].replace(extra_str_label, "")
    for col in ("t_start", "t_end"):
        df[col] = df[col].astype(float)
    return df


def create_label_dataset(
    directory: str,
    extra_str_label: str = "",
    suppress_others: bool = True,
    suppress_noise: bool = True,
    suppress_unID: bool = False,
    bird_dict_path: Optional[str] = None,
) -> pd.DataFrame:
    """All txt annotations of a directory -> cleaned, id-mapped dataframe
    (reference: utils.py:95-173; the hardcoded /mnt/c/... dict path becomes
    an argument defaulting to the bundled asset)."""
    with open(bird_dict_path or _ASSET_BIRD_DICT, "r") as f:
        birds_dict = json.load(f)

    frames = [
        read_txt_file(os.path.join(directory, f), extra_str_label)
        for f in os.listdir(directory)
        if os.path.splitext(f)[-1] == ".txt"
    ]
    labels = pd.concat(frames)

    for freq in ("f_start", "f_end"):
        labels[freq] = labels[freq].astype(float)
    labels["f_start"] = labels["f_start"].clip(lower=0)
    labels.loc[labels["f_end"] < 0, "f_end"] = 20000

    # dedup: keep the annotation with the largest frequency span
    labels["f_delta"] = labels["f_end"] - labels["f_start"]
    labels = (
        labels.sort_values("f_delta", ascending=False)
        .drop_duplicates(["filename", "t_start", "species"])
        .sort_values(["filename", "t_start"])
    )
    del labels["f_delta"]

    labels["species"] = labels["species"].map(
        lambda x: SPECIES_REPLACEMENTS.get(x, x)
    )
    labels["bird_id"] = labels["species"].map(lambda x: birds_dict.get(x, np.nan))
    labels.loc[labels["species"].isin(NOISE_LABELS), "bird_id"] = -1
    mask_others = labels["species"].map(lambda x: "autre" in x.lower())
    labels.loc[mask_others | labels["species"].isin(NOT_BIRD_LABELS), "bird_id"] = 0
    labels = labels.fillna({"bird_id": birds_dict["Other"]})
    labels["bird_id"] = labels["bird_id"].astype(int)

    if suppress_noise:
        labels = labels.loc[labels["bird_id"] != -1]
    if suppress_others:
        labels = labels.loc[labels["bird_id"] != 0]
    if suppress_unID:
        labels = labels.loc[~labels["species"].isin(UNIDENTIFIED)]
    labels.index = range(len(labels))
    return labels


def merge_and_filter_labels(
    labels: pd.DataFrame,
    filename: str,
    n_windows: int,
    total_frames: int,
    cfg: FrontendConfig,
    is_mp3: bool = False,
) -> Optional[pd.DataFrame]:
    """Assign file labels to window indices with the reference's pixel
    conversions and intersection filters (reference:
    prepare_dataset.py:297-375). Returns one row per positive window
    ('index', 'coord' list, 'bird_id' list), or None when annotations are
    unusable (the reference raises and skips the file)."""
    lab = labels.loc[labels["filename"] == filename].copy()
    if is_mp3:
        for col in ("t_start", "t_end"):
            lab[col] = lab[col] - 0.03
    if len(lab) == 0:
        return None

    dt = cfg.dt_actual
    fa = cfg.freq_accuracy_actual
    low_f, high_f = cfg.low_freq, cfg.high_freq
    w_pix, h_pix, hop = cfg.w_pix, cfg.h_pix, cfg.hop_spectro

    for src, dst in (("t_start", "x_1"), ("t_end", "x_2")):
        lab[dst] = (lab[src].astype(float) / dt).astype(int)
    for src, dst in (("f_start", "y_1"), ("f_end", "y_2")):
        lab[dst] = ((lab[src].clip(lower=low_f, upper=high_f) - low_f) / fa).astype(int)

    lab = lab.loc[lab["y_1"] != lab["y_2"]]
    lab.index = range(len(lab))
    lab["w"] = lab["x_2"] - lab["x_1"] + 1
    lab["h"] = lab["y_2"] - lab["y_1"] + 1
    for size in ("w", "h"):
        lab = lab.loc[lab[size] > 0]

    img_coord = pd.DataFrame(
        [(i * hop, i * hop + w_pix - 1) for i in range(n_windows)],
        columns=["start", "end"],
    )
    img_coord["joint"] = 1
    img_coord = img_coord.reset_index()
    lab["joint"] = 1
    lab = lab[["x_1", "y_1", "x_2", "y_2", "w", "h", "joint", "bird_id"]].merge(
        img_coord, on="joint"
    )
    lab = lab.loc[
        lab["x_1"].between(lab["start"], lab["end"])
        | lab["x_2"].between(lab["start"], lab["end"])
        | (lab["x_1"].lt(lab["start"]) & lab["x_2"].gt(lab["end"]))
    ]

    lab["inside"] = lab[["x_2", "end"]].min(axis=1) - lab[["x_1", "start"]].max(axis=1) + 1
    cond_1 = (lab["inside"] < 0.5 * lab["w"]) & (lab["inside"] < 20)
    cond_2 = (lab["inside"] < 0.1 * lab["w"]) & (lab["inside"] < 45)
    lab = lab.loc[~(cond_1 | cond_2)]

    lab["x_1"] = (lab["x_1"] - lab["start"]).clip(lower=0)
    lab["x_2"] = (lab["x_2"] - lab["start"]).clip(upper=w_pix - 1)
    lab["y_1"] = lab["y_1"].clip(lower=0)
    lab["y_2"] = lab["y_2"].clip(upper=h_pix - 1)
    lab["w"] = lab["x_2"] - lab["x_1"]
    lab["h"] = lab["y_2"] - lab["y_1"]
    lab["coord"] = list(zip(lab["x_1"], lab["y_1"], lab["x_2"], lab["y_2"]))

    # drop negative-only rows from windows that also hold positives
    counts = (
        lab.loc[lab["bird_id"] != -1].groupby("index").size().reset_index(name="count")
    )
    lab = lab.merge(counts, on="index", how="left").fillna({"count": 0})
    lab = lab.loc[(lab["bird_id"] != -1) | (lab["count"] == 0)]

    return lab.groupby("index", as_index=False).agg(
        {"coord": list, "bird_id": list}
    )


def _write_png(path: str, img: np.ndarray) -> None:
    import imageio

    imageio.imwrite(path, np.round(img * 255).astype(np.uint8))


def process_file(
    filepath: str,
    labels: Optional[pd.DataFrame],
    cfg: FrontendConfig,
    frontend: Optional[SpectrogramFrontend] = None,
):
    """File_Processor.process_file equivalent: -> (windows (n, h, w) np
    array, annotations df or None), with in-memory long-file slicing
    (reference: prepare_dataset.py:108-157,187-225)."""
    frontend = frontend or SpectrogramFrontend(cfg)
    samples = load_audio(filepath, cfg.sample_rate)
    if samples is None:
        return None, None
    filename = os.path.basename(filepath)
    filename = filename[: filename.rfind(".")]
    is_mp3 = filepath.lower().endswith(".mp3")

    max_l = cfg.long_file_samples - cfg.long_file_samples % cfg.sample_rate
    if len(samples) <= max_l:
        return _process_slice(samples, labels, filename, cfg, frontend, is_mp3)

    # long file: per-slice processing with label time offsets
    all_wins, all_annots, win_offset = [], [], 0
    time_inc = max_l / cfg.sample_rate
    for k in range(int(len(samples) / max_l) + 1):
        sl = samples[k * max_l:(k + 1) * max_l]
        if len(sl) == 0:
            continue
        lab_k = None
        if labels is not None:
            lab_k = labels.loc[labels["filename"] == filename].copy()
            for col in ("t_start", "t_end"):
                lab_k[col] = lab_k[col] - k * time_inc
            lab_k = lab_k.loc[lab_k["t_start"].between(0, time_inc)]
            lab_k["t_end"] = lab_k["t_end"].clip(upper=time_inc)
            lab_k["filename"] = filename
            if len(lab_k) == 0:
                lab_k = None
        wins, annots = _process_slice(sl, lab_k, filename, cfg, frontend, is_mp3)
        if wins is None:
            continue
        if annots is not None:
            annots["index"] = annots["index"] + win_offset
            all_annots.append(annots)
        win_offset += len(wins)
        all_wins.append(wins)
    wins = np.concatenate(all_wins) if all_wins else None
    annots = pd.concat(all_annots, ignore_index=True) if all_annots else None
    return wins, annots


def _process_slice(samples, labels, filename, cfg, frontend, is_mp3):
    res = frontend.process(samples)
    if labels is not None and len(labels.loc[labels["filename"] == filename]) > 0:
        # labels cap the tail-pad budget as in the reference
        # (prepare_dataset.py:282-285)
        max_pix = int(labels.loc[labels["filename"] == filename, "t_end"].max()
                      / cfg.dt_actual)
        empty_width = res.total_frames - max_pix
        res = frontend.process(samples, empty_width=empty_width)
    wins = np.asarray(res.windows())
    annots = None
    if labels is not None:
        annots = merge_and_filter_labels(
            labels, filename, res.n_windows, res.total_frames, cfg, is_mp3
        )
        if annots is None:
            # unusable/empty annotations for a labeled run: the reference
            # raises and skips the whole file (prepare_dataset.py:150-154,
            # 313-315) rather than emitting negatives
            return None, None
    return wins, annots


def prepare_dataset(
    directory: str,
    out_directory: str,
    annotations: bool = True,
    audio_format: str = "",
    bird_dict_path: Optional[str] = None,
    cfg: Optional[FrontendConfig] = None,
) -> None:
    """Walk a directory of audio (+ txt annotations) and write the training
    image dataset (reference: prepare_dataset, prepare_dataset.py:12-89)."""
    cfg = cfg or FrontendConfig()
    frontend = SpectrogramFrontend(cfg)
    top_dir = directory.rstrip("/").split("/")[-1]

    if audio_format:
        audio_files = glob.glob(os.path.join(directory, f"*.{audio_format}"))
    else:
        audio_files = glob.glob(os.path.join(directory, "*.wav")) + glob.glob(
            os.path.join(directory, "*.mp3")
        )
    labels = (
        create_label_dataset(directory, suppress_unID=True, bird_dict_path=bird_dict_path)
        if annotations
        else None
    )

    for file in audio_files:
        filename = os.path.basename(file)
        filename = filename[: filename.rfind(".")].replace("#", "__")
        out_pos = os.path.join(out_directory, "positive_files", f"{top_dir}__{filename}")
        out_neg = os.path.join(out_directory, "negative_files", f"{top_dir}__{filename}")
        if os.path.exists(out_pos) or os.path.exists(out_neg):
            continue
        print(f"~~~ Processing file {filename} ~~~")
        wins, annots = process_file(file, labels, cfg, frontend)
        if wins is None:
            continue
        pos_idx = annots["index"].values.astype(int) if annots is not None else np.array([], int)
        n_img = len(wins)
        if len(pos_idx) > 0:
            os.makedirs(out_pos, exist_ok=True)
            annots.to_csv(os.path.join(out_pos, "annotations.csv"), sep=";", index=False)
        if len(pos_idx) < n_img:
            os.makedirs(out_neg, exist_ok=True)
        for i in range(n_img):
            name = "__".join([top_dir, filename, format(i, "05d")]) + ".png"
            if i in pos_idx:
                _write_png(os.path.join(out_pos, name), wins[i])
            elif i <= 999:
                _write_png(os.path.join(out_neg, name), wins[i])


def main(argv=None) -> int:
    """`nbm-prepare` console script. The reference exposes dataset building
    only as a library function (prepare_dataset.py:12-89); this wraps it
    with the same defaults."""
    import argparse

    p = argparse.ArgumentParser("NBM training-image dataset builder")
    p.add_argument("--dir", required=True,
                   help="directory of audio files (+ Audacity .txt annotations)")
    p.add_argument("--out", required=True, help="output dataset directory")
    p.add_argument("--no_annotations", action="store_true",
                   help="negative-only corpus: skip the label ETL")
    p.add_argument("--audio_format", default="",
                   help="restrict to one extension (default: wav + mp3)")
    p.add_argument("--bird_dict", default=None,
                   help="species->id JSON (default: bundled asset)")
    a = p.parse_args(argv)
    prepare_dataset(
        a.dir,
        a.out,
        annotations=not a.no_annotations,
        audio_format=a.audio_format,
        bird_dict_path=a.bird_dict,
    )
    return 0
