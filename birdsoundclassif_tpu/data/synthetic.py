"""Synthetic bird-call corpus generator for end-to-end training/eval demos.

The reference's deliverable is a detector trained on real recordings; its
checkpoint ships only as a git-LFS pointer, so this module provides the
from-scratch training fallback (SURVEY §5 checkpoint note): species are
frequency-sweep chirps at distinct bands, with Audacity-format annotations,
so the full ETL -> training -> test-mAP loop can be demonstrated without
the Zenodo dataset. Call geometry (~0.3-0.5 s x 1.2-1.8 kHz bandwidth,
i.e. ~100-170 x 35-55 px boxes) is chosen to resemble real nocturnal
flight calls and to overlap the reference anchor grid (ratio 0.5, scale 4
anchors are 92x44 px — nets_utils.py:35-49).
"""

from __future__ import annotations

import os
import wave
from typing import Dict, List, Sequence, Tuple

import numpy as np

SAMPLE_RATE = 44_100

# (species name in assets/bird_dict.json, center freq Hz, bandwidth Hz,
#  call duration s) — bands are disjoint so the task is learnable
SPECIES_BANK: List[Tuple[str, float, float, float]] = [
    ("Turdus merula", 1800.0, 1200.0, 0.45),
    ("Erithacus rubecula", 3200.0, 1500.0, 0.35),
    ("Fringilla coelebs", 4600.0, 1200.0, 0.40),
    ("Parus major", 6200.0, 1500.0, 0.30),
    ("Sylvia atricapilla", 7800.0, 1800.0, 0.50),
    ("Phylloscopus collybita", 9800.0, 1600.0, 0.35),
]


def _chirp(f0: float, f1: float, dur: float, sr: int = SAMPLE_RATE) -> np.ndarray:
    """Linear chirp f0 -> f1 with a hann envelope."""
    n = int(dur * sr)
    t = np.arange(n) / sr
    phase = 2 * np.pi * (f0 * t + 0.5 * (f1 - f0) / dur * t * t)
    env = np.hanning(n)
    return np.sin(phase) * env


def synth_recording(
    species: Tuple[str, float, float, float],
    duration_s: float,
    n_calls: int,
    rng: np.random.Generator,
    noise: float = 0.015,
    amp: float = 0.4,
    sr: int = SAMPLE_RATE,
) -> Tuple[np.ndarray, List[Tuple[float, float, float, float, str]]]:
    """-> (float samples in [-1,1], [(t0, t1, f_low, f_high, name), ...])."""
    name, fc, bw, dur = species
    n = int(duration_s * sr)
    sig = noise * rng.standard_normal(n)
    annots = []
    # calls at random, non-overlapping positions
    slots = np.sort(rng.choice(
        np.arange(0.5, duration_s - dur - 0.5, dur * 2.2), size=n_calls,
        replace=False,
    ))
    for t0 in slots:
        up = rng.random() > 0.5
        f_lo, f_hi = fc - bw / 2, fc + bw / 2
        call = _chirp(f_lo if up else f_hi, f_hi if up else f_lo, dur, sr)
        i0 = int(t0 * sr)
        sig[i0:i0 + len(call)] += amp * call
        annots.append((float(t0), float(t0 + dur), f_lo, f_hi, name))
    return np.clip(sig, -1, 1), annots


def write_wav(path: str, samples: np.ndarray, sr: int = SAMPLE_RATE) -> None:
    pcm = (np.clip(samples, -1, 1) * 32767).astype("<i2")
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())


def write_annots(path: str, annots: Sequence[Tuple[float, float, float, float, str]]) -> None:
    """Audacity two-line format (time line + frequency line), the format the
    label ETL and the test eval both parse (reference: utils.py:59-92,
    nets_utils.py:419-451)."""
    with open(path, "w") as f:
        for (t0, t1, f_lo, f_hi, name) in annots:
            f.write(f"{t0:.2f}\t{t1:.2f}\t{name}\n")
            f.write(f"\\\t{f_lo:.0f}\t{f_hi:.0f}\n")


def write_corpus(
    rec_dir: str,
    test_dir: str,
    rng: np.random.Generator,
    files_per_species: int = 4,
    train_duration_s: float = 15.0,
    test_duration_s: float = 12.0,
    calls_per_train_file: int = 6,
    calls_per_test_file: int = 4,
    species: Sequence[Tuple[str, float, float, float]] = tuple(SPECIES_BANK),
) -> Dict[str, int]:
    """Write train recordings+annotations under rec_dir and test pairs under
    test_dir. File naming follows the reference convention
    genus_species#XC<id>.wav."""
    os.makedirs(rec_dir, exist_ok=True)
    os.makedirs(test_dir, exist_ok=True)
    counts = {"train_files": 0, "test_files": 0}
    uid = 1000
    for sp in species:
        tag = sp[0].lower().replace(" ", "_")
        for _ in range(files_per_species):
            sig, annots = synth_recording(sp, train_duration_s,
                                          calls_per_train_file, rng)
            base = os.path.join(rec_dir, f"{tag}#XC{uid}")
            write_wav(base + ".wav", sig)
            write_annots(base + ".txt", annots)
            counts["train_files"] += 1
            uid += 1
        sig, annots = synth_recording(sp, test_duration_s,
                                      calls_per_test_file, rng)
        base = os.path.join(test_dir, f"{tag}#XC{uid}")
        write_wav(base + ".wav", sig)
        write_annots(base + ".txt", annots)
        counts["test_files"] += 1
        uid += 1
    return counts
