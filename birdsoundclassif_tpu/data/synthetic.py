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


# ---------------------------------------------------------------------------
# Hard-mode corpus: ~150 species with overlapping bands, distinguished only
# by call morphology (shape/trill/harmonics/AM), plus interference sounds —
# the class-scale regime of the reference's real task (151-way bird_dict,
# train.py:340-343 hard negatives). A protocol this corpus does NOT saturate.
# ---------------------------------------------------------------------------

CALL_SHAPES = ("up", "down", "vee", "hat", "flat", "trill")


def species_bank(names: Sequence[str], rng: np.random.Generator):
    """One synthetic acoustic signature per species name.

    Center frequencies are log-uniform over 1.2-10 kHz and bandwidths reach
    2.2 kHz, so bands overlap heavily across ~150 species — classification
    must rely on morphology (shape, duration, trill rate, harmonic stack,
    amplitude modulation), not band position alone.

    -> list of dicts with keys name, fc, bw, dur, shape, trill_rate,
    n_harm, harm_amp, am_depth, am_rate.
    """
    bank = []
    for name in names:
        fc = float(np.exp(rng.uniform(np.log(1200.0), np.log(10_000.0))))
        bank.append({
            "name": name,
            "fc": fc,
            "bw": float(rng.uniform(600.0, 2200.0)),
            "dur": float(rng.uniform(0.2, 0.65)),
            "shape": CALL_SHAPES[int(rng.integers(len(CALL_SHAPES)))],
            "trill_rate": float(rng.uniform(8.0, 40.0)),
            "n_harm": int(rng.choice([0, 1, 2], p=[0.5, 0.3, 0.2])),
            "harm_amp": float(rng.uniform(0.25, 0.55)),
            "am_depth": float(rng.uniform(0.0, 0.5)),
            "am_rate": float(rng.uniform(10.0, 60.0)),
        })
    return bank


def synth_call(spec: Dict, rng: np.random.Generator, sr: int = SAMPLE_RATE):
    """-> (samples, f_low, f_high) for one call of a species_bank entry.

    The instantaneous-frequency path is built per shape and integrated to
    phase; harmonics below Nyquist are stacked at geometric amplitudes."""
    dur = spec["dur"] * float(rng.uniform(0.85, 1.15))
    n = max(8, int(dur * sr))
    t = np.arange(n) / sr
    fc, bw = spec["fc"], spec["bw"]
    f_lo, f_hi = fc - bw / 2, fc + bw / 2
    u = t / dur  # 0..1
    shape = spec["shape"]
    if shape == "up":
        f = f_lo + (f_hi - f_lo) * u
    elif shape == "down":
        f = f_hi - (f_hi - f_lo) * u
    elif shape == "vee":
        f = f_hi - (f_hi - f_lo) * (1 - np.abs(2 * u - 1))
    elif shape == "hat":
        f = f_lo + (f_hi - f_lo) * (1 - np.abs(2 * u - 1))
    elif shape == "flat":
        f = np.full(n, fc)
    else:  # trill: sinusoidal FM across the band
        f = fc + (bw / 2) * np.sin(2 * np.pi * spec["trill_rate"] * t)
    phase = 2 * np.pi * np.cumsum(f) / sr
    sig = np.sin(phase)
    for k in range(2, spec["n_harm"] + 2):
        if k * f_hi < sr / 2:
            sig = sig + spec["harm_amp"] ** (k - 1) * np.sin(k * phase)
    if spec["am_depth"] > 0:
        sig = sig * (1 - spec["am_depth"] / 2
                     + (spec["am_depth"] / 2) * np.sin(2 * np.pi * spec["am_rate"] * t))
    env = np.hanning(n)
    # the annotation band is the FUNDAMENTAL trace (as a human annotator
    # boxes the main trace); harmonic energy stays unannotated context
    return sig * env, f_lo, f_hi


def synth_interference(kind: str, duration_s: float, rng: np.random.Generator,
                       sr: int = SAMPLE_RATE) -> np.ndarray:
    """Non-bird interference for negative / hard-negative material:
    rain (impulse clicks), wind (low-band rumble), insect (continuous AM
    tone) — broadband or tonal energy that overlaps call bands without
    being a call."""
    n = int(duration_s * sr)
    t = np.arange(n) / sr
    if kind == "rain":
        sig = np.zeros(n)
        n_drops = int(duration_s * rng.uniform(30, 120))
        pos = rng.integers(0, n - 50, n_drops)
        for p in pos:
            click = rng.standard_normal(50) * np.exp(-np.arange(50) / 10.0)
            sig[p:p + 50] += 0.3 * click
        return sig
    if kind == "wind":
        # leaky integrator (one-pole low-pass) over white noise
        from scipy.signal import lfilter

        a = 0.995
        sig = lfilter([1 - a], [1, -a], rng.standard_normal(n))
        return sig / (np.abs(sig).max() + 1e-9) * 0.5
    # insect: continuous high-frequency AM carrier
    fc = rng.uniform(4000, 9000)
    return 0.25 * np.sin(2 * np.pi * fc * t) * (
        0.6 + 0.4 * np.square(np.sin(2 * np.pi * rng.uniform(15, 45) * t)))


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


def synth_hard_recording(
    spec: Dict,
    duration_s: float,
    n_calls: int,
    rng: np.random.Generator,
    noise: float = 0.02,
    interference_p: float = 0.5,
    sr: int = SAMPLE_RATE,
    randomize_fc: bool = False,
) -> Tuple[np.ndarray, List[Tuple[float, float, float, float, str]]]:
    """One recording of a species_bank entry: noise floor + calls with
    per-call amplitude/duration jitter + (p=interference_p) one overlaid
    interference bed. -> (samples, annots).

    randomize_fc=True draws a FRESH center frequency per call (log-uniform
    over the species_bank range) so species identity is carried by call
    morphology alone — the leak-controlled corpus arm of
    ATTRIBUTION_r5.json (the default corpus gives every species a fixed
    band, which the detector's absolute-position RoI PE can read)."""
    n = int(duration_s * sr)
    sig = noise * rng.standard_normal(n)
    if rng.random() < interference_p:
        kind = ("rain", "wind", "insect")[int(rng.integers(3))]
        sig = sig + synth_interference(kind, duration_s, rng, sr)
    annots = []
    # random non-overlapping call starts
    starts = []
    guard = spec["dur"] * 1.3 + 0.2
    for _ in range(200):
        if len(starts) >= n_calls:
            break
        c = float(rng.uniform(0.4, duration_s - spec["dur"] * 1.2 - 0.4))
        if all(abs(c - s) > guard for s in starts):
            starts.append(c)
    for t0 in sorted(starts):
        call_spec = spec
        if randomize_fc:
            fc = float(np.exp(rng.uniform(np.log(1200.0), np.log(10_000.0))))
            call_spec = {**spec, "fc": fc}
        call, f_lo, f_hi = synth_call(call_spec, rng, sr)
        amp = float(rng.uniform(0.25, 0.5))
        i0 = int(t0 * sr)
        seg = min(len(call), n - i0)
        sig[i0:i0 + seg] += amp * call[:seg]
        annots.append((float(t0), float(t0 + seg / sr), f_lo, f_hi,
                       spec["name"]))
    return np.clip(sig, -1, 1), annots


def write_hard_corpus(
    rec_dir: str,
    test_dir: str,
    neg_dir: str,
    rng: np.random.Generator,
    names: Sequence[str],
    files_per_species: int = 2,
    test_every: int = 1,
    train_duration_s: float = 12.0,
    test_duration_s: float = 12.0,
    calls_per_file: int = 5,
    n_negative_files: int = 20,
    randomize_fc: bool = False,
    test_files_per_species: int = 1,
) -> Dict[str, int]:
    """The class-scale training corpus (VERDICT r2 next #3): one
    species_bank signature per name (overlapping bands, morphology-coded
    classes), train recordings under rec_dir, test pairs under test_dir
    (every `test_every`-th species), and annotation-free interference-only
    recordings under neg_dir for false-positive-rate measurement.

    randomize_fc (see synth_hard_recording) makes the corpus
    morphology-only; test_files_per_species >= 3 (with calls_per_file 4)
    keeps the AP protocol's perfect-detector ceiling at 1.0
    (tests/test_eval_ap.py::test_ap_ceiling_vs_gt_count)."""
    os.makedirs(rec_dir, exist_ok=True)
    os.makedirs(test_dir, exist_ok=True)
    os.makedirs(neg_dir, exist_ok=True)
    bank = species_bank(names, rng)
    counts = {"train_files": 0, "test_files": 0, "neg_files": 0}
    uid = 50_000
    for si, spec in enumerate(bank):
        tag = spec["name"].lower().replace(" ", "_")
        for _ in range(files_per_species):
            sig, annots = synth_hard_recording(
                spec, train_duration_s, calls_per_file, rng,
                randomize_fc=randomize_fc)
            base = os.path.join(rec_dir, f"{tag}#XC{uid}")
            write_wav(base + ".wav", sig)
            write_annots(base + ".txt", annots)
            counts["train_files"] += 1
            uid += 1
        for _ in range(test_files_per_species if si % test_every == 0 else 0):
            sig, annots = synth_hard_recording(
                spec, test_duration_s, calls_per_file, rng,
                randomize_fc=randomize_fc)
            base = os.path.join(test_dir, f"{tag}#XC{uid}")
            write_wav(base + ".wav", sig)
            write_annots(base + ".txt", annots)
            counts["test_files"] += 1
            uid += 1
    for _ in range(n_negative_files):
        kind = ("rain", "wind", "insect")[int(rng.integers(3))]
        sig = 0.02 * rng.standard_normal(int(test_duration_s * SAMPLE_RATE))
        sig = sig + synth_interference(kind, test_duration_s, rng)
        path = os.path.join(neg_dir, f"interference#XC{uid}.wav")
        write_wav(path, np.clip(sig, -1, 1))
        counts["neg_files"] += 1
        uid += 1
    return counts


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
