"""Benchmark: end-to-end inference throughput in audio-hours/sec/chip.

Runs the full pipeline (PCM -> device STFT -> window batch -> detector ->
cross-window merge) on synthetic audio with the flagship config and prints
ONE JSON line. Baseline: 50x real-time (BASELINE.md north star) ==
50/3600 audio-hours/sec.
"""

import json
import os
import time

import numpy as np


def main():
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import jax.numpy as jnp

    from birdsoundclassif_tpu.config import NbmConfig
    from birdsoundclassif_tpu.audio.frontend import SpectrogramFrontend
    from birdsoundclassif_tpu.infer.pipeline import detect_samples
    from birdsoundclassif_tpu.models.detector import NbmModel

    seconds = float(os.environ.get("BENCH_SECONDS", "600"))  # nocturnal recordings are long
    batch = int(os.environ.get("BENCH_BATCH", "32"))
    repeats = int(os.environ.get("BENCH_REPEATS", "3"))

    from birdsoundclassif_tpu.models.optimize import fold_frozen_bn

    cfg = NbmConfig()
    params = fold_frozen_bn(NbmModel.init(jax.random.PRNGKey(0), cfg), cfg)

    sr = cfg.frontend.sample_rate
    rng = np.random.default_rng(0)
    t = np.arange(int(seconds * sr)) / sr
    samples_f = (
        0.2 * np.sin(2 * np.pi * 2500.0 * t) * (np.sin(2 * np.pi * 0.7 * t) > 0)
        + 0.01 * rng.standard_normal(t.shape)
    )
    # PCM16 int path: what real recordings are, and half the link bytes
    samples = (np.clip(samples_f, -1, 1) * 32767).astype(np.int16)

    frontend = SpectrogramFrontend(cfg.frontend)

    def run_once():
        return detect_samples(params, cfg, samples, 0.2, batch, frontend)

    run_once()  # compile
    t0 = time.perf_counter()
    for _ in range(repeats):
        run_once()
    elapsed = time.perf_counter() - t0

    audio_hours_per_sec = (seconds * repeats / elapsed) / 3600.0
    baseline = 50.0 / 3600.0  # 50x real-time
    print(
        json.dumps(
            {
                "metric": "inference_audio_hours_per_sec_per_chip",
                "value": round(audio_hours_per_sec, 4),
                "unit": "audio-hours/sec/chip",
                "vs_baseline": round(audio_hours_per_sec / baseline, 3),
                "detail": {
                    "audio_seconds": seconds,
                    "batch": batch,
                    "repeats": repeats,
                    "elapsed_sec": round(elapsed, 3),
                    "realtime_factor": round(seconds * repeats / elapsed, 1),
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
