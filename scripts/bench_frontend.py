"""Chip bench for the audio front-end (settles VERDICT r2 next #6).

Default mode times `SpectrogramFrontend.process` end-to-end on a 600 s
int16 file (wire-codec transfer included). `--device-only` isolates the
device compute: the padded signal starts on device and the frame-block
size is swept.

Measurement discipline (CLAUDE.md): every rep forces a host readback
(jax.block_until_ready does not block through the axon tunnel) and the
RTT of a trivial op is reported for subtraction.

History: a fused Pallas STFT kernel (audio/pallas_stft.py, deleted in r3)
was compared here on chip and lost to the XLA DFT-matmul path —
end-to-end 2773 ms vs 2004 ms; device-only (RTT-subtracted) ~30 ms vs
~19 ms for 600 s of audio, best block sizes for each (Pallas bf=256:
60.3 ms raw, bf=512: 60.4; XLA bf=2048: 49.8 ms raw, bf=256: 53.0;
RTT 30.4 ms; identical checksums to 3e-5 relative). Root cause: Mosaic
cannot lower the lane-misaligned hop-132 framing, so the kernel required
n_seg=8 hop-shifted copies of the signal in HBM plus a final
(blocks, h, bf) transpose, while XLA fuses framing into the matmul.
Full numbers in docs/BENCH.md.

Usage: python scripts/bench_frontend.py [--seconds 600] [--reps 5]
                                        [--device-only]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_pcm(seconds: float, sr: int):
    import numpy as np

    n = int(seconds * sr)
    rng = np.random.default_rng(0)
    # realistic PCM: broadband noise + a few tones so the dB surface is lively
    t = np.arange(n) / sr
    sig = 0.05 * rng.standard_normal(n)
    for f in (1200.0, 3400.0, 7800.0):
        sig += 0.1 * np.sin(2 * np.pi * f * t)
    return np.clip(sig * 32767.0, -32768, 32767).astype(np.int16)


def rtt_probe(reps=7):
    import jax.numpy as jnp
    import numpy as np

    x = jnp.float32(1.0)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float((x + 1.0).sum())
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--seconds", type=float, default=600.0)
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--device-only", action="store_true",
                   help="isolate device compute: signal already on device, "
                        "sweep frame-block sizes")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    )
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from birdsoundclassif_tpu.audio.frontend import FrontendConfig, SpectrogramFrontend

    cfg = FrontendConfig()
    pcm = make_pcm(args.seconds, cfg.sample_rate)

    if args.device_only:
        return device_only(args, pcm)

    def run(frontend):
        fe = frontend.process(pcm)
        # force full materialization: read back a reduction over the spec
        return float(jnp.sum(fe.spec_padded)), fe

    results = {}
    for name, fe_obj in (
        ("wire_codec", SpectrogramFrontend(cfg, wire_codec=True)),
        ("raw_int16", SpectrogramFrontend(cfg, wire_codec=False)),
    ):
        run(fe_obj)  # compile + warm
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            run(fe_obj)
            ts.append(time.perf_counter() - t0)
        results[name] = float(np.median(ts))
        print(f"{name}: median {results[name]*1e3:.1f} ms over {args.reps} reps "
              f"(all: {[round(x*1e3,1) for x in ts]})", flush=True)

    rtt = rtt_probe()
    print(f"rtt: {rtt*1e3:.1f} ms", flush=True)

    import json
    out = {
        "seconds": args.seconds,
        "reps": args.reps,
        "rtt_ms": rtt * 1e3,
        **{f"{k}_ms": v * 1e3 for k, v in results.items()},
    }
    print(json.dumps(out), flush=True)
    return 0


def device_only(args, pcm) -> int:
    """Device-compute isolation: the padded signal starts on device; one
    timed call = spectrogram compute + normalize + forced readback of a
    scalar reduction. The donated out-buffer is re-allocated each rep
    OUTSIDE the timed region (donation invalidates the old buffer)."""
    import json
    import jax
    import jax.numpy as jnp
    import numpy as np

    from birdsoundclassif_tpu.audio.frontend import (
        FRAME_BUCKET, FrontendConfig, _chunk_spectrogram, _normalize,
    )

    cfg = FrontendConfig()
    hop, n_fft = cfg.hop_length, cfg.win_length
    pad = n_fft // 2
    n = pcm.size
    n_frames = 1 + n // hop

    results = {}

    def bench(name, fn, prep, reps):
        s = fn(prep())  # warm/compile
        ts = []
        for _ in range(reps):
            a = prep()
            t0 = time.perf_counter()
            s = fn(a)
            ts.append(time.perf_counter() - t0)
        med = float(np.median(ts))
        results[name] = {"ms": med * 1e3, "checksum": s}
        print(f"{name}: median {med*1e3:.1f} ms "
              f"(all: {[round(x*1e3,1) for x in ts]}) checksum={s:.6e}",
              flush=True)

    for bf in (256, 512, 1024, 2048, 4096, 16384):
        n_blocks = -(-n_frames // bf)
        l_bucket = n_blocks * bf * hop
        padded_np = np.zeros((l_bucket + 2 * pad,), np.float32)
        padded_np[pad:pad + n] = pcm.astype(np.float32) / 32768.0
        padded = jax.device_put(jnp.asarray(padded_np))
        t_alloc = -(-max(n_frames, n_blocks * bf, 1) // FRAME_BUCKET) * FRAME_BUCKET

        def xla_prep():
            return jax.block_until_ready(jnp.zeros((cfg.h_pix, t_alloc), jnp.float32))

        def xla_run(buf, _padded=padded, _n_blocks=n_blocks, _bf=bf):
            out, mn, mx = _chunk_spectrogram(
                _padded, buf, jnp.int32(0), jnp.int32(n_frames),
                jnp.float32(np.inf), jnp.float32(-np.inf),
                _n_blocks, _bf, hop, n_fft, cfg.low_idx, cfg.high_idx,
                cfg.db_floor, 1.0,
            )
            return float(jnp.sum(_normalize(out, mn, mx)[:, :n_frames]))

        bench(f"xla_bf{bf}", xla_run, xla_prep, args.reps)

    rtt = rtt_probe()
    print(f"rtt: {rtt*1e3:.1f} ms", flush=True)
    out = {"mode": "device_only", "seconds": args.seconds, "reps": args.reps,
           "rtt_ms": rtt * 1e3,
           **{k: v["ms"] for k, v in results.items()}}
    print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
