"""On-chip validation of the TPU export artifact (VERDICT r3 weak #2).

Three phases, each an independent subprocess so compile-cache state can be
controlled per phase (the persistent cache would otherwise hide the very
cold-start costs this measures):

  parity  (shared .jax_cache)  export a tpu-platform artifact of the
          flagship model (nbm-export's default), load it back with
          ExportedDetector.load, sweep the same synthetic files through
          the artifact AND the live path, assert the packed detection
          outputs are IDENTICAL, and time both warm sweeps.
  cold_artifact (fresh cache)  ExportedDetector.load + first-file dispatch:
          deserialize + XLA-compile the StableHLO blob + run. What a
          freshly booted serving replica pays WITHOUT model code.
  cold_live     (fresh cache)  load_model + first-file dispatch on the live
          path: trace + lower + XLA-compile + run. What the replica pays
          WITH model code (the reference rebuilds + re-traces at serve
          time, run_detection.py:87-122).

Usage: python scripts/bench_export.py [--files 4] [--seconds 600]
       [--artifact runs/export_tpu] [--skip_cold]
Prints ONE JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def make_files(n_files, seconds, sr):
    rng = np.random.default_rng(0)
    t = np.arange(int(seconds * sr)) / sr
    files = []
    for i in range(n_files):
        f0 = 1500.0 + 700.0 * i
        sig = (0.2 * np.sin(2 * np.pi * f0 * t)
               * (np.sin(2 * np.pi * 0.7 * t + i) > 0)
               + 0.01 * rng.standard_normal(t.shape))
        files.append((np.clip(sig, -1, 1) * 32767).astype(np.int16))
    return files


def build_params(cfg):
    import jax

    from birdsoundclassif_tpu.models.detector import NbmModel
    from birdsoundclassif_tpu.models.optimize import fold_inference

    return jax.jit(lambda key: fold_inference(NbmModel.init(key, cfg), cfg))(
        jax.random.PRNGKey(0))


def phase_parity(args) -> int:
    import jax

    from birdsoundclassif_tpu.audio.frontend import SpectrogramFrontend
    from birdsoundclassif_tpu.config import NbmConfig
    from birdsoundclassif_tpu.infer.export import ExportedDetector, export_detector
    from birdsoundclassif_tpu.infer.pipeline import stream_detections

    cfg = NbmConfig()
    params = build_params(cfg)

    t0 = time.perf_counter()
    if not os.path.isfile(os.path.join(args.artifact, "manifest.json")):
        export_detector(params, cfg, args.artifact, batch_size=args.batch,
                        max_windows=args.max_windows, platforms=("tpu",))
    export_s = time.perf_counter() - t0

    det = ExportedDetector.load(args.artifact)
    assert det.manifest["platforms"] == ["tpu"], det.manifest["platforms"]

    sr = cfg.frontend.sample_rate
    files = make_files(args.files, args.seconds, sr)
    frontend = SpectrogramFrontend(cfg.frontend)

    def sweep_live():
        out = []
        for _, packed in stream_detections(params, cfg, frontend, files,
                                           args.min_score, args.batch,
                                           sample_rate=sr):
            out.append(np.asarray(packed))
        return out

    def sweep_artifact():
        out = []
        for _, packed in det.stream(files, args.min_score, sample_rate=sr):
            out.append(np.asarray(packed))
        return out

    # warm both paths (compiles through the shared cache), then time
    live0 = sweep_live()
    art0 = sweep_artifact()
    t0 = time.perf_counter()
    live = sweep_live()
    live_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    art = sweep_artifact()
    art_s = time.perf_counter() - t0

    assert len(live) == len(art) == args.files
    for i, (a, b) in enumerate(zip(live, art)):
        if not np.array_equal(a, b):
            raise SystemExit(f"PARITY FAIL file {i}: live != artifact "
                             f"(max|d|={np.abs(a - b).max()})")
    n_det = sum(int((p[:-1, 4] > 0).sum()) for p in live)
    total_audio = args.seconds * args.files
    print(json.dumps({
        "parity_ok": True,
        "files": args.files,
        "detections": n_det,
        "export_s": round(export_s, 1),
        "live_sweep_s": round(live_s, 3),
        "artifact_sweep_s": round(art_s, 3),
        "live_rtf": round(total_audio / live_s, 1),
        "artifact_rtf": round(total_audio / art_s, 1),
        "device": str(jax.devices()[0]),
    }), flush=True)
    return 0


def phase_cold(args, use_artifact: bool) -> int:
    # fresh, throwaway compile cache set by the parent via env
    import jax

    from birdsoundclassif_tpu.audio.frontend import SpectrogramFrontend
    from birdsoundclassif_tpu.config import NbmConfig

    cfg = NbmConfig()
    sr = cfg.frontend.sample_rate
    f = make_files(1, args.seconds, sr)[0]
    frontend = SpectrogramFrontend(cfg.frontend)

    t0 = time.perf_counter()
    if use_artifact:
        from birdsoundclassif_tpu.infer.export import ExportedDetector

        det = ExportedDetector.load(args.artifact)
        load_s = time.perf_counter() - t0
        fe = frontend.process(f)
        t1 = time.perf_counter()
        packed = det.detect_file_packed(fe, args.min_score)
        _ = float(np.asarray(packed).sum())  # host readback forces the sync
        first_s = time.perf_counter() - t1
    else:
        from birdsoundclassif_tpu.infer.pipeline import detect_file_packed

        params = build_params(cfg)
        load_s = time.perf_counter() - t0
        fe = frontend.process(f)
        t1 = time.perf_counter()
        packed = detect_file_packed(params, cfg, fe, args.min_score, args.batch)
        _ = float(np.asarray(packed).sum())
        first_s = time.perf_counter() - t1
    print(json.dumps({
        "phase": "cold_artifact" if use_artifact else "cold_live",
        "load_s": round(load_s, 2),
        "first_file_s": round(first_s, 2),
    }), flush=True)
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--files", type=int, default=4)
    p.add_argument("--seconds", type=float, default=600.0)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--max_windows", type=int, default=256)
    p.add_argument("--min_score", type=float, default=0.003)
    p.add_argument("--artifact", default=os.path.join(REPO, "runs", "export_tpu"))
    p.add_argument("--skip_cold", action="store_true")
    p.add_argument("--phase", default=None, help="(internal) subprocess phase")
    args = p.parse_args(argv)

    if args.phase == "parity":
        return phase_parity(args)
    if args.phase in ("cold_artifact", "cold_live"):
        return phase_cold(args, args.phase == "cold_artifact")

    # parent: orchestrate phases in subprocesses with per-phase cache dirs
    def run(phase, cache_dir):
        code = (
            "import jax; "
            f"jax.config.update('jax_compilation_cache_dir', {cache_dir!r}); "
            "jax.config.update('jax_persistent_cache_min_compile_time_secs', 1); "
            "import sys, runpy; sys.argv = ['bench_export.py'] + sys.argv[1:]; "
            f"runpy.run_path({os.path.abspath(__file__)!r}, run_name='__main__')"
        )
        flags = ["--phase", phase, "--files", str(args.files),
                 "--seconds", str(args.seconds), "--batch", str(args.batch),
                 "--max_windows", str(args.max_windows),
                 "--min_score", str(args.min_score),
                 "--artifact", args.artifact]
        env = os.environ.copy()
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        r = subprocess.run([sys.executable, "-c", code, *flags], cwd=REPO,
                           env=env, capture_output=True, text=True)
        sys.stderr.write(r.stderr[-2000:])
        lines = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
        if r.returncode != 0 or not lines:
            raise SystemExit(f"phase {phase} failed rc={r.returncode}:\n"
                             f"{r.stdout[-2000:]}")
        return json.loads(lines[-1])

    shared_cache = os.path.join(REPO, ".jax_cache")
    out = run("parity", shared_cache)
    if not args.skip_cold:
        import tempfile

        for phase in ("cold_artifact", "cold_live"):
            with tempfile.TemporaryDirectory(prefix=f"nbm_{phase}_") as cold:
                res = run(phase, cold)
            out[phase] = {k: v for k, v in res.items() if k != "phase"}
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
