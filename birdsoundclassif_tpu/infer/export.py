"""AOT export + compile-cache warming for the whole-file detection program.

Production-serving machinery with no reference analog: the reference
rebuilds its model from Python source + a torch checkpoint on every start
(reference: run_detection.py:87-122) and pays tracing + compilation on the
first batch. Here the one-dispatch-per-file XLA program
(`pipeline._file_program_impl`) is serialized with `jax.export`:

* the artifact IS the program — a deployment needs the params npz, the cfg
  JSON, and the StableHLO blobs, not a matching copy of the model code;
* the spectrogram time axis is exported shape-polymorphic
  (``8192*k`` — the pipeline's _FRAME_BUCKET granularity), so one program
  per window bucket serves any file duration;
* ``min_score`` is a runtime scalar in the exported signature (static on
  the live path), so the deployed threshold stays tunable without
  re-exporting. ``nms_thresh`` is baked at export time: the Pallas NMS
  kernel specializes on it, and the reference hardcodes 0.3 at inference
  (reference: nbm_model.py:66-80 default).

The exported blobs still compile on first use on the target (jax.export
removes tracing, not XLA compilation) — `warm()` covers that side: it
dispatches the live program for the expected file durations so the
persistent compilation cache is populated before production traffic.

CLI: ``nbm-export --ckpt DIR --out DIR`` / ``nbm-export --warm --ckpt DIR``.
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import NbmConfig
from ..utils.checkpoint import load_params, save_params
from .pipeline import _FRAME_BUCKET, _file_program_impl

_FORMAT_VERSION = 1
_MANIFEST = "manifest.json"


def _program_name(n_bucket: int) -> str:
    return f"file_program_n{n_bucket}.stablehlo"


def _bucket_sizes(batch_size: int, max_windows: int) -> list:
    """Window-count buckets: batch_size * 2**i, matching the live path's
    power-of-two chunk-count padding (pipeline.detect_file_packed)."""
    out = [batch_size]
    while out[-1] * 2 <= max_windows:
        out.append(out[-1] * 2)
    return out


def export_detector(
    params,
    cfg: NbmConfig,
    out_dir: str,
    batch_size: int = 32,
    max_windows: int = 512,
    nms_thresh: float = 0.3,
    platforms: Optional[Sequence[str]] = ("tpu",),
) -> dict:
    """Serialize the whole-file program for every window bucket into
    `out_dir` (blobs + manifest + cfg JSON + params npz). `params` must
    already be inference-folded (pipeline.load_model does this).

    Returns the manifest dict. `platforms=None` exports for the current
    backend only. Artifacts are single-platform: a multi-platform export
    would lower the Pallas-NMS branch of `lax.platform_dependent`
    (ops/nms.py greedy_nms_prefix) for CPU as well, which Pallas refuses
    outside interpret mode — export ("tpu",) for deployment (works from a
    CPU host; Mosaic lowering is host-independent) and ("cpu",) for CI.
    """
    from jax import export as jexport

    os.makedirs(out_dir, exist_ok=True)
    fe = cfg.frontend
    h, w = fe.h_pix, fe.w_pix
    p_spec = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(np.shape(a), jnp.asarray(a).dtype), params
    )
    buckets = _bucket_sizes(batch_size, max_windows)
    programs = {}
    for n_bucket in buckets:
        def fn(p, spec_p, cols, n_real, spectrogram_length, min_score,
               _n_bucket=n_bucket):
            return _file_program_impl(
                p, spec_p, cols, n_real, spectrogram_length, cfg,
                batch_size, nms_thresh, min_score, _n_bucket,
            )

        (tdim,) = jexport.symbolic_shape(f"{_FRAME_BUCKET}*k")
        specs = (
            p_spec,
            jax.ShapeDtypeStruct((h, tdim), jnp.float32),
            jax.ShapeDtypeStruct((n_bucket, w), jnp.int32),
            jax.ShapeDtypeStruct((), jnp.int32),
            jax.ShapeDtypeStruct((), jnp.float32),
            jax.ShapeDtypeStruct((), jnp.float32),
        )
        kw = {} if platforms is None else {"platforms": list(platforms)}
        exported = jexport.export(jax.jit(fn), **kw)(*specs)
        name = _program_name(n_bucket)
        with open(os.path.join(out_dir, name), "wb") as f:
            f.write(exported.serialize())
        programs[str(n_bucket)] = name

    cfg.save(os.path.join(out_dir, "args"))
    save_params(out_dir, params)
    manifest = {
        "format_version": _FORMAT_VERSION,
        "jax_version": jax.__version__,
        "batch_size": batch_size,
        "nms_thresh": nms_thresh,
        "frame_bucket": _FRAME_BUCKET,
        "platforms": list(platforms) if platforms is not None
        else [jax.default_backend()],
        "n_buckets": buckets,
        "programs": programs,
    }
    with open(os.path.join(out_dir, _MANIFEST), "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest


class ExportedDetector:
    """Loaded export artifact: cfg + params + per-bucket programs.

    Mirrors `pipeline.detect_file_packed`'s calling convention so it plugs
    into `stream_detections(detect_fn=...)`, the sweep, and the serve
    daemon unchanged. Programs are deserialized lazily and each wrapped in
    one `jax.jit` so repeat calls hit the dispatch fast path.
    """

    def __init__(self, out_dir: str, manifest: dict, cfg: NbmConfig, params):
        self.out_dir = out_dir
        self.manifest = manifest
        self.cfg = cfg
        self.params = params
        self.batch_size = int(manifest["batch_size"])
        self.nms_thresh = float(manifest["nms_thresh"])
        self._frame_bucket = int(manifest["frame_bucket"])
        self._buckets = sorted(int(b) for b in manifest["programs"])
        self._fns = {}

    @classmethod
    def load(cls, out_dir: str) -> "ExportedDetector":
        with open(os.path.join(out_dir, _MANIFEST)) as f:
            manifest = json.load(f)
        if manifest.get("format_version") != _FORMAT_VERSION:
            raise ValueError(
                f"unsupported export format_version {manifest.get('format_version')} "
                f"(this build reads {_FORMAT_VERSION})"
            )
        cfg = NbmConfig.load(os.path.join(out_dir, "args"))
        params = load_params(out_dir, cfg)  # already inference-folded
        return cls(out_dir, manifest, cfg, params)

    def _fn(self, n_bucket: int):
        fn = self._fns.get(n_bucket)
        if fn is None:
            from jax import export as jexport

            path = os.path.join(self.out_dir, self.manifest["programs"][str(n_bucket)])
            with open(path, "rb") as f:
                fn = jax.jit(jexport.deserialize(f.read()).call)
            self._fns[n_bucket] = fn
        return fn

    def detect_file_packed(self, fe_res, min_score: float):
        """Dispatch the exported program for one file; returns the packed
        (max_boxes+1, 7) merge output on device (same contract as
        pipeline.detect_file_packed)."""
        spec = fe_res.spec_padded
        t = spec.shape[1]
        fb = self._frame_bucket
        t_pad = max(fb, -(-t // fb) * fb)
        if t_pad != t:
            spec = jnp.pad(spec, ((0, 0), (0, t_pad - t)))
        n = fe_res.n_windows
        n_chunks = max(1, -(-n // self.batch_size))
        n_bucket = self.batch_size * (1 << (n_chunks - 1).bit_length())
        candidates = [b for b in self._buckets if b >= n_bucket]
        if not candidates:
            raise ValueError(
                f"file needs a {n_bucket}-window bucket but the artifact was "
                f"exported up to {self._buckets[-1]} (see nbm-export "
                f"--max_windows); file has {n} windows"
            )
        n_bucket = candidates[0]
        cols = np.zeros((n_bucket, fe_res.window_cols.shape[1]), np.int32)
        cols[:n] = fe_res.window_cols
        return self._fn(n_bucket)(
            self.params, spec, jnp.asarray(cols), jnp.int32(n),
            jnp.float32(fe_res.total_frames), jnp.float32(min_score),
        )

    def stream(self, sources, min_score: float, sample_rate: int = 44_100,
               on_frontend=None):
        """stream_detections over this artifact (same overlap pipeline)."""
        from ..audio.frontend import SpectrogramFrontend
        from .pipeline import stream_detections

        return stream_detections(
            None, self.cfg, SpectrogramFrontend(self.cfg.frontend), sources,
            min_score, self.batch_size, sample_rate=sample_rate,
            on_frontend=on_frontend,
            detect_fn=lambda fe: self.detect_file_packed(fe, min_score),
        )


def warm(
    params,
    cfg: NbmConfig,
    batch_size: int = 32,
    seconds: Sequence[float] = (600.0,),
    min_score: float = 0.003,
    nms_thresh: float = 0.3,
) -> list:
    """Compile the LIVE whole-file programs for the given file durations so
    the persistent compilation cache (jax_compilation_cache_dir) is hot
    before production traffic — behind a remote-compile link the first
    file otherwise pays minutes. Returns the (n_bucket, t_pad) pairs
    compiled. The same shape-bucketing as detect_file_packed guarantees a
    warmed duration covers every file that lands in the same buckets."""
    from ..audio.frontend import FrontendResult, window_column_indices
    from .pipeline import detect_file_packed

    fe = cfg.frontend
    done = []
    for s in seconds:
        total_frames = max(fe.w_pix, int(round(s * fe.sample_rate / fe.hop_length)))
        cols = window_column_indices(total_frames, fe.w_pix, fe.hop_spectro)
        fe_res = FrontendResult(
            spec_padded=jnp.zeros((fe.h_pix, total_frames), jnp.float32),
            window_cols=cols,
            total_frames=total_frames,
            s_min=jnp.float32(0.0),
            s_max=jnp.float32(1.0),
        )
        packed = detect_file_packed(params, cfg, fe_res, min_score,
                                    batch_size, nms_thresh=nms_thresh)
        # force a host readback: block_until_ready does not block through
        # the axon tunnel (docs/BENCH.md)
        float(np.asarray(packed).sum())
        n_chunks = 1 << (max(1, -(-cols.shape[0] // batch_size)) - 1).bit_length()
        t_pad = -(-total_frames // _FRAME_BUCKET) * _FRAME_BUCKET
        done.append((n_chunks * batch_size, t_pad))
    return done


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        "Export the NBM detector as serialized AOT programs, or pre-warm "
        "the compile cache for a deployment"
    )
    p.add_argument("--ckpt", default="model_weights",
                   help="model checkpoint directory (args + params)")
    p.add_argument("--out", default=None,
                   help="artifact output directory (required unless --warm)")
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--max_windows", type=int, default=512,
                   help="largest window bucket to export; a 600 s file at "
                        "the flagship geometry needs 256")
    p.add_argument("--nms_thresh", type=float, default=0.3)
    p.add_argument("--platforms", default="tpu",
                   help="comma-separated lowering platforms ('tpu' or "
                        "'cpu'; 'native' = current backend). One platform "
                        "per artifact — see export_detector")
    p.add_argument("--warm", action="store_true",
                   help="instead of exporting, compile the live programs "
                        "for --seconds file durations into the cache")
    p.add_argument("--seconds", default="600",
                   help="comma-separated file durations for --warm")
    p.add_argument("--min_score", type=float, default=0.003)
    args = p.parse_args(argv)

    from .pipeline import load_model

    params, cfg = load_model(args.ckpt)
    if args.warm:
        shapes = warm(params, cfg, args.batch,
                      [float(s) for s in args.seconds.split(",")],
                      args.min_score, args.nms_thresh)
        print(json.dumps({"warmed": shapes}))
        return 0
    if not args.out:
        p.error("--out is required unless --warm")
    platforms = (None if args.platforms == "native"
                 else tuple(args.platforms.split(",")))
    manifest = export_detector(params, cfg, args.out, args.batch,
                               args.max_windows, args.nms_thresh, platforms)
    print(json.dumps(manifest))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
