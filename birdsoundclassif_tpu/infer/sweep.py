"""Dataset-scale streaming inference sweep (BASELINE config #5).

Processes a directory tree of recordings with the whole-pipeline-on-device
path, data-parallel over the available chips: window batches are sharded
over a 1-D mesh (multiple chips on one host), and multi-host pods shard the
*file list* by process index (each host runs its local chips; no
cross-host traffic is needed because files are independent).

Usage:
  python -m birdsoundclassif_tpu.infer.sweep --ckpt model_weights \
      --audio_dir DIR [--batch 32] [--min_score 0.2] [--out results.jsonl]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import time
from typing import Optional

import jax


def sweep(
    params,
    cfg,
    audio_dir: str,
    batch: int = 32,
    min_score: float = 0.2,
    out_path: Optional[str] = None,
    bird_dict_path: Optional[str] = None,
):
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..audio.frontend import SpectrogramFrontend
    from ..infer.pipeline import (
        load_bird_dict,
        packed_to_species_dict,
        stream_detections,
    )
    from ..parallel.mesh import make_mesh

    # local devices only: each host meshes its own chips and processes its
    # own file shard — a global multi-host mesh would require every host to
    # dispatch the same program in lockstep, which independent files break
    devices = jax.local_devices()
    n_dev = len(devices)
    data_sharding = None
    if n_dev > 1:
        # multiple local chips: params replicated, each scanned window batch
        # sharded over the mesh (the constraint inside _file_program), so
        # the detector FLOPs split n_dev ways with no host-side changes
        mesh = make_mesh(devices)
        params = jax.device_put(params, NamedSharding(mesh, P()))
        batch = -(-batch // n_dev) * n_dev  # divisible by the mesh
        data_sharding = NamedSharding(mesh, P("data"))
    # multi-host: shard the file list by process
    files = sorted(glob.glob(os.path.join(audio_dir, "**", "*.wav"),
                             recursive=True)
                   + glob.glob(os.path.join(audio_dir, "**", "*.mp3"),
                               recursive=True))
    files = files[jax.process_index()::jax.process_count()]

    frontend = SpectrogramFrontend(cfg.frontend)
    _, reverse = load_bird_dict(bird_dict_path)
    sr = cfg.frontend.sample_rate
    dt = cfg.frontend.dt_actual

    writer = open(out_path, "w") if out_path else None
    total_audio_s = 0.0
    t0 = time.perf_counter()
    n_det = 0
    def emit(path, packed):
        nonlocal n_det
        output, dropped = packed_to_species_dict(packed, cfg, reverse)
        n_det += sum(len(e["scores"]) for e in output.values())
        if writer:
            rec = {"file": path, "detections": output}
            if dropped:
                rec["merge_dropped"] = dropped
            writer.write(json.dumps(rec) + "\n")
            writer.flush()
        # reference CLI behavior: one .txt per audio file
        with open(os.path.splitext(path)[0] + ".txt", "w") as f:
            f.write(str(output))

    def on_frontend(path, fe_res):
        nonlocal total_audio_s
        total_audio_s += fe_res.total_frames * dt

    for path, packed in stream_detections(
        params, cfg, frontend, files, min_score, batch,
        sample_rate=sr, data_sharding=data_sharding, on_frontend=on_frontend,
    ):
        emit(path, packed)
    elapsed = time.perf_counter() - t0
    if writer:
        writer.close()
    stats = {
        "files": len(files),
        "audio_seconds": round(total_audio_s, 1),
        "elapsed_seconds": round(elapsed, 2),
        "realtime_factor": round(total_audio_s / max(elapsed, 1e-9), 1),
        "detections": n_det,
        "devices": n_dev,
        "process": jax.process_index(),
    }
    print(json.dumps(stats))
    return stats


def main(argv=None) -> int:
    p = argparse.ArgumentParser("NBM TPU dataset sweep")
    p.add_argument("--ckpt", default="model_weights")
    p.add_argument("--audio_dir", required=True)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--min_score", type=float, default=0.2)
    p.add_argument("--out", default=None)
    p.add_argument("--bird_dict", default=None)
    from ..parallel.mesh import add_distributed_flags, initialize_from_flags

    add_distributed_flags(p)
    a = p.parse_args(argv)
    initialize_from_flags(a, p.error)
    from ..infer.pipeline import load_model

    params, cfg = load_model(a.ckpt)
    sweep(params, cfg, a.audio_dir, a.batch, a.min_score, a.out, a.bird_dict)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
