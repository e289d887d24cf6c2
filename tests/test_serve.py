"""Watch-folder serving daemon (infer/serve.py): backlog drain, manifest
resume, changed-file reprocessing, settle gating, decode-failure
accounting."""

import json
import os
import time
import wave

import jax
import numpy as np

from birdsoundclassif_tpu.config import NbmConfig
from birdsoundclassif_tpu.models import NbmModel


def write_wav(path, samples, sr=44100):
    x = (np.clip(samples, -1, 1) * 32767).astype("<i2")
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(x.tobytes())


def tiny_cfg():
    cfg = NbmConfig()
    cfg.num_classes = 5
    cfg.out_fpn_chan = 16
    cfg.fpn_p_chan = 24
    cfg.depth_rcnn = 1
    cfg.img_height, cfg.img_width = 128, 256
    cfg.pre_nms_topN_eval = 64
    cfg.post_nms_topN_eval = 16
    return cfg


def test_serve_once_resume_and_failures(tmp_path, rng):
    from birdsoundclassif_tpu.infer.serve import Manifest, scan_ready, serve

    cfg = tiny_cfg()
    params = NbmModel.init(jax.random.PRNGKey(0), cfg)
    audio = tmp_path / "audio"
    (audio / "sub").mkdir(parents=True)
    for i in range(2):
        write_wav(audio / f"rec{i}.wav", 0.1 * rng.standard_normal(44100 * 2))
    write_wav(audio / "sub" / "rec2.wav",
              0.1 * rng.standard_normal(44100 * 2))
    (audio / "broken.wav").write_bytes(b"not a riff file")
    out = tmp_path / "results.jsonl"
    manifest = tmp_path / "manifest.jsonl"

    common = dict(batch=8, min_score=0.0, settle=0.0,
                  out_path=str(out), manifest_path=str(manifest), once=True)

    # 1. drain the backlog (recursive; one decode failure)
    stats = serve(params, cfg, str(audio), **common)
    assert stats == {"cycles": 1, "files": 3,
                     "detections": stats["detections"],
                     "decode_failures": 1}
    assert (audio / "rec0.txt").exists()
    assert (audio / "sub" / "rec2.txt").exists()
    recs = [json.loads(l) for l in out.read_text().splitlines()]
    assert len(recs) == 3 and all("detections" in r for r in recs)
    rows = [json.loads(l) for l in manifest.read_text().splitlines()]
    assert sum(r["status"] == "decode_failed" for r in rows) == 1

    # 2. restart: the manifest makes the second drain a no-op (the broken
    #    file is not retried either)
    stats = serve(params, cfg, str(audio), **common)
    assert stats["files"] == 0 and stats["decode_failures"] == 0

    # 3. a file that changed after processing is re-processed
    write_wav(audio / "rec0.wav", 0.1 * rng.standard_normal(44100 * 3))
    os.utime(audio / "rec0.wav", (time.time() - 10, time.time() - 10))
    stats = serve(params, cfg, str(audio), **common)
    assert stats["files"] == 1

    # 4. settle gating: fresh mtime -> not ready; old mtime -> ready
    write_wav(audio / "hot.wav", 0.1 * rng.standard_normal(44100))
    m = Manifest(str(manifest))
    ready = scan_ready(str(audio), m, settle=3600.0)
    assert [p for p, _ in ready] == []
    old = time.time() - 7200
    os.utime(audio / "hot.wav", (old, old))
    ready = scan_ready(str(audio), m, settle=3600.0)
    assert [os.path.basename(p) for p, _ in ready] == ["hot.wav"]
