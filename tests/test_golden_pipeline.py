"""Golden regression: the full pipeline's output on a fixed seed/signal,
frozen so future refactors cannot silently drift the numerics (CPU, f32,
boxes exact, scores to ~1e-3 — sin/pow ulp noise only)."""

import numpy as np
import jax

from birdsoundclassif_tpu.config import NbmConfig
from birdsoundclassif_tpu.models import NbmModel
from birdsoundclassif_tpu.infer.pipeline import detect_samples

# captured 2026-08-16 on CPU f32 (commit d18b29b); regenerate ONLY for
# intentional semantic changes, with a commit message explaining why
GOLDEN = [
    (4, 0.0, 13.0, 108.0, 111.0, 0.172191),
    (4, 0.0, 73.0, 121.0, 172.0, 0.167822),
    (4, 0.0, 195.0, 120.0, 291.0, 0.167525),
    (4, 0.0, 265.0, 120.0, 365.0, 0.172571),
    (4, 8.0, 320.0, 210.0, 374.0, 0.167864),
    (4, 139.0, 320.0, 339.0, 374.0, 0.166193),
    (4, 250.0, 320.0, 452.0, 374.0, 0.166191),
    (4, 443.0, 320.0, 643.0, 374.0, 0.166182),
    (4, 634.0, 320.0, 835.0, 374.0, 0.166144),
    (4, 762.0, 320.0, 963.0, 374.0, 0.166326),
]


def test_pipeline_output_frozen():
    cfg = NbmConfig()
    cfg.num_classes = 6
    cfg.out_fpn_chan = 32
    cfg.fpn_p_chan = 48
    cfg.depth_rcnn = 1
    cfg.compute_dtype = "float32"
    params = NbmModel.init(jax.random.PRNGKey(42), cfg)
    sr = 44100
    t = np.arange(sr * 3) / sr
    rng = np.random.default_rng(7)
    sig = 0.3 * np.sin(2 * np.pi * 2800 * t) * ((t > 0.8) & (t < 1.6)) \
        + 0.02 * rng.standard_normal(len(t))
    samples = (np.clip(sig, -1, 1) * 32767).astype(np.int16)
    out = detect_samples(params, cfg, samples, 0.0, 4)
    rows = []
    for j in range(1, 7):
        e = out[str(j)]
        for b, s in zip(e["bbox_coord"], e["scores"]):
            rows.append((j, *[float(x) for x in b], float(s)))
    rows.sort()
    assert len(rows) == len(GOLDEN)
    for got, want in zip(rows, GOLDEN):
        assert got[0] == want[0]
        np.testing.assert_array_equal(got[1:5], want[1:5])
        assert abs(got[5] - want[5]) < 2e-3
