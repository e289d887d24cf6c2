"""Auxiliary subsystems: profiling, GIoU ops, visualization, multi-chip
sharding on the virtual CPU mesh."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from birdsoundclassif_tpu.utils.profiling import (
    MetricLogger,
    SmoothedValue,
    Timer,
    device_memory_stats,
)
from birdsoundclassif_tpu.ops.giou import (
    box_cxcywh_to_xyxy,
    box_xyxy_to_cxcywh,
    box_iou,
    generalized_box_iou,
)


class TestProfiling:
    def test_timer_sections(self):
        t = Timer()
        with t.section("a"):
            x = jnp.ones((8, 8)) * 2
        with t.section("a", sync_on=x):
            pass
        s = t.summary()
        assert s["a"]["count"] == 2
        assert s["a"]["total_s"] > 0

    def test_smoothed_value(self):
        v = SmoothedValue(window_size=3)
        for x in [1.0, 2.0, 3.0, 4.0]:
            v.update(x)
        assert v.median == 3.0
        assert v.global_avg == 2.5

    def test_metric_logger(self):
        m = MetricLogger()
        m.update(loss=1.0, acc=0.5)
        m.update(loss=2.0, acc=0.7)
        assert "loss" in str(m)

    def test_memory_stats_shape(self):
        out = device_memory_stats()
        assert isinstance(out, dict)


class TestGIoU:
    def test_cxcywh_roundtrip(self, rng):
        x = jnp.asarray(rng.random((7, 4)).astype(np.float32))
        rec = box_xyxy_to_cxcywh(box_cxcywh_to_xyxy(x))
        np.testing.assert_allclose(np.asarray(rec), np.asarray(x), atol=1e-6)

    def test_giou_identical_boxes(self):
        b = jnp.asarray([[0.0, 0.0, 10.0, 10.0]])
        g = generalized_box_iou(b, b)
        np.testing.assert_allclose(np.asarray(g), [[1.0]], atol=1e-6)

    def test_giou_disjoint_negative(self):
        a = jnp.asarray([[0.0, 0.0, 1.0, 1.0]])
        b = jnp.asarray([[10.0, 10.0, 11.0, 11.0]])
        assert float(generalized_box_iou(a, b)[0, 0]) < 0


class TestVisualize:
    def test_plot_window(self, tmp_path, rng):
        from birdsoundclassif_tpu.utils.visualize import plot_window_with_boxes

        win = rng.random((375, 1024)).astype(np.float32)
        p = plot_window_with_boxes(
            win, [[100, 50, 300, 120]], labels=["Turdus merula"], scores=[0.9],
            save_path=str(tmp_path / "w.png"),
        )
        assert os.path.getsize(p) > 1000

    def test_visualise_model_out(self, tmp_path, rng):
        from birdsoundclassif_tpu.utils.visualize import visualise_model_out

        spec = rng.random((375, 2000)).astype(np.float32)
        output = {"Turdus merula": {"bbox_coord": [[900, 40, 1100, 90]],
                                    "scores": [0.8]}}
        paths = visualise_model_out(output, spec, out_dir=str(tmp_path))
        assert len(paths) >= 1


class TestMultichipSharding:
    def test_inference_sharded_over_mesh(self, cpu_mesh_devices):
        """Window batch sharded over the 8-device CPU mesh; detector forward
        compiles and executes under GSPMD."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from birdsoundclassif_tpu.config import NbmConfig
        from birdsoundclassif_tpu.models.detector import NbmModel
        from birdsoundclassif_tpu.parallel.mesh import make_mesh

        cfg = NbmConfig()
        cfg.num_classes = 4
        cfg.out_fpn_chan = 16
        cfg.fpn_p_chan = 24
        cfg.depth_rcnn = 1
        cfg.img_height, cfg.img_width = 128, 256
        cfg.pre_nms_topN_eval = 64
        cfg.post_nms_topN_eval = 16
        params = NbmModel.init(jax.random.PRNGKey(0), cfg)
        mesh = make_mesh(cpu_mesh_devices)
        x = jnp.zeros((8, 128, 256, 1))
        x = jax.device_put(x, NamedSharding(mesh, P("data")))
        params = jax.device_put(params, NamedSharding(mesh, P()))

        @jax.jit
        def fwd(params, x):
            det = NbmModel.forward(params, x, cfg, min_score=0.0)
            return det.boxes, det.valid

        boxes, valid = fwd(params, x)
        assert boxes.shape == (8, 16, 4)
        # output is actually distributed
        assert len(boxes.sharding.device_set) == 8


class TestRunDetectionVisualise:
    def test_plots_written(self, tmp_path, rng):
        import wave

        from birdsoundclassif_tpu.config import NbmConfig
        from birdsoundclassif_tpu.models import NbmModel
        from birdsoundclassif_tpu.infer.pipeline import run_detection

        cfg = NbmConfig()
        cfg.num_classes = 4
        cfg.out_fpn_chan = 16
        cfg.fpn_p_chan = 24
        cfg.depth_rcnn = 1
        cfg.img_height, cfg.img_width = 128, 256
        cfg.pre_nms_topN_eval = 64
        cfg.post_nms_topN_eval = 16
        params = NbmModel.init(jax.random.PRNGKey(0), cfg)
        wav = tmp_path / "v.wav"
        x = (np.clip(0.2 * rng.standard_normal(44100 * 2), -1, 1) * 32767).astype("<i2")
        with wave.open(str(wav), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(44100)
            w.writeframes(x.tobytes())
        out = run_detection(params, cfg, str(wav), min_score=0.0, bs=4,
                            visualise_outputs=True,
                            visualise_dir=str(tmp_path / "plots"))
        assert out is not None
        if any(len(v["scores"]) for v in out.values()):
            assert (tmp_path / "plots").exists()


def test_console_script_entry_points_resolve():
    """pyproject.toml console scripts must all import and be callable."""
    import importlib
    import tomllib

    with open(os.path.join(os.path.dirname(__file__), "..", "pyproject.toml"), "rb") as f:
        scripts = tomllib.load(f)["project"]["scripts"]
    assert set(scripts) == {
        "nbm-detect", "nbm-sweep", "nbm-serve", "nbm-export", "nbm-train",
        "nbm-prepare", "nbm-convert", "xeno",
    }
    for target in scripts.values():
        mod_name, func = target.split(":")
        fn = getattr(importlib.import_module(mod_name), func)
        assert callable(fn)


def test_convert_cli_roundtrip(tmp_path):
    """nbm-convert: npz -> torch -> npz round-trips the param pytree and
    copies the config so each output dir is a complete --ckpt."""
    import jax

    from birdsoundclassif_tpu.config import NbmConfig
    from birdsoundclassif_tpu.models.detector import NbmModel
    from birdsoundclassif_tpu.models.torch_convert import main as convert_main
    from birdsoundclassif_tpu.utils.checkpoint import load_params, save_params

    cfg = NbmConfig()
    cfg.num_classes = 4
    cfg.out_fpn_chan = 8
    cfg.fpn_p_chan = 12
    cfg.depth_rcnn = 1
    cfg.img_height, cfg.img_width = 64, 128
    src, as_torch, back = tmp_path / "src", tmp_path / "pt", tmp_path / "npz"
    params = NbmModel.init(jax.random.PRNGKey(3), cfg)
    save_params(str(src), params)
    cfg.save(str(src / "args"))

    assert convert_main(["--ckpt", str(src), "--out", str(as_torch), "--to", "torch"]) == 0
    assert (as_torch / "model_chkpt.pt").exists() and (as_torch / "args").exists()
    assert convert_main(["--ckpt", str(as_torch), "--out", str(back)]) == 0

    restored = load_params(str(back), NbmConfig.load(str(back / "args")))
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = jax.tree_util.tree_leaves_with_path(restored)
    assert len(flat_a) == len(flat_b)
    for (ka, va), (kb, vb) in zip(flat_a, flat_b):
        assert ka == kb
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))
