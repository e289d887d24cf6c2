"""Multi-chip scaling evidence (VERDICT r1 #6): prove GSPMD genuinely
shards the training step over the mesh — gradient collectives are inserted
and the per-device program runs ~1/N of the FLOPs — and that the sweep's
--distributed flag brings up jax.distributed. A wall-clock speedup can't be
shown on this 1-core CI host; per-device compiled FLOPs is the
deterministic proxy (the real chips are ICI-connected, so the all-reduce is
bandwidth-cheap relative to the 1/N compute saving)."""

import os
import subprocess
import sys
import wave

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from birdsoundclassif_tpu.config import NbmConfig


def _tiny_cfg():
    cfg = NbmConfig()
    cfg.num_classes = 6
    cfg.out_fpn_chan = 16
    cfg.fpn_p_chan = 24
    cfg.depth_rcnn = 1
    cfg.img_height, cfg.img_width = 128, 256
    cfg.pre_nms_topN = 256
    cfg.post_nms_topN = 64
    cfg.max_gt_boxes = 4
    cfg.compute_dtype = "float32"
    return cfg


def _batch(cfg, b):
    key = jax.random.PRNGKey(0)
    g = cfg.max_gt_boxes
    return {
        "img": jax.random.uniform(key, (b, cfg.img_height, cfg.img_width)),
        "neg_img": jax.random.uniform(key, (b, cfg.img_height, cfg.img_width)),
        "gt_boxes": jnp.tile(
            jnp.asarray([[30.0, 20.0, 120.0, 60.0]], jnp.float32), (b, g, 1)
        ).reshape(b, g, 4),
        "gt_valid": jnp.tile(jnp.asarray([True] + [False] * (g - 1)), (b, 1)),
        "gt_labels": jnp.tile(jnp.asarray([3] + [0] * (g - 1), jnp.int32), (b, 1)),
    }


def _flops(compiled) -> float:
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca["flops"])


def test_sharded_train_step_collectives_and_per_device_flops(cpu_mesh_devices):
    """Fails if GSPMD silently replicates: the 8-way-sharded step must
    contain a gradient all-reduce, and its per-device FLOPs must be well
    under half the single-device program's for the same global batch."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from birdsoundclassif_tpu.parallel.mesh import make_mesh
    from birdsoundclassif_tpu.train.loop import create_train_state, make_train_step

    cfg = _tiny_cfg()
    key = jax.random.PRNGKey(0)
    state, tx = create_train_state(key, cfg)
    train_step, _ = make_train_step(cfg, tx)
    batch = _batch(cfg, b=8)

    mesh = make_mesh(cpu_mesh_devices)
    sharded_batch = jax.device_put(batch, NamedSharding(mesh, P("data")))
    repl_state = jax.device_put(state, NamedSharding(mesh, P()))
    sharded = train_step.lower(
        repl_state, sharded_batch, key, negative_sample=False
    ).compile()

    dev0 = cpu_mesh_devices[0]
    single_batch = jax.device_put(batch, dev0)
    single_state = jax.device_put(state, dev0)
    single = train_step.lower(
        single_state, single_batch, key, negative_sample=False
    ).compile()

    hlo = sharded.as_text()
    assert "all-reduce" in hlo, "no gradient all-reduce in the sharded step"
    assert "all-reduce" not in single.as_text()

    f_sharded, f_single = _flops(sharded), _flops(single)
    # per-device share of the batch-proportional work is 1/8; params-side
    # work (optimizer update, BN merges) stays replicated, so allow slack
    assert f_sharded < 0.45 * f_single, (f_sharded, f_single)

    # per-device input shards really carry batch/8 rows
    img = sharded_batch["img"]
    shard_shapes = {s.data.shape for s in img.addressable_shards}
    assert shard_shapes == {(1, cfg.img_height, cfg.img_width)}

    # and the step still runs end-to-end on the mesh
    new_state, losses = train_step(repl_state, sharded_batch, key,
                                   negative_sample=False)
    assert np.isfinite(float(losses["total"]))


def test_sharded_inference_forward_shards_flops(cpu_mesh_devices):
    """Same replication guard for the inference forward (window batch
    sharded over the mesh, params replicated — infer/sweep.py's layout)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from birdsoundclassif_tpu.models import NbmModel
    from birdsoundclassif_tpu.parallel.mesh import make_mesh

    cfg = _tiny_cfg()
    params = NbmModel.init(jax.random.PRNGKey(0), cfg)
    windows = jax.random.uniform(
        jax.random.PRNGKey(1), (8, cfg.img_height, cfg.img_width, 1)
    )

    def fwd(p, w):
        det = NbmModel.forward(p, w, cfg, nms_thresh=0.3, min_score=0.0)
        return det.boxes, det.scores

    jfwd = jax.jit(fwd)
    mesh = make_mesh(cpu_mesh_devices)
    p_repl = jax.device_put(params, NamedSharding(mesh, P()))
    w_shard = jax.device_put(windows, NamedSharding(mesh, P("data")))
    sharded = jfwd.lower(p_repl, w_shard).compile()

    dev0 = cpu_mesh_devices[0]
    single = jfwd.lower(
        jax.device_put(params, dev0), jax.device_put(windows, dev0)
    ).compile()

    f_sharded, f_single = _flops(sharded), _flops(single)
    assert f_sharded < 0.3 * f_single, (f_sharded, f_single)

    boxes, scores = jfwd(p_repl, w_shard)
    assert np.isfinite(np.asarray(scores)).all()


def test_tensor_parallel_train_step_matches_and_shards(cpu_mesh_devices):
    """2-D (data=4, model=2) mesh: channel-sharded kernels + sharded batch.
    Sharding is layout, not semantics — the TP step must reproduce the
    single-device losses, insert model-axis collectives, run ~1/(dp*tp) of
    the FLOPs per device, and actually halve the sharded kernel shards."""
    from jax.sharding import PartitionSpec as P

    from birdsoundclassif_tpu.parallel.tp import (
        make_mesh_2d, shard_batch_2d, shard_tree, tree_partition_specs)
    from birdsoundclassif_tpu.train.loop import create_train_state, make_train_step

    cfg = _tiny_cfg()
    cfg.out_fpn_chan = 64   # wide enough for channel sharding to engage
    cfg.fpn_p_chan = 64
    key = jax.random.PRNGKey(0)
    state, tx = create_train_state(key, cfg)
    train_step, _ = make_train_step(cfg, tx)
    batch = _batch(cfg, b=8)

    dev0 = cpu_mesh_devices[0]
    single = train_step.lower(
        jax.device_put(state, dev0), jax.device_put(batch, dev0), key,
        negative_sample=False,
    ).compile()
    _, l_single = train_step(
        jax.device_put(state, dev0), jax.device_put(batch, dev0), key,
        negative_sample=False,
    )
    l_single = {k: float(v) for k, v in l_single.items()}

    mesh = make_mesh_2d(cpu_mesh_devices, model_parallel=2)
    min_ch = 32
    state, _ = create_train_state(key, cfg)  # prior state was donated
    specs = jax.tree_util.tree_leaves(
        tree_partition_specs(state, mesh, min_channels=min_ch),
        is_leaf=lambda x: isinstance(x, P),
    )
    n_sharded = sum(1 for s in specs if s != P())
    assert n_sharded > 50, f"only {n_sharded} leaves sharded"

    sharded_state = shard_tree(state, mesh, min_channels=min_ch)
    sharded_batch = shard_batch_2d(batch, mesh)

    # a sharded kernel's per-device shards carry half the channels
    def _find(tree):
        if isinstance(tree, dict):
            for v in tree.values():
                r = _find(v)
                if r is not None:
                    return r
            return None
        shp = tuple(getattr(tree, "shape", ()))
        if len(shp) >= 2 and shp[-1] >= min_ch and shp[-1] % 2 == 0 \
                and int(np.prod(shp)) >= 1 << 14:
            return tree
    kern = _find(sharded_state.params)
    shard_shapes = {s.data.shape for s in kern.addressable_shards}
    assert shard_shapes == {kern.shape[:-1] + (kern.shape[-1] // 2,)}, (
        kern.shape, shard_shapes)

    tp_exe = train_step.lower(
        sharded_state, sharded_batch, key, negative_sample=False
    ).compile()
    hlo = tp_exe.as_text()
    assert "all-reduce" in hlo or "reduce-scatter" in hlo
    assert "all-gather" in hlo, "no channel all-gather: GSPMD replicated TP"

    f_tp, f_single = _flops(tp_exe), _flops(single)
    assert f_tp < 0.25 * f_single, (f_tp, f_single)

    _, l_tp = train_step(sharded_state, sharded_batch, key, negative_sample=False)
    for k, v in l_single.items():
        got = float(l_tp[k])
        assert abs(got - v) <= 1e-4 * max(1.0, abs(v)), (k, got, v)


def test_whole_file_program_data_sharded(cpu_mesh_devices):
    """sweep's multi-chip layout: the whole-file program with a window-batch
    sharding constraint must split per-device FLOPs and reproduce the
    unsharded packed merge output exactly."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from birdsoundclassif_tpu.audio.frontend import SpectrogramFrontend
    from birdsoundclassif_tpu.infer.pipeline import detect_file_packed, _file_program
    from birdsoundclassif_tpu.models import NbmModel
    from birdsoundclassif_tpu.parallel.mesh import make_mesh

    cfg = _tiny_cfg()
    cfg.img_height, cfg.img_width = 375, 1024  # frontend window geometry
    params = NbmModel.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    sr = cfg.frontend.sample_rate
    samples = (0.1 * rng.standard_normal(sr * 30)).astype(np.float32)
    fe_res = SpectrogramFrontend(cfg.frontend).process(samples)

    want = np.asarray(detect_file_packed(params, cfg, fe_res, 0.0, 8))

    mesh = make_mesh(cpu_mesh_devices)
    p_repl = jax.device_put(params, NamedSharding(mesh, P()))
    ds = NamedSharding(mesh, P("data"))
    got = np.asarray(detect_file_packed(p_repl, cfg, fe_res, 0.0, 8,
                                        data_sharding=ds))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    # the constraint must actually split the detector FLOPs per device
    from birdsoundclassif_tpu.infer.pipeline import _FRAME_BUCKET

    spec = fe_res.spec_padded
    t = spec.shape[1]
    t_pad = -(-t // _FRAME_BUCKET) * _FRAME_BUCKET
    spec_p = jnp.pad(spec, ((0, 0), (0, t_pad - t))) if t_pad != t else spec
    bs, n = 8, fe_res.n_windows
    n_chunks = 1 << (max(1, -(-n // bs)) - 1).bit_length()
    cols = np.zeros((n_chunks * bs, fe_res.window_cols.shape[1]), np.int32)
    cols[:n] = fe_res.window_cols

    def lower(p, sharding):
        return _file_program.lower(
            p, spec_p, jnp.asarray(cols), jnp.int32(n),
            jnp.float32(fe_res.total_frames), cfg, bs, 0.3, 0.0,
            n_chunks * bs, data_sharding=sharding,
        ).compile()

    f_sharded = _flops(lower(p_repl, ds))
    f_single = _flops(lower(params, None))
    assert f_sharded < 0.3 * f_single, (f_sharded, f_single)


def _write_wav(path, samples, sr=44100):
    x = (np.clip(samples, -1, 1) * 32767).astype("<i2")
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(x.tobytes())


def test_sweep_distributed_flag(tmp_path):
    """infer.sweep --distributed brings up jax.distributed (explicit
    single-process coordinator here; auto-discovery on real pods) and
    completes a sweep. Runs in a subprocess because jax.distributed can
    only initialize once per process."""
    from birdsoundclassif_tpu.utils.checkpoint import save_params
    from birdsoundclassif_tpu.models import NbmModel

    cfg = _tiny_cfg()
    params = NbmModel.init(jax.random.PRNGKey(0), cfg)
    ckpt = tmp_path / "ckpt"
    ckpt.mkdir()
    save_params(str(ckpt), params)
    cfg.save(str(ckpt / "args"))
    audio = tmp_path / "audio"
    audio.mkdir()
    rng = np.random.default_rng(0)
    _write_wav(audio / "rec0.wav", 0.1 * rng.standard_normal(44100 * 2))

    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from birdsoundclassif_tpu.infer.sweep import main\n"
        f"raise SystemExit(main(['--ckpt', {str(ckpt)!r},"
        f" '--audio_dir', {str(audio)!r}, '--batch', '8',"
        " '--min_score', '0.0', '--distributed',"
        " '--coordinator', 'localhost:12377',"
        " '--num_processes', '1', '--process_id', '0']))\n"
    )
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]
        + [p for p in env.get("PYTHONPATH", "").split(os.pathsep) if p]
        + ["/root/.axon_site"]
    )
    proc = subprocess.run([sys.executable, "-c", code], env=env,
                          capture_output=True, text=True, timeout=1200)
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert (audio / "rec0.txt").exists()
    assert '"devices": 8' in proc.stdout
