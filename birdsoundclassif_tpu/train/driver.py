"""Training driver — the reference's train.py main loop, TPU-native
(reference: train.py:273-409): config dump, resume-if-checkpoint, split,
alternating positive/hard-negative steps, TensorBoard scalars every 50
steps, LR schedule tick every 1000, validation + full test-set AP every
500, milestone/best/last checkpoints.

Run: python -m birdsoundclassif_tpu.train.driver --data_path dataset ...
(flags mirror the reference's argparse; unknown flags are rejected).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import time
from typing import Optional

import jax
import numpy as np

from ..config import NbmConfig
from ..data.image_dataset import BatchLoader, ImgDataset
from ..utils.checkpoint import (
    load_opt_state,
    load_params,
    save_opt_state,
    save_params,
)


def _make_batch_caster(cfg):
    """Down-casts the batch's spectrogram images for the host->device
    transfer (cfg.batch_transfer_dtype). The model's first op casts samples
    to cfg.compute_dtype on device, so with both set to bfloat16 the compute
    is bitwise-identical to the float32 transfer for half the link bytes.
    GT boxes/labels/masks are tiny and stay untouched."""
    if cfg.batch_transfer_dtype == "float32":
        return lambda b: b
    dt = np.dtype(getattr(jax.numpy, cfg.batch_transfer_dtype))

    def cast(b):
        return {k: (v.astype(dt) if k in ("img", "neg_img") else v)
                for k, v in b.items()}

    return cast


def _str2bool(s: str) -> bool:
    v = s.lower()
    if v in ("true", "1", "yes"):
        return True
    if v in ("false", "0", "no"):
        return False
    raise argparse.ArgumentTypeError(f"expected a boolean, got {s!r}")


def build_arg_parser() -> argparse.ArgumentParser:
    """One flag per NbmConfig field (defaults = reference defaults)."""
    p = argparse.ArgumentParser("NBM TPU detector training")
    for f in dataclasses.fields(NbmConfig):
        arg = f"--{f.name}"
        if f.type == "bool" or isinstance(f.default, bool):
            # reference bools are bare store_true flags (train.py:52-145);
            # also accept an explicit value, strictly parsed — anything
            # other than a known true/false spelling is an error, not True
            p.add_argument(arg, type=_str2bool, nargs="?", const=True,
                           default=f.default)
        elif f.default is None:
            p.add_argument(arg, default=None)
        else:
            p.add_argument(arg, type=type(f.default), default=f.default)
    return p


def train_test_split(length: int, val_prop: float, rng: np.random.Generator):
    """reference: nets_utils.py:367-371."""
    indices = rng.permutation(length)
    cut = int(val_prop * length)
    return indices[cut:], indices[:cut]


def is_main_process() -> bool:
    """Multi-host discipline: exactly one process owns checkpoints, metric
    files and the config dump (the others would race on the shared FS)."""
    return jax.process_index() == 0


def _gather_to_host(tree):
    """Materialize a (possibly cross-host-sharded) pytree as host numpy
    arrays. A collective on multi-host — every process must call it."""
    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils

    return multihost_utils.process_allgather(tree, tiled=True)


class _NullWriter:
    """Metrics sink for non-main processes."""

    def add_scalar(self, tag, value, global_step):
        pass


class MetricsWriter:
    """TensorBoard writer when available; always mirrors to JSONL."""

    def __init__(self, save_dir: str):
        self.jsonl = open(os.path.join(save_dir, "metrics.jsonl"), "a")
        try:
            from torch.utils.tensorboard import SummaryWriter

            self.tb = SummaryWriter(save_dir)
        except Exception:
            self.tb = None

    def add_scalar(self, tag: str, value: float, global_step: int) -> None:
        if self.tb is not None:
            self.tb.add_scalar(tag, value, global_step=global_step)
        # ts lets post-hoc tooling derive steps/sec straight from the run
        self.jsonl.write(json.dumps({"tag": tag, "value": float(value),
                                     "step": int(global_step),
                                     "ts": round(time.time(), 3)}) + "\n")
        self.jsonl.flush()


def save_checkpoint(out_dir, label, state, epoch, best_val_cls_loss,
                    train_indices=None, val_indices=None, full=False,
                    cfg=None):
    """reference save(): model (+ optimizer/scheduler/split when full)
    (train.py:171-187). When cfg is given, `args` is written alongside so
    the checkpoint dir is self-contained for the inference CLI.

    Multi-host: every process participates (the param/opt gathers are
    collectives over cross-host-sharded state); only process 0 writes."""
    params_host = _gather_to_host(state.params)
    opt_host = _gather_to_host(state.opt_state) if full else None
    if not is_main_process():
        return
    ckpt_dir = os.path.join(out_dir, f"ckpt_{label}")
    os.makedirs(ckpt_dir, exist_ok=True)
    # Crash-safe overwrite protocol (ADVICE r4 #2): every file lands via
    # tmp + os.replace (no torn files), and meta.json — the marker
    # ckpt_steps/resume gate on — is written LAST, so an interrupted save
    # leaves either the complete new generation or a readable older one.
    save_params(ckpt_dir, params_host)
    if cfg is not None:
        cfg_tmp = os.path.join(ckpt_dir, "args.tmp")
        cfg.save(cfg_tmp)
        os.replace(cfg_tmp, os.path.join(ckpt_dir, "args"))
    if full:
        save_opt_state(os.path.join(ckpt_dir, "opt_state.npz"), opt_host)
        from ..utils.checkpoint import _atomic_savez

        _atomic_savez(os.path.join(ckpt_dir, "split.npz"),
                      train_indices=train_indices, val_indices=val_indices)
    meta = {
        "steps": int(state.step),
        "epoch": int(epoch),
        "best_val_cls_loss": float(best_val_cls_loss),
    }
    meta_tmp = os.path.join(ckpt_dir, "meta.json.tmp")
    with open(meta_tmp, "w") as f:
        json.dump(meta, f)
    os.replace(meta_tmp, os.path.join(ckpt_dir, "meta.json"))


def load_checkpoint(out_dir, label, tx, cfg):
    from .loop import TrainState

    ckpt_dir = os.path.join(out_dir, f"ckpt_{label}")
    params = load_params(ckpt_dir, cfg)
    with open(os.path.join(ckpt_dir, "meta.json")) as f:
        meta = json.load(f)
    opt_path = os.path.join(ckpt_dir, "opt_state.npz")
    if not os.path.exists(opt_path):
        # a resumed run silently losing Adam moments is a correctness bug —
        # fail loudly (reference resume restores the optimizer: train.py:190-202)
        raise FileNotFoundError(
            f"cannot resume from {ckpt_dir}: no opt_state.npz — this is a "
            "weights-only checkpoint; load it with utils.checkpoint.load_params "
            "for inference, or retrain"
        )
    opt_state = load_opt_state(opt_path, tx.init(params))
    split = None
    split_path = os.path.join(ckpt_dir, "split.npz")
    if os.path.exists(split_path):
        z = np.load(split_path)
        split = (z["train_indices"], z["val_indices"])
    state = TrainState(params=params, opt_state=opt_state,
                       step=np.int32(meta["steps"]))
    return state, meta, split


def build_probe_batch(dataset, indices, cfg):
    """A shape-representative batch for AOT compilation that provably does
    NOT touch the dataset's shared rng or batch order.

    The previous implementation peeked `next(iter(train_loader))` and
    restored the rng state afterwards — but BatchLoader's prefetch producer
    thread keeps drawing from the SAME generator for up to
    prefetch_batches+2 more batches AFTER the restore, racing it
    (ADVICE r4 #1): on multi-host that silently breaks the 'every process
    holds the same global batch' invariant shard_batch_2d relies on
    (parallel/tp.py). Here the items are collated directly under a
    dedicated throwaway generator; no producer thread ever starts, and the
    shared rng is swapped out for the duration."""
    from ..data.image_dataset import collate_batch

    probe_rng = np.random.default_rng(0)
    shared_rng = dataset.rng
    dataset.rng = probe_rng
    try:
        idx = [int(i) for i in np.asarray(indices)[:cfg.batch_size]]
        items = [dataset[i] for i in idx]
    finally:
        dataset.rng = shared_rng
    return collate_batch(items, cfg.max_gt_boxes)


def main(argv=None) -> int:
    parser = build_arg_parser()
    # mesh flags are runtime topology, not model config: kept out of
    # NbmConfig so checkpoints stay layout-independent
    parser.add_argument(
        "--data_parallel", type=int, default=1,
        help="data-axis size of the device mesh (1 = single device)")
    parser.add_argument(
        "--model_parallel", type=int, default=1,
        help="model-axis size: channel-shards the big kernels + optimizer "
             "moments over this many devices (parallel/tp.py)")
    from ..parallel.mesh import add_distributed_flags, initialize_from_flags

    add_distributed_flags(parser)
    args = parser.parse_args(argv)
    # multi-host bring-up must precede any other jax use
    initialize_from_flags(args, parser.error)
    # A persistent compile cache is load-bearing for --distributed: the
    # post-barrier first step re-traces and re-compiles (lower().compile()
    # does not seed jit's dispatch cache), and only this cache keeps that
    # fast enough for the ~30 s gloo rendezvous window (ADVICE r4 #3).
    # Respect an explicitly configured dir; default one under save_dir.
    if jax.config.jax_compilation_cache_dir is None:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.abspath(os.environ.get("NBM_JAX_CACHE", ".jax_cache")))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    cfg = NbmConfig(**{f.name: getattr(args, f.name)
                       for f in dataclasses.fields(NbmConfig)})

    from .loop import create_train_state, make_train_step

    save_dir = os.path.join(cfg.save_dir, cfg.model_name)
    if is_main_process():
        os.makedirs(save_dir, exist_ok=True)
        cfg.save(os.path.join(save_dir, "args"))

    rng = np.random.default_rng(cfg.seed)
    key = jax.random.PRNGKey(cfg.seed)

    dataset = ImgDataset(cfg.data_path, transform=True, rng=rng)
    if len(dataset) == 0:
        raise SystemExit(f"no positive files under {cfg.data_path}")

    banks = None
    if cfg.device_augment:
        from ..data.device_aug import build_banks

        t_bank = time.time()
        banks = build_banks(dataset, cfg)  # also flips dataset.device_mode
        if is_main_process():
            # .nbytes is metadata — np.asarray here would D2H the banks
            mb = sum(b.nbytes for b in banks if b is not None) / 1e6
            print(f"device_augment: banks pos={dataset.bank_positives} "
                  f"neg={dataset.bank_negatives} ({mb:.0f} MB on device, "
                  f"built in {time.time() - t_bank:.0f}s)")

    state, tx = create_train_state(key, cfg)
    train_step, eval_step = make_train_step(cfg, tx)

    resume_label = "last"
    epoch, best_val_cls_loss = 0, 99.0
    # meta.json is the save protocol's commit marker (written last): a dir
    # without it is an interrupted first save — train from scratch
    if os.path.isfile(os.path.join(save_dir, "ckpt_last", "meta.json")):
        state, meta, split = load_checkpoint(save_dir, resume_label, tx, cfg)
        epoch = meta["epoch"]
        best_val_cls_loss = meta["best_val_cls_loss"]
        train_indices, val_indices = split
        if is_main_process():
            print("Resuming training~~~~")
    else:
        train_indices, val_indices = train_test_split(
            len(dataset), cfg.validation_prop, rng
        )

    mesh = None
    cast_batch = _make_batch_caster(cfg)
    shard_batch = cast_batch
    n_mesh = args.data_parallel * args.model_parallel
    if n_mesh > 1:
        from ..parallel.tp import make_mesh_2d, shard_batch_2d, shard_tree

        devices = jax.devices()
        if len(devices) < n_mesh:
            raise SystemExit(
                f"mesh needs {n_mesh} devices "
                f"({args.data_parallel} data x {args.model_parallel} model), "
                f"have {len(devices)}")
        if cfg.batch_size % args.data_parallel:
            raise SystemExit(
                f"batch_size {cfg.batch_size} not divisible by "
                f"data_parallel {args.data_parallel}")
        mesh = make_mesh_2d(devices[:n_mesh], args.model_parallel)
        shard_batch = lambda b: shard_batch_2d(cast_batch(b), mesh)  # noqa: E731
        state = shard_tree(state, mesh)
        if banks is not None:
            from ..data.device_aug import replicate_banks

            banks = replicate_banks(banks, mesh)
        if is_main_process():
            print(f"mesh: {args.data_parallel} data x {args.model_parallel} "
                  f"model over {jax.process_count()} process(es)")

    if cfg.grad_accum_steps > 1 and cfg.batch_size % cfg.grad_accum_steps:
        raise SystemExit(
            f"batch_size {cfg.batch_size} not divisible by "
            f"grad_accum_steps {cfg.grad_accum_steps}")
    if len(train_indices) < cfg.batch_size:
        # BatchLoader drops the last partial batch; a split smaller than one
        # batch would make the epoch loop spin forever with zero steps
        raise SystemExit(
            f"train split has {len(train_indices)} samples < batch_size "
            f"{cfg.batch_size}; lower --batch_size or --validation_prop"
        )
    train_loader = BatchLoader(dataset, train_indices, cfg.batch_size,
                               cfg.max_gt_boxes, rng)
    val_loader = (
        BatchLoader(dataset, val_indices, 2 * cfg.batch_size, cfg.max_gt_boxes, rng)
        if len(val_indices) > 0 else None
    )

    writer = MetricsWriter(save_dir) if is_main_process() else _NullWriter()
    loss_keys = ["first_class_loss", "first_regression_loss", "sec_class_loss",
                 "sec_regression_loss", "first_neg_class_loss",
                 "sec_neg_class_loss", "cardinality_error"]
    running = {k: 0.0 for k in loss_keys}
    save_steps = {180_000, 190_000, 200_000}
    steps = int(state.step)

    # Loss readback is deferred by one step: reading a loss scalar back is a
    # host<->device sync (through the dev tunnel each one costs a full RTT,
    # and the sync serializes the next batch's host prep + H2D behind the
    # device compute). The step dispatches asynchronously; its losses are
    # stacked into ONE device array (one transfer, not one per key) and
    # fetched while the NEXT step already runs. Cadence semantics are
    # preserved exactly: each step's losses are accumulated/flushed under its
    # own step index by _drain.
    pending = None  # (step_idx, names, stacked device losses)

    def _drain(p):
        if p is None:
            return
        s_idx, names, vec = p
        for k, v in zip(names, np.asarray(jax.device_get(vec))):
            if k in running:
                running[k] += float(v)
        if s_idx % 50 == 0:
            for k in loss_keys:
                freq = 50 / cfg.neg_step_freq if "neg" in k else 50
                writer.add_scalar(f"Training_Loss/{k}", running[k] / freq, s_idx)
                running[k] = 0.0

    if jax.process_count() > 1:
        # Align processes between COMPILATION and first EXECUTION. XLA
        # compiles take minutes and are not synchronized across hosts,
        # while the CPU-collectives (gloo) first-rendezvous window is a
        # hard ~30 s — without this, the faster host times out inside its
        # first step's gradient psum (observed in
        # tests/test_distributed_2proc.py). AOT-compile both step variants
        # here, then meet at a coordination-service barrier (gRPC — no
        # device collectives involved). On TPU pods this is a harmless
        # alignment point: compiles go through the same path.
        probe_batch = shard_batch(
            build_probe_batch(dataset, train_indices, cfg))
        sub = jax.random.fold_in(key, 0)
        for neg in (False, True):
            train_step.lower(state, probe_batch, sub, negative_sample=neg,
                             banks=banks).compile()
        # private coordination-service handle (no public barrier API yet);
        # degrade to no-barrier on a JAX upgrade instead of crashing
        client = None
        try:
            from jax._src import distributed as _dist

            client = getattr(_dist.global_state, "client", None)
        except Exception:
            pass
        if client is not None:
            client.wait_at_barrier("nbm_train_step_compiled", 1_200_000)
        elif is_main_process():
            print("WARNING: no coordination-service barrier available; "
                  "multi-host compile skew may hit the gloo rendezvous window")
        if is_main_process():
            print("Multi-host compile barrier passed")

    if is_main_process():
        print("Start training")
    while steps < cfg.max_steps:
        for batch in train_loader:
            batch = shard_batch(batch)
            neg = (steps % cfg.neg_step_freq == 0) and (steps > cfg.first_neg_step)
            # key stream is a pure function of the step index, so a resumed
            # run draws the same per-step randomness as a continuous one
            sub = jax.random.fold_in(key, steps)
            state, losses = train_step(state, batch, sub, negative_sample=neg,
                                       banks=banks)
            _drain(pending)
            names = list(losses)
            pending = (steps, names,
                       jax.numpy.stack([losses[n] for n in names]))
            if steps in save_steps:
                save_checkpoint(save_dir, str(steps), state, epoch,
                                best_val_cls_loss, train_indices, val_indices,
                                full=True, cfg=cfg)
            steps += 1
            if cfg.ckpt_every_steps and steps % cfg.ckpt_every_steps == 0:
                save_checkpoint(save_dir, "last", state, epoch,
                                best_val_cls_loss, train_indices, val_indices,
                                full=True, cfg=cfg)
            if steps % 1000 == 0:
                from .loop import make_lr_schedule

                writer.add_scalar(
                    "Lr", float(make_lr_schedule(cfg.lr, cfg.lr_drop)(steps)), steps
                )
            if steps % cfg.eval_every == 0:
                # flush the deferred losses so the validation scalars land
                # after this step's training scalars in the metrics stream
                _drain(pending)
                pending = None
                val_cls = _validate(cfg, state, eval_step, val_loader, writer,
                                    steps, key, shard_batch=shard_batch,
                                    banks=banks)
                if val_cls is not None and steps / 1000 > cfg.lr_drop and \
                        val_cls < best_val_cls_loss:
                    best_val_cls_loss = val_cls
                    save_checkpoint(save_dir, "best", state, epoch,
                                    best_val_cls_loss, cfg=cfg)
                test_dir = os.path.join(cfg.data_path, "test_files", "XC_annots")
                if os.path.isdir(test_dir):
                    from ..eval.ap import evaluate_test_dir

                    # the eval pipeline runs single-device programs; on
                    # multi-host, cross-host-sharded params must first be
                    # materialized locally (a collective — all processes)
                    eval_params = (_gather_to_host(state.params)
                                   if jax.process_count() > 1 else state.params)
                    metrics = evaluate_test_dir(eval_params, cfg, test_dir,
                                                min_score=0.02, bs=cfg.batch_size)
                    for k, v in metrics.items():
                        writer.add_scalar(f"Test_metrics/{k}", v, steps)
            if steps >= cfg.max_steps:
                break
        if epoch > 0 and epoch % 10 == 0:
            save_checkpoint(save_dir, "last", state, epoch, best_val_cls_loss,
                            train_indices, val_indices, full=True, cfg=cfg)
        epoch += 1
    _drain(pending)
    save_checkpoint(save_dir, "last", state, epoch, best_val_cls_loss,
                    train_indices, val_indices, full=True, cfg=cfg)
    return 0


def _validate(cfg, state, eval_step, val_loader, writer, steps, key,
              shard_batch=lambda b: b, banks=None) -> Optional[float]:
    """Runs the validation pass and returns the averaged sec_class_loss
    (the best-checkpoint criterion), or None when there is no val data."""
    if val_loader is None:
        return None
    _shard = shard_batch
    loss_keys = ["first_class_loss", "first_regression_loss", "sec_class_loss",
                 "sec_regression_loss", "first_neg_class_loss",
                 "sec_neg_class_loss", "cardinality_error"]
    val = {k: 0.0 for k in loss_keys}
    n = 0
    last_batch = None
    for batch in val_loader:
        batch = _shard(batch)
        key, sub = jax.random.split(key)
        ld = eval_step(state.params, batch, sub, negative_sample=False,
                       banks=banks)
        for k, v in ld.items():
            if k in val:
                val[k] += float(v)
        n += 1
        last_batch = batch
    if n == 0:
        return None
    for k in loss_keys:
        # reference: `val_losses[l] /= i` with i the LAST enumerate index,
        # i.e. n_batches - 1 (train.py:368-374) — an off-by-one the scale of
        # best_val_cls_loss depends on; guarded for n == 1, where the
        # reference would divide by zero
        val[k] /= max(n - 1, 1)
    if last_batch is not None:
        key, sub = jax.random.split(key)
        ld = eval_step(state.params, last_batch, sub, negative_sample=True,
                       banks=banks)
        for k, v in ld.items():
            if k in val:
                val[k] += float(v)
    for k in loss_keys:
        writer.add_scalar(f"Val_Loss/{k}", val[k], steps)
    return val["sec_class_loss"]


if __name__ == "__main__":
    raise SystemExit(main())
