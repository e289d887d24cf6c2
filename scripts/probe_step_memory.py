"""AOT memory probe for the flagship train step (no chip execution).

Lowers + compiles the driver's exact traced train step (loop.make_train_step)
against abstract arguments and prints the compiler's memory analysis, so HBM
fits can be checked WITHOUT dispatching a single step — the remote AOT
compile is the only device-side cost. Used to attribute the r3 finding that
`--fixed_neg_objective` at B=16/accum-1 bank mode OOMs on v5e (15.75 GB)
while the faithful objective fits: the probe compiles both variants of the
negative-step program and diffs their temp allocations.

Usage:
  python scripts/probe_step_memory.py --args /tmp/nbm_hard/models/<run>/args \
      [--data /tmp/nbm_hard/dataset] [--accum 1] [--neg] [--cpu]

Prints one JSON line per compiled variant.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--args", required=True, help="saved driver args (JSON)")
    p.add_argument("--data", default=None, help="dataset dir override")
    p.add_argument("--accum", type=int, default=None,
                   help="grad_accum_steps override")
    p.add_argument("--batch", type=int, default=None,
                   help="batch_size override")
    p.add_argument("--neg", action="store_true",
                   help="compile the negative-step program (default: both)")
    p.add_argument("--pos", action="store_true",
                   help="compile the positive-step program (default: both)")
    p.add_argument("--fixed", default=None, choices=["true", "false"],
                   help="fixed_neg_objective override (default: both values "
                        "for the neg program)")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))

    import numpy as np

    from birdsoundclassif_tpu.config import NbmConfig
    from birdsoundclassif_tpu.data.device_aug import AugBanks
    from birdsoundclassif_tpu.data.image_dataset import (BatchLoader,
                                                         ImgDataset)
    from birdsoundclassif_tpu.train.driver import _make_batch_caster
    from birdsoundclassif_tpu.train.loop import (create_train_state,
                                                 make_train_step)

    cfg = NbmConfig.load(args.args)
    if args.data:
        cfg.data_path = args.data
    if args.accum is not None:
        cfg.grad_accum_steps = args.accum
    if args.batch is not None:
        cfg.batch_size = args.batch

    rng = np.random.default_rng(cfg.seed)
    dataset = ImgDataset(cfg.data_path, transform=True, rng=rng)
    # bank mode without paying the 700+ MB H2D: the probe only needs the
    # bank SHAPES, so mark the dataset device-mode by hand and describe the
    # pools abstractly
    dataset.device_mode = True
    dataset.bank_positives = True
    dataset.bank_negatives = True
    probe = dataset.load_png_u8("positive_files", dataset.positive_files[0])
    h, w = probe.shape

    def bank_struct(n):
        return jax.ShapeDtypeStruct((n, h, w), np.uint8)

    banks = AugBanks(
        pos=bank_struct(len(dataset.positive_files)),
        neg=bank_struct(max(len(dataset.negative_files), 1)),
        hard=bank_struct(max(len(dataset.hard_negative_files), 1)),
    )

    loader = BatchLoader(dataset, np.arange(len(dataset)), cfg.batch_size,
                         cfg.max_gt_boxes, rng)
    cast = _make_batch_caster(cfg)
    batch = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
        cast(next(iter(loader))))

    key = jax.ShapeDtypeStruct((2,), np.uint32)
    state = jax.eval_shape(
        lambda k: create_train_state(k, cfg)[0], jax.random.PRNGKey(0))

    variants = []
    do_pos = args.pos or not (args.pos or args.neg)
    do_neg = args.neg or not (args.pos or args.neg)
    fixed_vals = ([args.fixed == "true"] if args.fixed is not None
                  else [False, True])
    if do_pos:
        variants.append(("pos", False, cfg.fixed_neg_objective))
    if do_neg:
        for f in fixed_vals:
            variants.append(("neg", True, f))

    for name, is_neg, fixed in variants:
        cfg.fixed_neg_objective = fixed
        from birdsoundclassif_tpu.train.loop import make_optimizer

        tx = make_optimizer(cfg)
        train_step, _ = make_train_step(cfg, tx)
        lowered = train_step.lower(state, batch, key,
                                   negative_sample=is_neg, banks=banks)
        compiled = lowered.compile()
        mem = compiled.memory_analysis()
        row = {"variant": name, "fixed_neg_objective": fixed,
               "batch": cfg.batch_size, "accum": cfg.grad_accum_steps}
        if mem is not None:
            for k in ("temp_size_in_bytes", "argument_size_in_bytes",
                      "output_size_in_bytes", "alias_size_in_bytes",
                      "generated_code_size_in_bytes"):
                v = getattr(mem, k, None)
                if v is not None:
                    row[k.replace("_in_bytes", "_mb")] = round(v / 1e6, 1)
            tot = getattr(mem, "temp_size_in_bytes", 0) + \
                getattr(mem, "argument_size_in_bytes", 0) + \
                getattr(mem, "output_size_in_bytes", 0) - \
                getattr(mem, "alias_size_in_bytes", 0)
            row["peak_estimate_gb"] = round(tot / 1e9, 2)
        else:
            row["memory_analysis"] = None
        print(json.dumps(row), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
