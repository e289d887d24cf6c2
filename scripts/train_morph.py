"""Morphology-only corpus arm (ATTRIBUTION_r5 / VERDICT r4 next #4a).

Builds a class-scale corpus where every call's CENTER FREQUENCY is drawn
per call (data/synthetic.synth_hard_recording randomize_fc=True), so
species identity is carried by call morphology alone — shape, duration,
trill rate, harmonic stack, AM — and the absolute-position RoI PE carries
ZERO species information. Trains the real driver from scratch on it, then
measures:

  - test mAP + species accuracy on localized boxes (the detector's
    morphology-only discrimination)
  - the same with the RoI PE ablated (should barely move here, unlike on
    the fixed-band corpus — the control that closes the leak argument)

Results merge into ATTRIBUTION_r5.json under "morphology_only_arm".

Usage: python scripts/train_morph.py [--steps 10000] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from scripts.train_hard import _log, run_driver, wait_for_chip  # noqa: E402


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=10_000)
    p.add_argument("--eval_every", type=int, default=2000)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--lr_drop", type=int, default=8)
    p.add_argument("--n_species", type=int, default=150)
    p.add_argument("--test_every", type=int, default=3)
    p.add_argument("--seed", type=int, default=4343)
    p.add_argument("--work_dir", default=os.path.join(REPO, "runs", "nbm_morph"))
    p.add_argument("--hard_neg_src", default=os.path.join(
        REPO, "runs", "nbm_hard", "dataset", "hard_neg"))
    p.add_argument("--out", default=os.path.join(REPO, "ATTRIBUTION_r5.json"))
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--etl_only", action="store_true")
    p.add_argument("--rpn_head_f32", default="true")
    args = p.parse_args(argv)

    work = os.path.abspath(args.work_dir)
    rec_dir = os.path.join(work, "rec")
    data_dir = os.path.join(work, "dataset")
    neg_dir = os.path.join(work, "neg_eval")
    test_dir = os.path.join(data_dir, "test_files", "XC_annots")

    if not os.path.isdir(os.path.join(data_dir, "positive_files")):
        import jax

        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(REPO, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
        if args.cpu:
            jax.config.update("jax_platforms", "cpu")
        from birdsoundclassif_tpu.data.etl import (
            _ASSET_BIRD_DICT,
            prepare_dataset,
        )
        from birdsoundclassif_tpu.data.synthetic import write_hard_corpus

        with open(_ASSET_BIRD_DICT) as f:
            names = list(json.load(f).keys())[:args.n_species]
        rng = np.random.default_rng(args.seed)
        t0 = time.time()
        counts = write_hard_corpus(
            rec_dir, test_dir, neg_dir, rng, names,
            files_per_species=2, n_negative_files=12,
            train_duration_s=15.0, calls_per_file=4,
            test_every=args.test_every,
            randomize_fc=True, test_files_per_species=3)
        print(f"morph corpus: {counts}", flush=True)
        prepare_dataset(rec_dir, data_dir)
        if os.path.isdir(args.hard_neg_src) and not os.path.isdir(
                os.path.join(data_dir, "hard_neg")):
            shutil.copytree(args.hard_neg_src,
                            os.path.join(data_dir, "hard_neg"))
        print(f"ETL {time.time() - t0:.0f}s", flush=True)
    if args.etl_only:
        return 0

    _log("waiting for a live backend")
    device = wait_for_chip(args.cpu)
    _log(f"backend up: {device}")

    save_root = os.path.join(work, "models")
    extra = ["--lr_drop", str(args.lr_drop),
             "--batch_transfer_dtype", "bfloat16",
             "--device_augment", "true",
             "--remat_backbone", "true",
             "--remat_granularity", "stages",
             # microbatch 4: the f32 RPN head's activation casts OOM the
             # campaign's microbatch-8 config (docs/BENCH.md r5 A/B note)
             "--grad_accum_steps", str(max(4, args.batch_size // 4)),
             "--eval_every", str(args.eval_every),
             "--ckpt_every_steps", str(args.eval_every),
             "--rpn_head_f32", args.rpn_head_f32,
             "--seed", str(args.seed)]
    wall, attempts, resume_points, reseeds = run_driver(
        data_dir, save_root, "morph", args.steps, args.batch_size,
        args.cpu, extra)
    _log(f"morph arm done in {wall:.0f}s ({attempts} attempts, "
         f"{reseeds} reseeds)")

    # ---- measurements (subprocess-free: we are already the worker) ----
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from scripts.attribute_map import (
        collect_outputs,
        confusion_split,
        per_class_ap,
    )

    from birdsoundclassif_tpu.config import NbmConfig
    from birdsoundclassif_tpu.infer.pipeline import load_model

    def flush(entry):
        result = {}
        if os.path.isfile(args.out):
            try:
                with open(args.out) as f:
                    result = json.load(f)
            except json.JSONDecodeError:
                pass
        result["morphology_only_arm"] = entry
        tmp = args.out + ".tmp"
        with open(tmp, "w") as f:
            json.dump(result, f, indent=2)
            f.write("\n")
        os.replace(tmp, args.out)

    ckpt = os.path.join(save_root, "morph", "ckpt_last")
    params, cfg = load_model(ckpt)
    outputs = collect_outputs(params, cfg, test_dir, 0.02, args.batch_size)
    base_conf = confusion_split(outputs)
    base_pc = per_class_ap(outputs)
    base_maps = [v["AP"] for v in base_pc.values() if v["AP"] > -1]

    # trajectory from metrics
    traj = {}
    mp = os.path.join(save_root, "morph", "metrics.jsonl")
    with open(mp) as f:
        for line in f:
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            if rec["tag"] == "Test_metrics/mAP":
                traj[str(rec["step"])] = round(rec["value"], 4)

    entry = {
        "what": "from-scratch arm on the morphology-only corpus "
                "(randomize_fc: center frequency drawn per call; absolute "
                "position carries no species information)",
        "steps": args.steps,
        "seed": args.seed,
        "train_wall_s": round(wall, 1),
        "attempts": attempts,
        "takeoff_reseeds": reseeds,
        "mAP_trajectory": traj,
        "mAP_final": round(float(np.mean(base_maps)), 4) if base_maps else 0.0,
        "cls_acc_on_localized": base_conf["cls_acc_on_localized"],
        "gt_found_rate": base_conf["gt_found_rate"],
    }
    flush(entry)  # baseline lands even if the ablation pass is cut short
    print(json.dumps(entry, indent=2), flush=True)

    cfg_abl = NbmConfig.from_json(cfg.to_json())
    cfg_abl.ablate_roi_pe = True
    outputs_abl = collect_outputs(params, cfg_abl, test_dir, 0.02,
                                  args.batch_size)
    abl_conf = confusion_split(outputs_abl)
    entry["cls_acc_on_localized_pe_ablated"] = abl_conf["cls_acc_on_localized"]
    entry["pe_ablation_drop"] = round(
        base_conf["cls_acc_on_localized"]
        - abl_conf["cls_acc_on_localized"], 4)
    flush(entry)
    print(json.dumps(entry, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
