"""On-chip multi-seed A/B for the bistable-takeoff root fix
(VERDICT r4 next #3).

The r4 campaign showed stage-1 training has a bistable takeoff: under bf16
compute the RPN objectness either escapes its ~ln2 saddle in the first few
hundred steps or never does, and which basin you draw flips with
compile-level reduction-order noise (docs/BENCH.md r4). The principled fix
is `--rpn_head_f32` (stage-1 head in float32, config.py); this harness runs
  {control (bf16 head), fix (f32 head)} x --seeds
from-scratch arms of --steps each on the session backend with the campaign
config, then reports per-arm takeoff step (first flushed
Training_Loss/first_class_loss below --takeoff_thresh), the final fcl, and
test mAP of the final checkpoint on the (r5 ceiling-1.0) test set.

NO takeoff watchdog here — saddle-stuck arms are the measurement.

Usage: python scripts/ab_takeoff.py [--steps 1500] [--seeds 42,43,44,45]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from scripts.train_hard import (  # noqa: E402
    _log,
    probe_chip,
    run_phase,
    wait_for_chip,
)


def fcl_trajectory(metrics_path):
    """[(step, value)] of flushed Training_Loss/first_class_loss records."""
    out = []
    if not os.path.isfile(metrics_path):
        return out
    with open(metrics_path) as f:
        for line in f:
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            if rec.get("tag") == "Training_Loss/first_class_loss":
                # the step-0 flush averages a single step over the 50-step
                # window (driver _drain), so its value is ~loss/50 — not a
                # real loss reading; drop it or every arm "takes off" at 0
                if rec["step"] > 0:
                    out.append((rec["step"], rec["value"]))
    return out


def takeoff_step(traj, thresh):
    for step, val in traj:
        if val < thresh:
            return step
    return None


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=1500)
    p.add_argument("--seeds", default="42,43,44,45")
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--takeoff_thresh", type=float, default=0.3)
    p.add_argument("--work_dir", default=os.path.join(REPO, "runs", "nbm_hard"))
    p.add_argument("--ab_dir", default=os.path.join(REPO, "runs", "ab_takeoff"))
    p.add_argument("--out", default=os.path.join(REPO, "AB_TAKEOFF_r5.json"))
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--skip_eval", action="store_true")
    args = p.parse_args(argv)

    work = os.path.abspath(args.work_dir)
    data_dir = os.path.join(work, "dataset")
    test_dir = os.path.join(data_dir, "test_files", "XC_annots")
    if not os.path.isdir(os.path.join(data_dir, "positive_files")):
        raise SystemExit("hard corpus missing; run train_hard.py --etl_only")
    save_root = os.path.abspath(args.ab_dir)
    os.makedirs(save_root, exist_ok=True)

    seeds = [int(s) for s in args.seeds.split(",")]
    arms = ([("control", s) for s in seeds]
            + [("f32", s) for s in seeds])
    if os.environ.get("AB_CONTROL_A4"):
        # optional accum-4 control anchor: checks the control basin
        # persists at the f32 arms' microbatch (see arm_flags). Costs a
        # fresh ~15 min executable compile; the r5 round ran out of chip
        # budget for it — the accum asymmetry is recorded as a caveat.
        arms += [("control_a4", seeds[0])]

    # campaign config (scripts/train_hard.py `common`), eval disabled during
    # the run (eval_every > steps) — mAP is scored once on the final ckpt
    def arm_flags(variant, seed, name):
        # f32 arms need a smaller microbatch: the campaign config sits
        # within ~0.5 GB of the v5e HBM wall at microbatch 8
        # (docs/BENCH.md "Memory wall, part 2"), and the f32 casts of the
        # FPN features + their gradients pushed f32_s42 into a measured
        # ResourceExhausted. Microbatch 4 (accum 4) halves activation
        # memory. The accum asymmetry vs the control arms is recorded in
        # the artifact; grad-accum loss normalization semantics are
        # documented (train/loop.py _accum_grads) and a control_a4 anchor
        # arm (run separately) checks the basin behavior is accum-robust.
        accum = {"control": max(2, args.batch_size // 8),
                 "f32": max(4, args.batch_size // 4),
                 "control_a4": max(4, args.batch_size // 4)}[variant]
        fl = [
            "--data_path", data_dir,
            "--save_dir", save_root,
            "--model_name", name,
            "--batch_size", str(args.batch_size),
            "--max_steps", str(args.steps),
            "--seed", str(seed),
            "--lr_drop", "8",
            "--batch_transfer_dtype", "bfloat16",
            "--device_augment", "true",
            "--remat_backbone", "true",
            "--remat_granularity", "stages",
            "--grad_accum_steps", str(accum),
            "--eval_every", str(10 * args.steps),
            "--validation_prop", "0",
        ]
        if variant == "f32":
            fl += ["--rpn_head_f32", "true"]
        return fl

    result = {
        "what": "multi-seed A/B of the bistable-takeoff root fix: control "
                "(bf16 stage-1 head) vs --rpn_head_f32, from-scratch arms "
                "on the class-scale corpus; takeoff = first flushed "
                "first_class_loss < thresh (the r4 saddle sits at ~0.60)",
        "steps": args.steps,
        "batch_size": args.batch_size,
        "takeoff_thresh": args.takeoff_thresh,
        "seeds": seeds,
        "arms": {},
    }
    if os.path.isfile(args.out):
        try:
            with open(args.out) as f:
                prior = json.load(f)
            result["arms"] = prior.get("arms", {})
        except json.JSONDecodeError:
            pass

    def flush():
        tmp = args.out + ".tmp"
        with open(tmp, "w") as f:
            json.dump(result, f, indent=2)
        os.replace(tmp, args.out)

    _log("waiting for a live backend")
    result["device"] = wait_for_chip(args.cpu)

    tail = ("import sys; from birdsoundclassif_tpu.train import driver; "
            "sys.exit(driver.main(sys.argv[1:]))")
    for variant, seed in arms:
        name = f"{variant}_s{seed}"
        if name in result["arms"] and "takeoff_step" in result["arms"][name]:
            _log(f"{name}: already measured, skipping")
            continue
        arm_dir = os.path.join(save_root, name)
        meta = os.path.join(arm_dir, "ckpt_last", "meta.json")
        done = False
        if os.path.isfile(meta):
            with open(meta) as f:
                done = int(json.load(f).get("steps", 0)) >= args.steps
        t0 = time.time()
        if not done:
            t, attempts = run_phase(tail, arm_flags(variant, seed, name),
                                    args.cpu, f"ab[{name}]")
        else:
            t, attempts = 0.0, 0
        traj = fcl_trajectory(os.path.join(arm_dir, "metrics.jsonl"))
        prior = result["arms"].get(name, {})
        rec = {
            **prior,
            "variant": variant,
            "seed": seed,
            "takeoff_step": takeoff_step(traj, args.takeoff_thresh),
            "fcl_first": round(traj[0][1], 4) if traj else None,
            "fcl_final": round(traj[-1][1], 4) if traj else None,
            "fcl_min": round(min(v for _, v in traj), 4) if traj else None,
            "train_wall_s": round(prior.get("train_wall_s", 0.0) + t, 1),
            "attempts": prior.get("attempts", 0) + attempts,
        }
        result["arms"][name] = rec
        _log(f"{name}: takeoff={rec['takeoff_step']} "
             f"fcl_final={rec['fcl_final']} ({time.time() - t0:.0f}s)")
        flush()

    if not args.skip_eval:
        # score each final checkpoint on the rebuilt test set (subprocess
        # per ckpt so a chip outage is retryable)
        for variant, seed in arms:
            name = f"{variant}_s{seed}"
            rec = result["arms"].get(name, {})
            if "mAP_final" in rec:
                continue
            ckpt = os.path.join(save_root, name, "ckpt_last")
            if not os.path.isdir(ckpt):
                continue
            out_p = os.path.join(save_root, name, "eval.json")
            code = (
                "import sys, json; "
                "from birdsoundclassif_tpu.eval.ap import evaluate_test_dir; "
                "from birdsoundclassif_tpu.infer.pipeline import load_model; "
                f"params, cfg = load_model({ckpt!r}); "
                f"m = evaluate_test_dir(params, cfg, {test_dir!r}, "
                f"min_score=0.02, bs={args.batch_size}); "
                f"json.dump(m, open({out_p!r}, 'w'))"
            )
            run_phase(code, [], args.cpu, f"eval[{name}]", max_attempts=4)
            with open(out_p) as f:
                m = json.load(f)
            rec["mAP_final"] = round(float(m["mAP"]), 4)
            rec["Rec_final"] = round(float(m["Rec"]), 4)
            _log(f"{name}: mAP={rec['mAP_final']}")
            flush()

    # summary table
    summary = {}
    for variant in ("control", "f32", "control_a4"):
        vseeds = seeds if variant != "control_a4" else seeds[:1]
        rows = [r for s in vseeds
                if (r := result["arms"].get(f"{variant}_s{s}"))]
        if not rows:
            continue  # variant not run (e.g. the optional control_a4)
        offs = [r.get("takeoff_step") for r in rows]
        summary[variant] = {
            "takeoff_rate": f"{sum(1 for o in offs if o is not None)}/{len(rows)}",
            "takeoff_steps": offs,
            "mAP_final": [r.get("mAP_final") for r in rows],
        }
    result["summary"] = summary
    flush()
    print(json.dumps(summary, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
