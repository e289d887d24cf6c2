"""End-of-round-4 artifact finalizer: summarize the 40k arm's trajectory
(the same summary shape r3 used for its interrupted arm), cross-link the
attribution artifact, and sanity-print the headline numbers.

Usage: python scripts/finalize_r4.py [--out TRAINING_E2E_r4.json]
Idempotent; safe to run while/after the harness finishes.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--out", default=os.path.join(REPO, "TRAINING_E2E_r4.json"))
    p.add_argument("--arm", default="neg_on_40k")
    p.add_argument("--lr_drop_step", type=int, default=8000)
    p.add_argument("--metrics", default=os.path.join(
        REPO, "runs", "nbm_hard", "models", "hard_neg_on_40k",
        "metrics.jsonl"))
    p.add_argument("--declared", type=int, default=40_000,
                   help="the arm's declared step target (the artifact's "
                        "own 'steps' field was clobbered to the reached "
                        "count by the r4 harness overwrite)")
    args = p.parse_args(argv)

    with open(args.out) as f:
        d = json.load(f)
    runs = d.get("runs", {})
    arm = runs.get(args.arm)
    if arm is None:
        print(f"arm {args.arm} not in {args.out}", file=sys.stderr)
        return 1
    traj = {int(k): v for k, v in arm.get("trajectory", {}).items()}
    if not traj:
        print("no trajectory yet", file=sys.stderr)
        return 1
    steps = sorted(traj)
    maps = {s: traj[s].get("mAP") for s in steps if "mAP" in traj[s]}
    ms = [s for s in maps if maps[s] is not None]
    best_step = max(ms, key=lambda s: maps[s])
    pre = [maps[s] for s in ms if 4000 <= s < args.lr_drop_step]
    post = [maps[s] for s in ms if s >= args.lr_drop_step + 2000]
    last5 = [maps[s] for s in ms[-5:]]

    # Reconstruct wall time + launch count from metrics.jsonl timestamps
    # (VERDICT r4 weak #5: the committed artifact recorded train_wall_s=0.0
    # / attempts=0 because the harness's final invocation found the arm
    # checkpoint and skipped it, clobbering the earlier accounting). A ts
    # gap > 120 s between consecutive records = a separate driver launch.
    if os.path.isfile(args.metrics):
        ts = []
        with open(args.metrics) as f:
            for line in f:
                try:
                    ts.append(json.loads(line)["ts"])
                except (json.JSONDecodeError, KeyError):
                    continue
        wall, launches = 0.0, 1 if ts else 0
        for a, b in zip(ts, ts[1:]):
            gap = b - a
            if gap > 120:
                launches += 1
            else:
                wall += max(gap, 0.0)
        arm["train_wall_s"] = round(wall, 1)
        arm["driver_launches"] = launches
        arm["attempts"] = launches  # the live counter was zeroed; see note
        arm["accounting_note"] = (
            "train_wall_s and driver_launches reconstructed from "
            "metrics.jsonl timestamps (sum of <=120s inter-record deltas / "
            "count of >120s gaps); the live harness counters were lost to "
            "an arm-skip overwrite, fixed in scripts/train_hard.py r5"
        )

    declared = args.declared
    # trajectory points land on the eval cadence; ckpt_last/meta.json is
    # the true reached count when present
    reached = steps[-1]
    meta_p = os.path.join(os.path.dirname(args.metrics), "ckpt_last",
                          "meta.json")
    if os.path.isfile(meta_p):
        with open(meta_p) as f:
            reached = max(reached, int(json.load(f).get("steps", 0)))
    arm["summary"] = {
        "steps_completed": reached,
        "steps_declared": declared,
        "completed": bool(reached >= declared),
        "mAP_best": round(max(maps[s] for s in ms), 4),
        "mAP_best_step": int(best_step),
        "mAP_final": round(maps[ms[-1]], 4),
        "mAP_mean_pre_lr_drop_4k_8k": round(float(np.mean(pre)), 4) if pre else None,
        "mAP_mean_post_lr_drop": round(float(np.mean(post)), 4) if post else None,
        "mAP_mean_last5_evals": round(float(np.mean(last5)), 4),
        "AP_final": traj[ms[-1]].get("AP"),
        "note": (
            f"reached {reached:,} of the declared {declared:,} steps when "
            "round-4 time expired"
            + ("" if reached >= declared else " — NOT completed") +
            " (r3's best reached 13.5k of 40k before /tmp was wiped). "
            "Durable work dir under runs/, step-cadence resumable "
            "checkpoints (--ckpt_every_steps), harness-level arm resume "
            "(resume_points), and the bistable-takeoff salvage are "
            "recorded in this artifact."
        ),
    }
    if os.path.isfile(os.path.join(REPO, "ATTRIBUTION_r4.json")):
        arm["attribution_artifact"] = "ATTRIBUTION_r4.json"
    d["runs"] = runs
    tmp = args.out + ".tmp"
    with open(tmp, "w") as f:
        json.dump(d, f, indent=2)
        f.write("\n")
    os.replace(tmp, args.out)
    print(json.dumps(arm["summary"], indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
