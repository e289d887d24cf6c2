"""Assemble TRAINING_E2E_r5.json into the round-5 campaign artifact
(VERDICT r4 next #1 'done' criteria):

  - states the NEW eval protocol ceiling (~1.0) next to the numbers, from
    the rebuilt test set's MANIFEST.json
  - merges the retroactive re-score of the saved r4 checkpoints
    (RESCORE_r5.json) as `retroactive_trajectory`
  - confirms steps >= 40,000 from ckpt_last/meta.json (fails loudly if the
    arm is still short — no 'COMPLETED' overclaims this round)
  - summary block: trajectory stats on the informative scale

Usage: python scripts/finalize_r5.py [--out TRAINING_E2E_r5.json]
Idempotent.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--out", default=os.path.join(REPO, "TRAINING_E2E_r5.json"))
    p.add_argument("--arm", default="neg_on_40k")
    p.add_argument("--declared", type=int, default=40_000)
    p.add_argument("--work_dir", default=os.path.join(REPO, "runs", "nbm_hard"))
    p.add_argument("--model_dir", default="hard_neg_on_40k")
    args = p.parse_args(argv)

    work = os.path.abspath(args.work_dir)
    with open(args.out) as f:
        d = json.load(f)
    arm = d.get("runs", {}).get(args.arm)
    if arm is None:
        print(f"arm {args.arm} not in {args.out}", file=sys.stderr)
        return 1

    man_p = os.path.join(work, "dataset", "test_files", "MANIFEST.json")
    with open(man_p) as f:
        man = json.load(f)
    d["test_protocol"] = {
        "map_ceiling_perfect_detector": man["map_ceiling_perfect_detector"],
        "min_gt_per_species": man["min_gt_per_species"],
        "n_test_files": man["n_test_files"],
        "n_test_species": man["n_test_species"],
        "note": ("r5 rebuilt test set (scripts/rebuild_eval_corpus.py): the "
                 "r4 protocol capped a perfect detector at mAP 0.400 "
                 "(4 GT/species x 10 recall bins); all r5 numbers are on "
                 "the ceiling-1.0 protocol and are NOT comparable to the "
                 "r4 trajectory values"),
    }

    res_p = os.path.join(REPO, "RESCORE_r5.json")
    if os.path.isfile(res_p):
        with open(res_p) as f:
            res = json.load(f)
        arm["retroactive_trajectory"] = {
            str(v["steps"]): {k: v[k] for k in ("AP", "mAP", "Rec", "mRec")}
            for v in res["checkpoints"].values()
        }

    meta_p = os.path.join(work, "models", args.model_dir, "ckpt_last",
                          "meta.json")
    reached = 0
    if os.path.isfile(meta_p):
        with open(meta_p) as f:
            reached = int(json.load(f).get("steps", 0))
    traj = {int(k): v for k, v in arm.get("trajectory", {}).items()}
    new_pts = {s: v for s, v in traj.items() if s > 34_332}
    arm["summary"] = {
        "steps_declared": args.declared,
        "steps_reached": reached,
        "completed": bool(reached >= args.declared),
        "resumed_from": 34_332,
        "r5_eval_points": {str(s): v for s, v in sorted(new_pts.items())},
        "mAP_final_on_ceiling1_protocol":
            (sorted(new_pts.items())[-1][1].get("mAP")
             if new_pts else None),
        "note": ("resumed in r5 from the r4 arm's step-34,332 ckpt_last and "
                 "run to completion on the rebuilt test protocol; the "
                 "retroactive_trajectory re-scores the saved r4 checkpoints "
                 "on the same protocol so the whole curve is on one scale"),
    }
    if not arm["summary"]["completed"]:
        print(f"WARNING: arm at {reached} < {args.declared} — artifact says "
              "NOT completed", file=sys.stderr)

    tmp = args.out + ".tmp"
    with open(tmp, "w") as f:
        json.dump(d, f, indent=2)
        f.write("\n")
    os.replace(tmp, args.out)
    print(json.dumps(arm["summary"], indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
