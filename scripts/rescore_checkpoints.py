"""Re-score saved hard-corpus checkpoints on the rebuilt (ceiling-1.0) test
set — the retroactive trajectory VERDICT r4 next #1 asks for.

The r4 trajectory was measured against a test set whose AP protocol capped a
perfect detector at mAP 0.400 (4 GT boxes/species); every saved checkpoint is
re-evaluated here against the r5 rebuild (12 GT/species, ceiling 1.0,
scripts/rebuild_eval_corpus.py) so the 13.7k/30k/34.3k points become
comparable on an informative scale.

Usage: python scripts/rescore_checkpoints.py [--out RESCORE_r5.json] [--cpu]
Each checkpoint eval runs in-process; the script is resumable (finished
entries in --out are skipped) so a chip outage costs one checkpoint.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--work_dir", default=os.path.join(REPO, "runs", "nbm_hard"))
    p.add_argument("--out", default=os.path.join(REPO, "RESCORE_r5.json"))
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--test_dir", default=None,
                   help="default: <work_dir>/dataset/test_files/XC_annots")
    args = p.parse_args(argv)

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from birdsoundclassif_tpu.eval.ap import evaluate_test_dir
    from birdsoundclassif_tpu.infer.pipeline import load_model

    work = os.path.abspath(args.work_dir)
    test_dir = args.test_dir or os.path.join(
        work, "dataset", "test_files", "XC_annots")
    manifest_p = os.path.join(os.path.dirname(test_dir), "MANIFEST.json")
    manifest = {}
    if os.path.isfile(manifest_p):
        with open(manifest_p) as f:
            manifest = json.load(f)

    ckpts = {
        "step_13736": os.path.join(work, "attrib_ckpt_13k"),
        "step_30000_best": os.path.join(
            work, "models", "hard_neg_on_40k", "ckpt_best"),
        "step_34332_last": os.path.join(
            work, "models", "hard_neg_on_40k", "ckpt_last"),
    }

    out = {"what": "saved hard-corpus checkpoints re-scored on the r5 "
                   "rebuilt test set (mAP ceiling 1.0; the r4 numbers for "
                   "these checkpoints were measured against a 0.400-ceiling "
                   "protocol and are NOT comparable)",
           "test_set": manifest,
           "checkpoints": {}}
    if os.path.isfile(args.out):
        try:
            with open(args.out) as f:
                out = json.load(f)
        except json.JSONDecodeError:
            pass

    for key, ckpt in ckpts.items():
        if key in out["checkpoints"]:
            print(f"{key}: already scored, skipping", flush=True)
            continue
        if not os.path.isdir(ckpt):
            print(f"{key}: {ckpt} missing, skipping", flush=True)
            continue
        params, cfg = load_model(ckpt)
        t0 = time.time()
        metrics = evaluate_test_dir(params, cfg, test_dir, min_score=0.02,
                                    bs=args.batch_size)
        wall = time.time() - t0
        with open(os.path.join(ckpt, "meta.json")) as f:
            steps = json.load(f)["steps"]
        out["checkpoints"][key] = {
            "ckpt": os.path.relpath(ckpt, REPO),
            "steps": steps,
            "eval_wall_s": round(wall, 1),
            **{k: round(float(v), 4) for k, v in metrics.items()},
        }
        print(f"{key} (step {steps}): {metrics} ({wall:.0f}s)", flush=True)
        tmp = args.out + ".tmp"
        with open(tmp, "w") as f:
            json.dump(out, f, indent=2)
        os.replace(tmp, args.out)
    print(json.dumps(out["checkpoints"], indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
