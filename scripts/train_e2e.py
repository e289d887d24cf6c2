"""End-to-end training fallback demo (VERDICT r1: real-checkpoint parity
fallback). Runs the FULL production loop — synthetic corpus -> prepare_dataset
ETL -> ImgDataset/BatchLoader -> train.driver.main (validation + in-training
test mAP) -> final evaluate_test_dir — and writes TRAINING_E2E.json with the
mAP trajectory, proving train -> checkpoint -> CLI-infer -> mAP produces a
score well above chance (reference protocol: train.py:389-396).

Usage:  python scripts/train_e2e.py [--steps 1500] [--work_dir /tmp/e2e]
                                    [--out TRAINING_E2E.json] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=1500)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--work_dir", default="/tmp/nbm_e2e")
    p.add_argument("--out", default="TRAINING_E2E.json")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (default: session backend, "
                        "i.e. the TPU when available)")
    args = p.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    import numpy as np

    from birdsoundclassif_tpu.data.etl import prepare_dataset
    from birdsoundclassif_tpu.data.synthetic import write_corpus

    work = os.path.abspath(args.work_dir)
    rec_dir = os.path.join(work, "rec")
    data_dir = os.path.join(work, "dataset")
    test_dir = os.path.join(data_dir, "test_files", "XC_annots")

    t0 = time.time()
    if not os.path.isdir(os.path.join(data_dir, "positive_files")):
        rng = np.random.default_rng(7)
        counts = write_corpus(rec_dir, test_dir, rng)
        print(f"corpus: {counts}", flush=True)
        prepare_dataset(rec_dir, data_dir)
    # a denser test set too: with only 4 GT boxes per species the reference
    # AP protocol caps per-species AP at 0.4 (only 4 of the 10 recall bins
    # are occupied; nets_utils.py:513-534), so the dense set (12 calls/file)
    # makes the mAP ceiling 1.0
    dense_dir = os.path.join(work, "test_dense")
    if not os.path.isdir(dense_dir):
        from birdsoundclassif_tpu.data.synthetic import SPECIES_BANK, synth_recording, \
            write_annots, write_wav

        rng_d = np.random.default_rng(11)
        os.makedirs(dense_dir, exist_ok=True)
        for i, sp in enumerate(SPECIES_BANK):
            tag = sp[0].lower().replace(" ", "_")
            sig, annots = synth_recording(sp, 30.0, 12, rng_d)
            base = os.path.join(dense_dir, f"{tag}#XC{9000 + i}")
            write_wav(base + ".wav", sig)
            write_annots(base + ".txt", annots)
    etl_s = time.time() - t0
    n_pos = sum(
        len(files) for _, _, files in os.walk(os.path.join(data_dir, "positive_files"))
    )
    print(f"ETL done in {etl_s:.1f}s, {n_pos} positive window files", flush=True)

    # baseline mAP at random init (chance level)
    from birdsoundclassif_tpu.config import NbmConfig
    from birdsoundclassif_tpu.eval.ap import evaluate_test_dir
    from birdsoundclassif_tpu.models.detector import NbmModel

    cfg = NbmConfig()
    cfg.data_path = data_dir
    init_params = NbmModel.init(jax.random.PRNGKey(0), cfg)
    t0 = time.time()
    baseline = evaluate_test_dir(init_params, cfg, test_dir, min_score=0.02,
                                 bs=args.batch_size)
    print(f"random-init baseline ({time.time() - t0:.0f}s): {baseline}", flush=True)
    del init_params

    # the real driver: ETL dataset -> steps -> val -> in-training test mAP
    from birdsoundclassif_tpu.train import driver

    save_root = os.path.join(work, "models")
    flags = [
        "--data_path", data_dir,
        "--save_dir", save_root,
        "--model_name", "e2e_demo",
        "--batch_size", str(args.batch_size),
        "--max_steps", str(args.steps),
    ]
    t0 = time.time()
    rc = driver.main(flags)
    train_s = time.time() - t0
    assert rc == 0

    # trajectory from the driver's own metrics stream
    mdir = os.path.join(save_root, "e2e_demo")
    traj = []
    with open(os.path.join(mdir, "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if rec["tag"].startswith("Test_metrics/"):
                traj.append(rec)
    by_step: dict = {}
    for rec in traj:
        by_step.setdefault(rec["step"], {})[rec["tag"].split("/")[1]] = rec["value"]

    # final eval through the checkpoint load path (CLI-equivalent)
    from birdsoundclassif_tpu.infer.pipeline import load_model

    params, cfg2 = load_model(os.path.join(mdir, "ckpt_last"))
    final = evaluate_test_dir(params, cfg2, test_dir, min_score=0.02,
                              bs=args.batch_size)
    print(f"final (from ckpt_last): {final}", flush=True)
    final_dense = evaluate_test_dir(params, cfg2, dense_dir, min_score=0.02,
                                    bs=args.batch_size)
    print(f"final dense (12 calls/species/file): {final_dense}", flush=True)

    result = {
        "what": "end-to-end training fallback: synthetic 6-species corpus, "
                "full ETL + driver + in-training test mAP + post-hoc eval "
                "from the saved checkpoint",
        "device": str(jax.devices()[0]),
        "steps": args.steps,
        "batch_size": args.batch_size,
        "positive_window_files": n_pos,
        "baseline_random_init": baseline,
        "trajectory": {str(k): v for k, v in sorted(by_step.items())},
        "final_from_checkpoint": final,
        "final_dense_test": final_dense,
        "note": "with 4 GT boxes/species the reference AP protocol caps "
                "per-species AP at 0.4 (4 of 10 recall bins occupied); the "
                "dense test set (12 calls/species) removes that ceiling",
        "train_wall_s": round(train_s, 1),
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))

    assert final["mAP"] > 0.2, f"mAP {final['mAP']} not above chance"
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
