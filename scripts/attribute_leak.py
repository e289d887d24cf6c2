"""Close the positional-leak confound in the r4 species-head attribution
(VERDICT r4 next #4 / weak #3).

ATTRIBUTION_r4.json concluded "no species-head headroom" from 98%
classification accuracy on localized boxes vs a 27.6% oracle crop
classifier — but the comparison conflated two information budgets: the
detector's RoI positional encoding carries the box's ABSOLUTE frequency
band (reference layers.py:482-489), each synthetic species has a FIXED
center frequency (data/synthetic.py species_bank), and the oracle saw only
32x64 resized crops with no absolute-frequency input. 98% vs 27.6% could
be position lookup, not morphology discrimination.

Two controlled measurements on the trained checkpoint + the r5
(ceiling-1.0) test set:

  A. RoI-PE ablation: re-run the detector with `ablate_roi_pe` (zero the
     RoI PE at the second stage) and measure the drop in
     cls_acc_on_localized. Caveat stated in the artifact: zero-PE is
     out-of-distribution for a head trained with PE, so the drop is an
     upper bound on how much accuracy REQUIRES position — but a head that
     keeps most of its accuracy without PE is provably not a pure
     position lookup.
  B. Fair oracle: train the crop classifier twice — plain crops vs crops +
     the absolute frequency band (y1/h, y2/h) as input features — giving
     the oracle the same information budget as the head. The
     posfeat-minus-plain gap measures how much of the corpus's species
     identity is linearly available from position alone.

Usage:
  python scripts/attribute_leak.py --ckpt runs/nbm_hard/models/hard_neg_on_40k/ckpt_last \
      [--out ATTRIBUTION_r5.json] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from scripts.attribute_map import (  # noqa: E402
    collect_outputs,
    confusion_split,
    fit_oracle,
    oracle_eval,
    per_class_ap,
    test_crops,
    train_crops,
)


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True)
    p.add_argument("--work_dir", default=os.path.join(REPO, "runs", "nbm_hard"))
    p.add_argument("--out", default="ATTRIBUTION_r5.json")
    p.add_argument("--min_score", type=float, default=0.02)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--oracle_steps", type=int, default=3000)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--skip_detector", action="store_true")
    p.add_argument("--skip_oracle", action="store_true")
    args = p.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from birdsoundclassif_tpu.config import NbmConfig
    from birdsoundclassif_tpu.infer.pipeline import load_model

    work = os.path.abspath(args.work_dir)
    test_dir = os.path.join(work, "dataset", "test_files", "XC_annots")
    data_dir = os.path.join(work, "dataset")

    result = {}
    if os.path.isfile(args.out):
        try:
            with open(args.out) as f:
                result = json.load(f)
        except json.JSONDecodeError:
            result = {}
    result["what"] = (
        "leak-controlled species-head attribution: RoI-PE ablation on the "
        "trained detector + information-budget-matched oracle (crop vs "
        "crop+absolute-frequency-band), on the r5 ceiling-1.0 test set")
    result["ckpt"] = args.ckpt

    def flush():
        tmp = args.out + ".tmp"
        with open(tmp, "w") as f:
            json.dump(result, f, indent=2)
            f.write("\n")
        os.replace(tmp, args.out)

    if not args.skip_detector and "detector" not in result:
        params, cfg = load_model(args.ckpt)
        t0 = time.time()
        outputs = collect_outputs(params, cfg, test_dir, args.min_score,
                                  args.batch_size)
        base_conf = confusion_split(outputs)
        base_pc = per_class_ap(outputs)
        base_maps = [v["AP"] for v in base_pc.values() if v["AP"] > -1]
        print(f"baseline: {base_conf['cls_acc_on_localized']:.4f} cls acc "
              f"({time.time() - t0:.0f}s)", flush=True)

        def ablated_pass(flag):
            cfg_abl = NbmConfig.from_json(cfg.to_json())
            setattr(cfg_abl, flag, True)
            t0 = time.time()
            outputs_abl = collect_outputs(params, cfg_abl, test_dir,
                                          args.min_score, args.batch_size)
            conf = confusion_split(outputs_abl)
            pc = per_class_ap(outputs_abl)
            maps = [v["AP"] for v in pc.values() if v["AP"] > -1]
            print(f"{flag}: {conf['cls_acc_on_localized']:.4f} cls acc, "
                  f"loc rate {conf['det_localized_rate']:.4f} "
                  f"({time.time() - t0:.0f}s)", flush=True)
            return {
                "cls_acc_on_localized": conf["cls_acc_on_localized"],
                "det_localized_rate": conf["det_localized_rate"],
                "gt_found_rate": conf["gt_found_rate"],
                "mAP": round(float(np.mean(maps)), 4) if maps else 0.0,
            }

        zero = ablated_pass("ablate_roi_pe")
        neutral = ablated_pass("neutral_roi_pe")
        result["detector"] = {
            "baseline": {
                "cls_acc_on_localized": base_conf["cls_acc_on_localized"],
                "det_localized_rate": base_conf["det_localized_rate"],
                "gt_found_rate": base_conf["gt_found_rate"],
                "mAP": round(float(np.mean(base_maps)), 4) if base_maps else 0.0,
            },
            "roi_pe_zeroed": {
                **zero,
                "note": ("zero-PE collapses the FiLM-modulated head "
                         "outright (zero detections) — out of "
                         "distribution, not an information ablation"),
            },
            "roi_pe_neutral_band": {
                **neutral,
                "note": ("every RoI's PE computed for a fixed mid-height "
                         "band at its own time extent: in-distribution "
                         "magnitudes, zero frequency-position information "
                         "— the clean ablation"),
            },
            "cls_acc_drop_from_neutral_pe": round(
                base_conf["cls_acc_on_localized"]
                - neutral["cls_acc_on_localized"], 4),
        }
        flush()

    if not args.skip_oracle and "oracle_fair" not in result:
        t0 = time.time()
        xs, ys, ps = train_crops(data_dir)
        cfg0 = NbmConfig()
        xt, yt, pt = test_crops(cfg0, test_dir)
        print(f"crops: train {xs.shape} test {xt.shape} "
              f"({time.time() - t0:.0f}s)", flush=True)
        n_classes = cfg0.num_classes + 1

        apply_p, op_p, val_p = fit_oracle(xs, ys, n_classes,
                                          steps=args.oracle_steps)
        acc_plain, _ = oracle_eval(apply_p, op_p, xt, yt)
        print(f"plain oracle test top1: {acc_plain:.4f}", flush=True)

        apply_f, op_f, val_f = fit_oracle(xs, ys, n_classes,
                                          steps=args.oracle_steps, pos=ps)
        acc_fair, _ = oracle_eval(apply_f, op_f, xt, yt, pos=pt)
        print(f"fair (crop+band) oracle test top1: {acc_fair:.4f}",
              flush=True)

        result["oracle_fair"] = {
            "n_train_crops": int(len(xs)),
            "n_test_crops": int(len(xt)),
            "plain": {"train_val_top1": round(val_p, 4),
                      "test_top1": round(acc_plain, 4)},
            "crop_plus_absolute_band": {
                "train_val_top1": round(val_f, 4),
                "test_top1": round(acc_fair, 4)},
            "position_information_gain": round(acc_fair - acc_plain, 4),
        }
        flush()

    det = result.get("detector")
    orc = result.get("oracle_fair")
    if det and orc and "roi_pe_neutral_band" in det:
        base = det["baseline"]["cls_acc_on_localized"]
        neu = det["roi_pe_neutral_band"]["cls_acc_on_localized"]
        neu_loc = det["roi_pe_neutral_band"]["det_localized_rate"]
        fair = orc["crop_plus_absolute_band"]["test_top1"]
        plain = orc["plain"]["test_top1"]
        result["attribution"] = {
            "detector_cls_acc": base,
            "detector_cls_acc_neutral_pe": neu,
            "oracle_plain": plain,
            "oracle_fair": fair,
            "fair_headroom_gap": round(fair - base, 4),
            "reading": (
                f"Detector species accuracy on localized boxes: {base:.1%} "
                f"with its RoI PE, {neu:.1%} when every RoI's PE is "
                "replaced by a fixed mid-height band (in-distribution, "
                "zero frequency-position information; localization rate "
                f"under the swap: {neu_loc:.1%}). Zeroing the PE outright "
                "collapses the head to zero detections — the FiLM "
                "modulation makes the head structurally dependent on a "
                "plausible PE, which is itself evidence the PE pathway is "
                "load-bearing. The budget-matched oracle adds the other "
                f"side: the absolute frequency band lifts the crop "
                f"classifier {plain:.1%} -> {fair:.1%} (+{fair - plain:.1%}). "
                "CONSEQUENCE for ATTRIBUTION_r4.json: its 98%-vs-27.6% "
                "comparison conflated information budgets; the corrected "
                "statement is that on this corpus — species at fixed "
                "center frequencies — the head's near-perfect species "
                "accuracy rests substantially on reading absolute "
                "position through the RoI PE, and the r4 'no species-head "
                "headroom' conclusion cannot be extended to real "
                "recordings where no such positional shortcut exists. "
                "Morphology-only evidence requires the randomize_fc "
                "corpus arm (scripts/train_morph.py)."
            ),
        }
    flush()
    print(json.dumps(result.get("attribution", result), indent=2)[:2000])
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
