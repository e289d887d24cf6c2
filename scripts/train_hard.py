"""Class-scale training demonstration (VERDICT r2 next #3).

Non-trivial 150-class run: every bird_dict species gets a morphology-coded
signature over heavily overlapping bands (data/synthetic.py species_bank),
plus rain/wind/insect interference beds, so the AP protocol does NOT
saturate. Runs the real driver (train/driver.py) for --steps on the session
backend (the TPU when available), twice:

  A. neg_on  — the reference hard-negative cadence (every neg_step_freq
     steps; reference train.py:340-343)
  B. neg_off — first_neg_step > max_steps disables the cadence

then measures the false-positive rate of both final checkpoints on
annotation-free interference-only recordings, and writes
TRAINING_E2E_r3.json with the mAP trajectories + the ablation.

Outage resilience: the axon TPU backend has a history of multi-hour
outages mid-round ("UNAVAILABLE: TPU backend setup/compile error", or a
PJRT-client-init hang no signal can preempt). Every device-touching phase
therefore runs in a SUBPROCESS — the orchestrating parent never initializes
a backend — and each phase is retried after re-probing the chip: the driver
auto-resumes from ckpt_last (saved every 10 epochs), so a crash mid-run
costs at most ~10 epochs of recompute.

Usage: python scripts/train_hard.py [--steps 10000] [--work_dir runs/nbm_hard]
       [--skip_ablation] [--batch_size 16]

Resume story (two independent layers, both exercised by
tests/test_train_driver.py::test_harness_arm_resume):
  - driver-level: driver.main auto-resumes from <arm>/ckpt_last, which
    --ckpt_every_steps writes every N steps (config.py ckpt_every_steps)
  - harness-level: run_driver reads ckpt_last/meta.json before each launch;
    a finished arm is skipped outright and every retry records the step it
    resumed from (runs[key].resume_points in the artifact)
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _log(msg):
    print(f"[train_hard {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def _env():
    env = os.environ.copy()
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


def _bootstrap_code(cpu: bool) -> str:
    """Python -c prelude for subprocesses: compile cache + optional CPU
    forcing (the axon plugin overrides JAX_PLATFORMS, so CPU must be forced
    through jax.config — see CLAUDE.md)."""
    cache = os.path.join(REPO, ".jax_cache")
    lines = [
        "import jax",
        f"jax.config.update('jax_compilation_cache_dir', {cache!r})",
        "jax.config.update('jax_persistent_cache_min_compile_time_secs', 1)",
    ]
    if cpu:
        lines.insert(1, "jax.config.update('jax_platforms', 'cpu')")
    return "; ".join(lines)


def probe_chip(cpu: bool, timeout: int = 300):
    """One matmul on the session backend in a subprocess (a wedged PJRT
    init cannot be interrupted in-process). Returns the device string, or
    None when the backend is down/hanging."""
    code = (_bootstrap_code(cpu) +
            "; x = jax.numpy.ones((128, 128))"
            "; print('PROBE_OK', float((x @ x).sum()), jax.devices()[0])")
    try:
        r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                           text=True, timeout=timeout, env=_env())
    except subprocess.TimeoutExpired:
        return None
    if r.returncode == 0 and "PROBE_OK" in r.stdout:
        return r.stdout.split("PROBE_OK", 1)[1].split(maxsplit=1)[1].strip()
    return None


def wait_for_chip(cpu: bool, poll_s: float = 45.0):
    while True:
        dev = probe_chip(cpu)
        if dev is not None:
            return dev
        _log("backend down; re-probing")
        time.sleep(poll_s)


WATCHDOG_RC = "watchdog"  # sentinel rc for a harness-initiated kill


def run_phase(cmd_tail: str, flags, cpu: bool, what: str, max_attempts: int = 12,
              max_hard_failures: int = 2, on_retry=None, watchdog=None):
    """Run `python -c '<bootstrap>; <cmd_tail>' -- *flags` until it exits 0,
    re-probing the chip between attempts. Returns (wall_s_in_phase, attempts).
    Child stdout/stderr are inherited (stream into the harness log).
    `flags` may be a callable(attempt)->list so retries can perturb flags.

    Outage vs deterministic failure: a failed attempt is only worth retrying
    when the backend itself is down (probe fails right after the exit). If
    the chip answers the probe immediately, the failure is the program's own
    (e.g. a compile-time HBM OOM) and will recur identically — those count
    against `max_hard_failures` so a 12x retry loop can't mask a real bug.

    `watchdog` (optional) is polled every ~15 s while the child runs; when
    it returns a truthy reason string the child is killed and the attempt
    retried without burning a hard-failure credit (used for the bistable-
    takeoff guard, docs/TRAINING.md 'Takeoff watchpoint')."""
    spent, attempt, hard = 0.0, 0, 0
    while True:
        attempt += 1
        cmd = [sys.executable, "-c", _bootstrap_code(cpu) + "; " + cmd_tail,
               *(flags(attempt) if callable(flags) else flags)]
        t0 = time.time()
        if watchdog is None:
            rc = subprocess.call(cmd, cwd=REPO, env=_env())
        else:
            proc = subprocess.Popen(cmd, cwd=REPO, env=_env())
            reason = None
            while True:
                rc = proc.poll()
                if rc is not None:
                    break
                reason = watchdog()
                if reason:
                    _log(f"{what}: watchdog kill — {reason}")
                    proc.kill()
                    proc.wait()
                    rc = WATCHDOG_RC
                    break
                time.sleep(15.0)
        spent += time.time() - t0
        if rc == 0:
            return spent, attempt
        _log(f"{what}: attempt {attempt} exited rc={rc}")
        if attempt >= max_attempts:
            raise RuntimeError(f"{what} failed after {max_attempts} attempts")
        if rc != WATCHDOG_RC and probe_chip(cpu) is not None:
            hard += 1
            _log(f"{what}: backend is up — deterministic failure "
                 f"{hard}/{max_hard_failures}")
            if hard >= max_hard_failures:
                raise RuntimeError(
                    f"{what}: {hard} deterministic failures (backend alive); "
                    "not an outage — aborting instead of retrying")
        elif rc != WATCHDOG_RC:
            wait_for_chip(cpu)
        if on_retry is not None:
            on_retry(rc)


def ckpt_steps(save_root, name) -> int:
    """Steps recorded in an arm's resumable ckpt_last (0 when absent).
    The driver auto-resumes from this checkpoint; the harness uses it for
    arm-level resume accounting (VERDICT r3 weak 3: interrupted arms must
    continue, not restart from scratch)."""
    meta = os.path.join(save_root, name, "ckpt_last", "meta.json")
    if not os.path.isfile(meta):
        return 0
    try:
        with open(meta) as f:
            return int(json.load(f).get("steps", 0))
    except (json.JSONDecodeError, ValueError):
        return 0


def takeoff_reason(metrics_path, start_step,
                   guard_step=900, threshold=0.58):
    """Stage-1 saddle detector (docs/TRAINING.md 'Takeoff watchpoint'):
    returns a kill reason when a FROM-SCRATCH run's latest flushed
    first_class_loss is still ~ln2 past guard_step — the bad basin never
    recovers, so waiting is pure chip waste. Resumed arms
    (start_step > 0) are past the saddle and are never guarded."""
    if start_step > 0 or not os.path.isfile(metrics_path):
        return None
    last = None
    with open(metrics_path) as f:
        for line in f:
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            if rec.get("tag") == "Training_Loss/first_class_loss":
                last = (rec["step"], rec["value"])
    if last is None:
        return None
    step, val = last
    if step >= guard_step and val >= threshold:
        return (f"first_class_loss {val:.3f} at step {step}: stage-1 stuck "
                "in the ln2 saddle (bistable takeoff, docs/TRAINING.md)")
    return None


def run_driver(data_dir, save_root, name, steps, batch_size, cpu, extra=()):
    """Returns (wall_s, attempts, resume_points, reseeds): resume_points[i]
    is the ckpt_last step count each attempt started from (0 = scratch).
    A takeoff-watchdog kill wipes the arm and re-rolls the seed (the bad
    basin is deterministic for a given executable+seed); reseeds counts
    those re-rolls."""
    import shutil

    start_step = ckpt_steps(save_root, name)
    if start_step >= steps:
        _log(f"driver[{name}]: ckpt_last already at step {start_step} >= "
             f"{steps} — arm complete, skipping")
        return 0.0, 0, [start_step], 0
    base_flags = [
        "--data_path", data_dir,
        "--save_dir", save_root,
        "--model_name", name,
        "--batch_size", str(batch_size),
        "--max_steps", str(steps),
        *extra,
    ]
    tail = ("import sys; from birdsoundclassif_tpu.train import driver; "
            "sys.exit(driver.main(sys.argv[1:]))")
    resume_points = [start_step]
    state = {"reseed": 0}
    metrics_path = os.path.join(save_root, name, "metrics.jsonl")

    def flags_for(attempt):
        fl = list(base_flags)
        if state["reseed"]:
            # new seed = new init + batch order + split: a fresh basin draw
            fl += ["--seed", str(42 + state["reseed"])]
        return fl

    def watchdog():
        return takeoff_reason(metrics_path, resume_points[-1])

    def on_retry(rc):
        if rc == WATCHDOG_RC:
            state["reseed"] += 1
            shutil.rmtree(os.path.join(save_root, name), ignore_errors=True)
            resume_points.append(0)
        else:
            resume_points.append(ckpt_steps(save_root, name))

    spent, attempt = run_phase(tail, flags_for, cpu, f"driver[{name}]",
                               on_retry=on_retry, watchdog=watchdog)
    return spent, attempt, resume_points, state["reseed"]


def fp_rate(params, cfg, neg_dir, min_score=0.02, bs=16):
    """Detections on annotation-free interference recordings. Returns
    counts at several score thresholds + the per-file top score."""
    import numpy as np

    from birdsoundclassif_tpu.audio.frontend import SpectrogramFrontend
    from birdsoundclassif_tpu.infer.pipeline import (
        packed_to_class_dict, stream_detections,
    )

    wavs = sorted(
        os.path.join(neg_dir, f) for f in os.listdir(neg_dir) if f.endswith(".wav")
    )
    thresholds = (0.1, 0.3, 0.5, 0.7)
    counts = {t: 0 for t in thresholds}
    top_scores = []
    seconds = [0.0]
    frontend = SpectrogramFrontend(cfg.frontend)
    hop, sr = cfg.frontend.hop_length, cfg.frontend.sample_rate

    def on_frontend(_src, fe):
        seconds[0] += fe.total_frames * hop / sr

    for _path, packed in stream_detections(
        params, cfg, frontend, wavs, min_score, bs,
        sample_rate=sr, on_frontend=on_frontend,
    ):
        class_bbox = packed_to_class_dict(np.asarray(packed), cfg)
        scores = [float(s) for entry in class_bbox.values()
                  for s in entry["scores"]]
        top_scores.append(max(scores) if scores else 0.0)
        for t in thresholds:
            counts[t] += sum(1 for s in scores if s >= t)
    hours = seconds[0] / 3600.0
    return {
        "n_files": len(wavs),
        "audio_hours": round(hours, 3),
        "fp_per_hour": {str(t): round(c / hours, 2) for t, c in counts.items()},
        "fp_total": {str(t): c for t, c in counts.items()},
        "mean_top_score": round(float(np.mean(top_scores)), 4),
    }


def parse_arms(spec: str, default_steps: int, default_lr_drop: int):
    """Parse --arms "key:steps[:lr_drop_k]" specs into run descriptors.

    The key decides the arm's semantics (prefix match):
      neg_off* — hard-negative cadence disabled (first_neg_step > max_steps)
      fixed*   — opt-in --fixed_neg_objective (intended background CE,
                 PARITY.md deviation 10 fix; config.py:137)
      anything else — the faithful reference cadence (train.py:340-343)
    Model dir name is "hard_" + key, so the legacy arm keys neg_on/neg_off
    keep their historical hard_neg_on/hard_neg_off checkpoint paths.
    """
    arms = []
    for part in spec.split(","):
        part = part.strip()
        if not part:
            continue
        bits = part.split(":")
        key = bits[0]
        steps = int(bits[1]) if len(bits) > 1 and bits[1] else default_steps
        lr_drop = int(bits[2]) if len(bits) > 2 and bits[2] else default_lr_drop
        if key.startswith("neg_off"):
            extra = ["--first_neg_step", str(10 * steps)]
        elif key.startswith("fixed"):
            extra = ["--fixed_neg_objective", "true"]
        else:
            extra = []
        arms.append({"key": key, "name": "hard_" + key, "steps": steps,
                     "lr_drop": lr_drop, "extra": extra})
    return arms


def mp3_twin_parity(params, cfg, test_dir, bs=16):
    """Detections on an mp3 twin of a real test recording vs its wav
    source, with TRAINED weights (VERDICT r3 missing #3: mp3 on the main
    path; the random-weight structural test is tests/test_mp3.py).
    Returns match stats, or None when no encoder is available."""
    import tempfile

    from birdsoundclassif_tpu.audio import mp3 as mp3mod
    from birdsoundclassif_tpu.audio.wavio import load_audio
    from birdsoundclassif_tpu.eval.ap import match_detection_sets
    from birdsoundclassif_tpu.infer.pipeline import run_detection

    if not (mp3mod.mpg123_available() and mp3mod.lame_available()):
        return None
    wavs = sorted(f for f in os.listdir(test_dir) if f.endswith(".wav"))
    if not wavs:
        return None
    wav_path = os.path.join(test_dir, wavs[0])
    sig = load_audio(wav_path)
    with tempfile.TemporaryDirectory() as d:
        mp3_path = os.path.join(d, "twin.mp3")
        mp3mod.encode_mp3(mp3_path, sig, cfg.frontend.sample_rate)
        out_wav = run_detection(params, cfg, wav_path, min_score=0.2, bs=bs)
        out_mp3 = run_detection(params, cfg, mp3_path, min_score=0.2, bs=bs)
    if out_wav is None or out_mp3 is None:
        return None
    stats = match_detection_sets(out_wav, out_mp3)
    stats["file"] = wavs[0]
    return stats


def eval_main(args) -> int:
    """--eval_only worker (runs in a subprocess): FP rate on the
    interference recordings + final test AP for every finished run."""
    from birdsoundclassif_tpu.eval.ap import evaluate_test_dir
    from birdsoundclassif_tpu.infer.pipeline import load_model

    work = os.path.abspath(args.work_dir)
    save_root = os.path.join(work, "models")
    neg_dir = os.path.join(work, "neg_eval")
    test_dir = os.path.join(work, "dataset", "test_files", "XC_annots")
    # resume-aware: keep results from a previous (killed/retried) eval pass
    out = {}
    if os.path.isfile(args.eval_out):
        try:
            with open(args.eval_out) as f:
                out = json.load(f)
        except json.JSONDecodeError:
            out = {}
    arms = parse_arms(args.arms, 0, 0) if args.arms else \
        [{"key": "neg_on", "name": "hard_neg_on"},
         {"key": "neg_off", "name": "hard_neg_off"}]
    for key, name in [(a["key"], a["name"]) for a in arms]:
        ckpt = os.path.join(save_root, name, "ckpt_last")
        if key in out or not os.path.isdir(ckpt):
            continue
        params, cfg = load_model(ckpt)
        out[key] = {
            "fp_on_interference": fp_rate(params, cfg, neg_dir,
                                          bs=args.batch_size),
            "final_test": evaluate_test_dir(params, cfg, test_dir,
                                            min_score=0.02,
                                            bs=args.batch_size),
            "mp3_twin_parity": mp3_twin_parity(params, cfg, test_dir,
                                               bs=args.batch_size),
        }
        _log(f"eval {key}: {out[key]}")
        tmp = args.eval_out + ".tmp"
        with open(tmp, "w") as f:
            json.dump(out, f)
        os.replace(tmp, args.eval_out)
    return 0


def trajectory(save_root, name):
    out = {}
    path = os.path.join(save_root, name, "metrics.jsonl")
    if not os.path.isfile(path):
        return out
    with open(path) as f:
        for line in f:
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:  # torn in-flight write
                continue
            if rec["tag"].startswith("Test_metrics/"):
                out.setdefault(rec["step"], {})[rec["tag"].split("/")[1]] = \
                    round(rec["value"], 4)
    return {str(k): v for k, v in sorted(out.items())}


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=10000)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--lr_drop", type=int, default=8,
                   help="LR /10 after this many thousand steps")
    p.add_argument("--work_dir", default=os.path.join(REPO, "runs", "nbm_hard"),
                   help="durable by default (under the repo, survives host "
                        "restarts — a /tmp default cost r3 a 40k run at "
                        "13.5k steps; VERDICT r3 weak 3)")
    p.add_argument("--n_species", type=int, default=150,
                   help="truncate the bird_dict species list (smoke tests)")
    p.add_argument("--test_every", type=int, default=3,
                   help="write a test recording for every k-th species "
                        "(bounds the every-500-step eval wall time)")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend")
    p.add_argument("--batch_transfer_dtype", default="bfloat16",
                   help="H2D dtype for the batch images; bfloat16 halves the "
                        "link bytes/step and is numerically identical (the "
                        "model computes in bfloat16 anyway — see "
                        "tests/test_train_driver.py::"
                        "test_bf16_batch_transfer_matches_f32)")
    p.add_argument("--out", default="TRAINING_E2E_r4.json")
    p.add_argument("--skip_ablation", action="store_true",
                   help="only run the neg_on model")
    p.add_argument("--arms", default=None,
                   help="comma-separated run specs 'key:steps[:lr_drop_k]', "
                        "e.g. 'fixed_neg:10000:8,neg_on_25k:25000:16'. "
                        "Overrides --steps/--skip_ablation arm selection; "
                        "results merge into --out without clobbering arms "
                        "recorded by earlier invocations")
    p.add_argument("--etl_only", action="store_true",
                   help="build the corpus + dataset, then exit (lets the "
                        "ETL run on the CPU backend while the chip is busy "
                        "or down; the training invocation then skips it)")
    p.add_argument("--driver_args", default="",
                   help="extra flags passed through to every driver run, "
                        "e.g. --driver_args '--grad_accum_steps 2'")
    p.add_argument("--eval_only", action="store_true",
                   help="(internal) subprocess worker: run the FP/AP evals "
                        "for finished checkpoints and write --eval_out")
    p.add_argument("--eval_out", default=None,
                   help="eval worker's result file (default: "
                        "<work_dir>/eval_results.json)")
    args = p.parse_args(argv)
    if args.eval_out is None:
        args.eval_out = os.path.join(os.path.abspath(args.work_dir),
                                     "eval_results.json")

    if args.eval_only:
        # worker mode: the parent already bootstrapped jax.config via -c;
        # when invoked by hand, bootstrap here
        import jax

        if args.cpu:
            jax.config.update("jax_platforms", "cpu")
        return eval_main(args)

    import numpy as np

    from birdsoundclassif_tpu.data.etl import _ASSET_BIRD_DICT, prepare_dataset
    from birdsoundclassif_tpu.data.synthetic import write_hard_corpus

    with open(_ASSET_BIRD_DICT) as f:
        names = list(json.load(f).keys())[:args.n_species]

    work = os.path.abspath(args.work_dir)
    rec_dir = os.path.join(work, "rec")            # train recordings
    hneg_rec = os.path.join(work, "rec_hardneg")   # interference for hard_neg aug
    neg_dir = os.path.join(work, "neg_eval")       # interference for FP eval
    data_dir = os.path.join(work, "dataset")
    test_dir = os.path.join(data_dir, "test_files", "XC_annots")

    t0 = time.time()
    if not os.path.isdir(os.path.join(data_dir, "positive_files")):
        # ETL is host-side numpy/PNG work but prepare_dataset jits the
        # STFT on the session backend; force CPU for this phase if asked.
        # The ETL runs in the PARENT process, which does not go through
        # _bootstrap_code — configure the compile cache here too, or the
        # first file pays the full remote STFT compile (minutes behind
        # the tunnel).
        import jax

        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(REPO, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
        if args.cpu:
            jax.config.update("jax_platforms", "cpu")
        rng = np.random.default_rng(42)
        counts = write_hard_corpus(rec_dir, test_dir, neg_dir, rng, names,
                                   files_per_species=2, n_negative_files=24,
                                   train_duration_s=15.0, calls_per_file=4,
                                   test_every=args.test_every)
        # a second, disjoint interference corpus becomes the hard_neg
        # augmentation pool (reference: image_dataset.py:64-101 mixes
        # hard-negative windows into the negative image)
        rng_h = np.random.default_rng(4242)
        write_hard_corpus(os.path.join(work, "_unused_rec"),
                          os.path.join(work, "_unused_test"), hneg_rec, rng_h,
                          names[:1], files_per_species=0, n_negative_files=30)
        print(f"corpus: {counts}", flush=True)
        prepare_dataset(rec_dir, data_dir)
        # interference windows -> dataset/hard_neg/<folder>/*.png
        hneg_out = os.path.join(work, "_hardneg_ds")
        prepare_dataset(hneg_rec, hneg_out, annotations=False)
        src = os.path.join(hneg_out, "negative_files")
        dst = os.path.join(data_dir, "hard_neg")
        if os.path.isdir(src) and not os.path.isdir(dst):
            os.rename(src, dst)
    etl_s = time.time() - t0
    n_pos = sum(len(files) for _, _, files in
                os.walk(os.path.join(data_dir, "positive_files")))
    n_hard = sum(len(files) for _, _, files in
                 os.walk(os.path.join(data_dir, "hard_neg")))
    print(f"ETL {etl_s:.0f}s: {n_pos} positive window files, "
          f"{n_hard} hard_neg windows", flush=True)
    if args.etl_only:
        return 0

    save_root = os.path.join(work, "models")
    import shlex

    # production memory configuration (docs/BENCH.md "Memory wall, part 2"):
    # device_augment + stage remat measured 1.53x the host-aug step
    # throughput on this corpus behind the tunnel (docs/BENCH.md r3:
    # banks are ~zero wire bytes; the remat recompute the banks need to
    # fit HBM costs far less than the transfers it removes). In bank mode
    # the microbatch must be <=8: the driver's full step (donated AdamW
    # state + both stage programs + 744 MB bank args) at a 16-image
    # microbatch needs 16.3-17.0 GB on the AOT compiler's accounting
    # (scripts/probe_step_memory.py) vs the v5e's 15.75 GB — measured as a
    # double deterministic ResourceExhausted in this harness; accum 2
    # fits AND runs faster (348 ms/step measured vs the 388 ms bench).
    # --driver_args can still override every knob.
    # microbatch 4 (accum >= 4) since rpn_head_f32 became the default: its
    # f32 activation casts OOM the old microbatch-8 budget (docs/BENCH.md
    # r5 A/B note; the original microbatch-8 accounting is in "Memory
    # wall, part 2")
    common = ["--batch_transfer_dtype", args.batch_transfer_dtype,
              "--device_augment", "true",
              "--remat_backbone", "true",
              "--remat_granularity", "stages",
              "--grad_accum_steps", str(max(4, args.batch_size // 4)),
              *shlex.split(args.driver_args)]
    if args.arms:
        arms = parse_arms(args.arms, args.steps, args.lr_drop)
    else:
        arms = parse_arms("neg_on" if args.skip_ablation else "neg_on,neg_off",
                          args.steps, args.lr_drop)

    _log("waiting for a live backend before the first driver launch")
    device = wait_for_chip(args.cpu)
    _log(f"backend up: {device}")

    result = {
        "what": "class-scale training demo: 150 bird_dict species with "
                "overlapping-band morphology-coded signatures + interference "
                "beds; real driver runs with the hard-negative cadence on vs "
                "off; FP rate measured on interference-only recordings",
        "device": device,
        "steps": args.steps,
        "batch_size": args.batch_size,
        "test_every": args.test_every,
        "lr_drop_k": args.lr_drop,
        "positive_window_files": n_pos,
        "hard_neg_window_files": n_hard,
        "etl_wall_s": round(etl_s, 1),
        "runs": {},
    }
    # merge mode: arms recorded by earlier invocations survive; per-arm
    # steps/lr_drop now live inside each run dict (top-level steps/lr_drop_k
    # describe the original 10k A/B for backward compatibility)
    if os.path.isfile(args.out):
        try:
            with open(args.out) as f:
                prior = json.load(f)
            for k in ("what", "device", "steps", "batch_size", "test_every",
                      "lr_drop_k", "positive_window_files",
                      "hard_neg_window_files", "etl_wall_s"):
                result[k] = prior.get(k, result[k])
            result["runs"] = prior.get("runs", {})
            # prior "complete" is NOT carried over: this invocation is
            # adding arms, so the artifact is in_progress again until the
            # final flush below
        except json.JSONDecodeError:
            pass
    runs = result["runs"]

    def flush_partial():
        # incremental dump so a killed session still leaves the artifact
        tmp = args.out + ".tmp"
        with open(tmp, "w") as f:
            json.dump(result, f, indent=2)
        os.replace(tmp, args.out)

    # sidecar: while the (blocking) driver trains, refresh the artifact's
    # trajectories from metrics.jsonl so a run killed at round end still
    # leaves its mAP curve behind
    import threading

    stop_evt = threading.Event()

    def _refresher():
        while not stop_evt.wait(45.0):
            for arm in arms:
                traj = trajectory(save_root, arm["name"])
                if traj:
                    runs.setdefault(arm["key"], {})["trajectory"] = traj
            if result.get("status") != "complete":
                result["status"] = "in_progress"
            flush_partial()

    threading.Thread(target=_refresher, daemon=True).start()

    for arm in arms:
        t, attempts, resume_points, reseeds = run_driver(
            data_dir, save_root, arm["name"], arm["steps"], args.batch_size,
            args.cpu, common + ["--lr_drop", str(arm["lr_drop"]), *arm["extra"]])
        # ACCUMULATE across invocations — an arm-skip relaunch must not
        # clobber earlier accounting (it zeroed r4's train_wall_s/attempts,
        # VERDICT r4 weak #5)
        prior = runs.get(arm["key"], {})
        runs[arm["key"]] = {"train_wall_s": round(
                                prior.get("train_wall_s", 0.0) + t, 1),
                            "attempts": prior.get("attempts", 0) + attempts,
                            # step each attempt resumed from (0 = scratch);
                            # nonzero entries prove harness-level resume
                            "resume_points": (prior.get("resume_points", [])
                                              + resume_points),
                            # arm wipes by the bistable-takeoff watchdog
                            "takeoff_reseeds": (prior.get("takeoff_reseeds", 0)
                                                + reseeds),
                            "steps": arm["steps"], "lr_drop_k": arm["lr_drop"],
                            "trajectory": trajectory(save_root, arm["name"])}
        print(f"{arm['key']} done in {t:.0f}s ({attempts} attempt(s))",
              flush=True)
        flush_partial()

    # FP ablation on the interference-only recordings (device-touching ->
    # retryable subprocess like the driver runs)
    eval_flags = ["--eval_only", "--work_dir", work,
                  "--batch_size", str(args.batch_size),
                  "--arms", ",".join(a["key"] for a in arms),
                  "--eval_out", args.eval_out]
    if args.cpu:
        eval_flags.append("--cpu")
    tail = ("import sys, runpy; sys.argv = ['train_hard.py'] + sys.argv[1:]; "
            f"runpy.run_path({os.path.abspath(__file__)!r}, "
            "run_name='__main__')")
    run_phase(tail, eval_flags, args.cpu, "eval", max_attempts=6)
    with open(args.eval_out) as f:
        for key, payload in json.load(f).items():
            runs.setdefault(key, {}).update(payload)
    flush_partial()

    stop_evt.set()
    result["status"] = "complete"
    flush_partial()
    print(json.dumps(result)[:2000])
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
