"""Serve-daemon fault-injection soak (VERDICT r4 next #6).

Runs the watch-folder daemon (infer/serve.py) against a live feed for
--minutes while injecting the failure modes a monitoring station actually
produces, and scores recovery from the manifest + results log:

  feed      — fresh synthetic recordings (hard-corpus generator) dropped
              into the watch tree every few seconds, some nested in
              subdirectories, some as slow GROWING writes (tests the
              mtime-settle gate)
  faults    — truncated wav (cut mid-data), zero-byte .wav, garbage bytes
              with a .wav extension, a file deleted right after it lands
  crashes   — SIGKILL the daemon at random intervals (direct child PID —
              never pattern-matched), restart it, let the manifest resume
  wedges    — the watch dir flipped read-only for a spell (output .txt
              writes fail -> daemon dies -> restart must not lose or
              double-process files)

Pass criteria, checked at the end against the ground-truth feed log:
  * every VALID fed file has status "ok" in the manifest, a .txt next to
    it, and a results-JSONL row
  * every corrupt file is "decode_failed" (or absent if deleted), never
    "ok" with bogus detections
  * no file has two manifest "ok" rows with the same (size, mtime)
    [idempotence under crash-resume]
  * the daemon was killed >= --min_kills times and recovered every time

Writes SOAK_r5.json. Uses the session backend (chip when up).

Usage:
  python scripts/soak_serve.py --ckpt runs/nbm_hard/models/hard_neg_on_40k/ckpt_last \
      [--minutes 60] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import random
import signal
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _log(msg):
    print(f"[soak {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def _env():
    env = os.environ.copy()
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


class Feeder:
    """Writes recordings + faults into the watch tree; keeps a truth log."""

    def __init__(self, watch_dir: str, seed: int = 0):
        from birdsoundclassif_tpu.data.synthetic import species_bank

        self.dir = watch_dir
        self.rng = np.random.default_rng(seed)
        self.pyrng = random.Random(seed)
        with open(os.path.join(
                REPO, "birdsoundclassif_tpu", "assets",
                "bird_dict.json")) as f:
            names = list(json.load(f).keys())[1:40]
        self.bank = species_bank(names, self.rng)
        self.truth = []  # [{path, kind, bytes}]
        self.uid = 0

    def _wav_bytes(self, duration_s=8.0):
        import io
        import wave

        from birdsoundclassif_tpu.data.synthetic import synth_hard_recording

        spec = self.bank[int(self.rng.integers(len(self.bank)))]
        sig, _ = synth_hard_recording(spec, duration_s, 3, self.rng)
        buf = io.BytesIO()
        pcm = (np.clip(sig, -1, 1) * 32767).astype("<i2")
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(44_100)
            w.writeframes(pcm.tobytes())
        return buf.getvalue()

    def _path(self, kind):
        sub = self.pyrng.choice(["", "nested/deeper", "nested"])
        d = os.path.join(self.dir, sub)
        os.makedirs(d, exist_ok=True)
        self.uid += 1
        return os.path.join(d, f"{kind}_{self.uid:05d}.wav")

    def step(self):
        """One feed action; returns the truth record."""
        roll = self.pyrng.random()
        if roll < 0.55:
            kind = "valid"
        elif roll < 0.70:
            kind = "growing"
        elif roll < 0.78:
            kind = "truncated"
        elif roll < 0.86:
            kind = "garbage"
        elif roll < 0.93:
            kind = "empty"
        else:
            kind = "vanishing"
        path = self._path(kind)
        data = self._wav_bytes()
        if kind in ("valid", "vanishing"):
            with open(path, "wb") as f:
                f.write(data)
        elif kind == "growing":
            # slow incremental write: header+start now, rest over ~6 s in a
            # thread; the settle gate must hold processing off until done
            import threading

            def grow():
                with open(path, "wb") as f:
                    f.write(data[:20_000])
                    f.flush()
                    for i in range(20_000, len(data), len(data) // 4):
                        time.sleep(1.5)
                        f.write(data[i:i + len(data) // 4])
                        f.flush()

            threading.Thread(target=grow, daemon=True).start()
        elif kind == "truncated":
            with open(path, "wb") as f:
                f.write(data[:len(data) // 3])
        elif kind == "garbage":
            with open(path, "wb") as f:
                f.write(self.rng.bytes(30_000))
        elif kind == "empty":
            open(path, "wb").close()
        if kind == "vanishing":
            # delete shortly after it lands (station moved/renamed it)
            import threading

            def vanish():
                time.sleep(self.pyrng.uniform(0.2, 4.0))
                try:
                    os.remove(path)
                except OSError:
                    pass

            threading.Thread(target=vanish, daemon=True).start()
        rec = {"path": path, "kind": kind, "bytes": len(data)}
        self.truth.append(rec)
        return rec


def launch_daemon(ckpt, watch_dir, out_jsonl, manifest, batch, cpu):
    code = (
        "import jax; "
        f"jax.config.update('jax_compilation_cache_dir', "
        f"{os.path.join(REPO, '.jax_cache')!r}); "
        "jax.config.update('jax_persistent_cache_min_compile_time_secs', 1); "
        + ("jax.config.update('jax_platforms', 'cpu'); " if cpu else "")
        + "import sys; from birdsoundclassif_tpu.infer.serve import main; "
          "sys.exit(main(sys.argv[1:]))"
    )
    flags = ["--ckpt", ckpt, "--audio_dir", watch_dir,
             "--out", out_jsonl, "--manifest", manifest,
             "--batch", str(batch), "--min_score", "0.2",
             "--poll", "2", "--settle", "3"]
    log = open("/tmp/nbm_soak_daemon.log", "a")
    return subprocess.Popen([sys.executable, "-c", code, *flags],
                            env=_env(), cwd=REPO, stdout=log, stderr=log)


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True)
    p.add_argument("--minutes", type=float, default=60.0)
    p.add_argument("--work_dir", default="/tmp/nbm_soak")
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--feed_period", type=float, default=6.0)
    p.add_argument("--kill_period", type=float, default=180.0,
                   help="mean seconds between SIGKILLs of the daemon")
    p.add_argument("--readonly_period", type=float, default=600.0,
                   help="mean seconds between read-only-dir injections")
    p.add_argument("--min_kills", type=int, default=3)
    p.add_argument("--out", default=os.path.join(REPO, "SOAK_r5.json"))
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)

    work = os.path.abspath(args.work_dir)
    watch = os.path.join(work, "watch")
    os.makedirs(watch, exist_ok=True)
    out_jsonl = os.path.join(work, "results.jsonl")
    manifest = os.path.join(work, "manifest.jsonl")

    feeder = Feeder(watch)
    rng = random.Random(1)
    t_end = time.time() + args.minutes * 60
    daemon = launch_daemon(args.ckpt, watch, out_jsonl, manifest,
                           args.batch, args.cpu)
    _log(f"daemon pid {daemon.pid}")
    kills = restarts_after_crash = 0
    ro_windows = 0
    next_feed = time.time()
    next_kill = time.time() + rng.expovariate(1.0 / args.kill_period)
    next_ro = time.time() + rng.expovariate(1.0 / args.readonly_period)
    ro_until = 0.0
    events = []

    while time.time() < t_end:
        now = time.time()
        if now >= next_feed:
            try:
                rec = feeder.step()
                events.append({"t": round(now, 1), "event": "feed",
                               "kind": rec["kind"]})
            except OSError:
                # the read-only window blocks the feeder too (stations hit
                # the same wall); step() appends to truth only after a
                # successful write, so nothing to roll back
                events.append({"t": round(now, 1), "event": "feed_blocked"})
            next_feed = now + args.feed_period * rng.uniform(0.5, 1.5)
        if now >= next_kill:
            daemon.kill()  # SIGKILL by direct child handle
            daemon.wait()
            kills += 1
            events.append({"t": round(now, 1), "event": "sigkill"})
            _log(f"SIGKILL #{kills}; restarting")
            daemon = launch_daemon(args.ckpt, watch, out_jsonl, manifest,
                                   args.batch, args.cpu)
            next_kill = now + rng.expovariate(1.0 / args.kill_period)
        if now >= next_ro and ro_until == 0.0:
            os.chmod(watch, 0o555)
            ro_until = now + 25.0
            ro_windows += 1
            events.append({"t": round(now, 1), "event": "readonly_on"})
            _log("watch dir flipped read-only")
        if ro_until and now >= ro_until:
            os.chmod(watch, 0o755)
            events.append({"t": round(now, 1), "event": "readonly_off"})
            _log("watch dir writable again")
            ro_until = 0.0
            next_ro = now + rng.expovariate(1.0 / args.readonly_period)
        if daemon.poll() is not None:
            # daemon died on its own (e.g. .txt write into the read-only
            # dir) — restart; the manifest must carry the resume
            restarts_after_crash += 1
            events.append({"t": round(now, 1), "event": "crash_restart",
                           "rc": daemon.returncode})
            _log(f"daemon died rc={daemon.returncode}; restarting")
            daemon = launch_daemon(args.ckpt, watch, out_jsonl, manifest,
                                   args.batch, args.cpu)
        time.sleep(0.5)

    if ro_until:
        os.chmod(watch, 0o755)
    # drain: let the daemon finish the backlog (growing files settle etc.)
    _log("soak window over; draining backlog")
    deadline = time.time() + 300
    while time.time() < deadline:
        if daemon.poll() is not None:
            daemon = launch_daemon(args.ckpt, watch, out_jsonl, manifest,
                                   args.batch, args.cpu)
        rows = {}
        if os.path.isfile(manifest):
            with open(manifest) as f:
                for line in f:
                    try:
                        r = json.loads(line)
                        rows[r["file"]] = r
                    except json.JSONDecodeError:
                        continue
        pending = [t for t in feeder.truth
                   if t["kind"] != "vanishing"
                   and os.path.isfile(t["path"])
                   and t["path"] not in rows]
        if not pending:
            break
        time.sleep(5)
    daemon.terminate()
    daemon.wait()

    # ---- score ----
    man_rows = {}      # path -> last row
    ok_sigs = {}       # path -> set of (size, mtime) with ok rows
    with open(manifest) as f:
        for line in f:
            try:
                r = json.loads(line)
            except json.JSONDecodeError:
                continue
            man_rows[r["file"]] = r
            if r["status"] == "ok":
                ok_sigs.setdefault(r["file"], []).append(
                    (r["size"], r["mtime"]))
    results_files = set()
    if os.path.isfile(out_jsonl):
        with open(out_jsonl) as f:
            for line in f:
                try:
                    results_files.add(json.loads(line)["file"])
                except json.JSONDecodeError:
                    continue

    score = {"fed": len(feeder.truth), "kills": kills,
             "crash_restarts": restarts_after_crash,
             "readonly_windows": ro_windows,
             "by_kind": {}, "failures": []}
    for t in feeder.truth:
        kind, path = t["kind"], t["path"]
        k = score["by_kind"].setdefault(
            kind, {"n": 0, "ok": 0, "decode_failed": 0, "absent": 0,
                   "other": 0})
        k["n"] += 1
        row = man_rows.get(path)
        if row is None:
            k["absent"] += 1
            if kind not in ("vanishing",) and os.path.isfile(path):
                score["failures"].append({"path": path, "kind": kind,
                                          "why": "never processed"})
            continue
        if row["status"] == "ok":
            k["ok"] += 1
            if kind in ("truncated", "garbage", "empty"):
                # decoding a corrupt file as ok with detections is a fail;
                # ok with 0 detections on a truncated-but-parseable wav is
                # tolerable (partial PCM is real audio)
                if kind in ("garbage", "empty"):
                    score["failures"].append(
                        {"path": path, "kind": kind, "why": "scored ok"})
            if kind in ("valid", "growing"):
                if not os.path.isfile(path.replace(".wav", ".txt")):
                    score["failures"].append(
                        {"path": path, "kind": kind, "why": "no .txt"})
                if path not in results_files:
                    score["failures"].append(
                        {"path": path, "kind": kind, "why": "no results row"})
        elif row["status"] == "decode_failed":
            k["decode_failed"] += 1
            if kind in ("valid", "growing"):
                score["failures"].append(
                    {"path": path, "kind": kind, "why": "decode_failed"})
        else:
            k["other"] += 1
        sigs = ok_sigs.get(path, [])
        if len(sigs) != len(set(sigs)):
            score["failures"].append(
                {"path": path, "kind": kind,
                 "why": "duplicate ok rows for identical (size, mtime)"})

    score["pass"] = (not score["failures"] and kills >= args.min_kills)
    out = {
        "what": "serve-daemon fault-injection soak: live feed + truncated/"
                "garbage/empty/vanishing/growing files, SIGKILL crash-"
                "resume cycles, read-only watch-dir windows",
        "minutes": args.minutes,
        "ckpt": args.ckpt,
        "batch": args.batch,
        "device": "cpu" if args.cpu else "session backend (TPU when up)",
        "score": score,
        "events_tail": events[-60:],
    }
    tmp = args.out + ".tmp"
    with open(tmp, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    os.replace(tmp, args.out)
    print(json.dumps({k: v for k, v in score.items() if k != "failures"},
                     indent=2))
    print("FAILURES:", json.dumps(score["failures"][:20], indent=2))
    return 0 if score["pass"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
