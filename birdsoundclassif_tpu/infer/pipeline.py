"""End-to-end inference: wav file -> species-labeled boxes.

The TPU-native re-design of the reference driver (reference:
run_detection.py:28-122,163-249): the whole recording becomes one batched
window tensor on device; the model forward, the border-box suppression, the
window-offset shift, and the global cross-window NMS all run inside XLA.
The host only decodes audio, computes window indices, and formats the final
species dict.
"""

from __future__ import annotations

import json
import os
import warnings
from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..audio.frontend import SpectrogramFrontend
from ..audio.wavio import load_audio_raw
from ..config import NbmConfig
from ..models.detector import NbmModel
from ..models.rcnn import Detections
from ..ops.nms import greedy_nms_prefix
from ..utils.checkpoint import load_params

_ASSET_BIRD_DICT = os.path.join(os.path.dirname(__file__), "..", "assets", "bird_dict.json")


def load_bird_dict(path: Optional[str] = None) -> Tuple[Dict[str, int], Dict[int, str]]:
    """Species name <-> id maps; id 0 is re-added as 'Non bird sound'
    (reference: run_detection.py:70-73)."""
    with open(path or _ASSET_BIRD_DICT, "r") as f:
        birds = json.load(f)
    birds.update({"Non bird sound": 0})
    reverse = {i: name for name, i in birds.items()}
    return birds, reverse


def load_model(model_dir: str):
    """(params, cfg) from a checkpoint directory holding `args` (JSON config,
    reference-compatible) and params (npz / orbax / torch .pt via converter)
    (reference: load_model, run_detection.py:87-122)."""
    cfg = NbmConfig.load(os.path.join(model_dir, "args"))
    params = load_params(model_dir, cfg)
    from ..models.optimize import fold_inference

    return fold_inference(params, cfg), cfg


# ---------------------------------------------------------------------------
# batched model execution over windows
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("cfg", "nms_thresh", "min_score"))
def _forward_batch(params, windows, cfg, nms_thresh, min_score):
    return NbmModel.forward(params, windows[..., None], cfg, nms_thresh, min_score)


@jax.jit
def _gather_windows(spec_p: jnp.ndarray, cols: jnp.ndarray) -> jnp.ndarray:
    """(h, T_pad), (b, w) int32 -> (b, h, w) window batch."""
    return jnp.take(spec_p, cols, axis=1).transpose(1, 0, 2)


_FRAME_BUCKET = 8192  # spectrogram length granularity (bounds recompiles)


def detect_windows(
    params,
    cfg,
    windows: jnp.ndarray,  # (n, h, w)
    batch_size: int,
    min_score: float,
    nms_thresh: float = 0.3,
) -> Detections:
    """Run the detector over a materialized window batch in fixed-size
    sub-batches and concatenate the fixed-slot outputs."""
    n = windows.shape[0]
    n_pad = -(-n // batch_size) * batch_size
    if n_pad != n:
        windows = jnp.concatenate(
            [windows, jnp.zeros((n_pad - n,) + windows.shape[1:], windows.dtype)], axis=0
        )
    outs = [
        _forward_batch(params, windows[i:i + batch_size], cfg, nms_thresh, min_score)
        for i in range(0, n_pad, batch_size)
    ]
    return _concat_detections(outs, n)


def _concat_detections(outs, n) -> Detections:
    return Detections(
        boxes=jnp.concatenate([o.boxes for o in outs])[:n],
        scores=jnp.concatenate([o.scores for o in outs])[:n],
        classes=jnp.concatenate([o.classes for o in outs])[:n],
        valid=jnp.concatenate([o.valid for o in outs])[:n],
    )


def detect_spectrogram(
    params,
    cfg,
    spec: jnp.ndarray,        # (h, T) normalized spectrogram on device
    window_cols: np.ndarray,  # (n, w) int32 window column indices
    batch_size: int,
    min_score: float,
    nms_thresh: float = 0.3,
) -> Detections:
    """Streaming window detection: gathers each fixed-size window batch from
    the (bucket-padded) spectrogram on device and runs the detector —
    nothing file-length-shaped ever reaches the compiled model, so a
    directory sweep compiles the hot path exactly once."""
    t = spec.shape[1]
    t_pad = -(-t // _FRAME_BUCKET) * _FRAME_BUCKET
    spec_p = jnp.pad(spec, ((0, 0), (0, t_pad - t))) if t_pad != t else spec
    n = window_cols.shape[0]
    n_pad = -(-n // batch_size) * batch_size
    cols = np.zeros((n_pad, window_cols.shape[1]), np.int32)
    cols[:n] = window_cols
    outs = []
    for i in range(0, n_pad, batch_size):
        wins = _gather_windows(spec_p, jnp.asarray(cols[i:i + batch_size]))
        outs.append(_forward_batch(params, wins, cfg, nms_thresh, min_score))
    return _concat_detections(outs, n)


def _file_program_impl(params, spec_p, cols, n_real, spectrogram_length, cfg,
                       batch_size, nms_thresh, min_score, n_bucket,
                       data_sharding=None):
    """One XLA program for a whole file: window gather -> detector (scanned
    over fixed-size batches) -> cross-window merge. One dispatch and one
    packed readback per file instead of one round trip per window batch
    (round-1 bisection: ~29 ms dispatch+sync RTT each; reference hot loop:
    run_detection.py:49-67).

    data_sharding (a hashable NamedSharding over a 'data' mesh axis, or
    None) shards each scanned window batch over the mesh so multi-chip
    hosts split the detector FLOPs; GSPMD gathers the per-window outputs
    back for the global merge."""

    def body(carry, cols_chunk):
        wins = jnp.take(spec_p, cols_chunk, axis=1).transpose(1, 0, 2)
        if data_sharding is not None:
            wins = jax.lax.with_sharding_constraint(wins, data_sharding)
        det = NbmModel.forward(params, wins[..., None], cfg, nms_thresh, min_score)
        return carry, (det.boxes, det.scores, det.classes, det.valid)

    n_chunks = n_bucket // batch_size
    w = cols.shape[1]
    _, (b, s, c, v) = jax.lax.scan(
        body, 0, cols.reshape(n_chunks, batch_size, w)
    )
    r = s.shape[-1]
    fe = cfg.frontend
    return _merge_core(
        b.reshape(n_bucket, r, 4), s.reshape(n_bucket, r),
        c.reshape(n_bucket, r), v.reshape(n_bucket, r),
        n_real, spectrogram_length,
        fe.w_pix, fe.hop_spectro, cfg.num_classes, nms_thresh,
        cfg.merge_nms_max_boxes,
    )


# min_score is static here for cache-key simplicity on the live path; the
# AOT export (infer/export.py) traces the same impl with min_score as a
# runtime scalar so a serialized artifact stays serve-time tunable.
_file_program = partial(
    jax.jit,
    static_argnames=("cfg", "batch_size", "nms_thresh", "min_score",
                     "n_bucket", "data_sharding"),
)(_file_program_impl)


def detect_file_packed(
    params,
    cfg,
    fe_res,
    min_score: float,
    bs: int,
    nms_thresh: float = 0.3,
    data_sharding=None,
):
    """Dispatch the whole-file program; returns the packed (max_boxes, 7)
    merge output ON DEVICE so callers can overlap the readback of file i
    with the compute of file i+1. Columns are padded to a power-of-two
    batch-count bucket so a directory sweep compiles O(log) programs."""
    spec = fe_res.spec_padded
    t = spec.shape[1]
    t_pad = -(-t // _FRAME_BUCKET) * _FRAME_BUCKET
    spec_p = jnp.pad(spec, ((0, 0), (0, t_pad - t))) if t_pad != t else spec
    n = fe_res.n_windows
    n_chunks = max(1, -(-n // bs))
    n_chunks = 1 << (n_chunks - 1).bit_length()
    n_bucket = n_chunks * bs
    cols = np.zeros((n_bucket, fe_res.window_cols.shape[1]), np.int32)
    cols[:n] = fe_res.window_cols
    return _file_program(
        params, spec_p, jnp.asarray(cols), jnp.int32(n),
        jnp.float32(fe_res.total_frames), cfg, bs, nms_thresh, min_score,
        n_bucket, data_sharding=data_sharding,
    )


def packed_dropped_count(packed: np.ndarray) -> int:
    """Valid merge candidates silently lost to the merge_nms_max_boxes cap
    (0 when the file fit). Read from the trailing metadata row (keep == -1)
    _merge_core appends; 0 for legacy arrays without one."""
    if packed.shape[0] and packed[-1, 6] < -0.5:
        return int(packed[-1, 0])
    return 0


def packed_to_class_dict(packed: np.ndarray, cfg) -> Dict[str, Dict[str, np.ndarray]]:
    """Host-side: packed (N+1, 7) merge rows (last row = metadata) ->
    {class_id_str: {bbox_coord, scores}} over classes 1..num_classes
    (reference output schema). Warns when the merge cap dropped valid
    candidates (see packed_dropped_count)."""
    dropped = packed_dropped_count(packed)
    if dropped:
        warnings.warn(
            f"merge NMS capacity cap dropped {dropped} valid candidate boxes "
            f"(raise cfg.merge_nms_max_boxes or min_score)",
            RuntimeWarning,
            stacklevel=2,
        )
    boxes = packed[:, :4]
    scores = packed[:, 4]
    classes = packed[:, 5].astype(np.int32)
    keep = packed[:, 6] > 0.5
    out: Dict[str, Dict[str, np.ndarray]] = {}
    for j in range(1, cfg.num_classes + 1):
        m = keep & (classes == j)
        out[str(j)] = {
            "bbox_coord": boxes[m] if m.any() else np.zeros((0, 4), np.float32),
            "scores": scores[m] if m.any() else np.zeros((0,), np.float32),
        }
    return out


def packed_to_species_dict(packed, cfg, reverse):
    """Packed merge rows -> ({species_name: {bbox_coord, scores}}, dropped)
    — the reference's final output schema (run_detection.py:70-77: only
    classes with at least one surviving box appear, keyed by species name
    from the reversed bird_dict). `dropped` is the merge-capacity loss
    count (see packed_dropped_count). Shared by infer/sweep.py and
    infer/serve.py."""
    packed = np.asarray(packed)
    dropped = packed_dropped_count(packed)
    class_bbox = packed_to_class_dict(packed, cfg)
    output: Dict[str, Dict[str, list]] = {}
    for idx in range(1, cfg.num_classes + 1):
        entry = class_bbox[str(idx)]
        if len(entry["bbox_coord"]) > 0:
            output[reverse[idx]] = {
                "bbox_coord": entry["bbox_coord"].tolist(),
                "scores": entry["scores"].tolist(),
            }
    return output, dropped


# ---------------------------------------------------------------------------
# cross-window merge (reference: merge_images, run_detection.py:163-249)
# ---------------------------------------------------------------------------


def _merge_core(
    boxes, scores, classes, valid, n_real, spectrogram_length,
    w_pix: int, hop_spectro: int, num_classes: int, nms_thresh: float, max_boxes: int,
):
    # shapes are padded to a window-count bucket; n_real (traced) marks the
    # live rows so one compilation serves any file length in the bucket
    n, r = scores.shape
    win_idx = jnp.broadcast_to(jnp.arange(n)[:, None], (n, r))
    valid = valid & (win_idx < n_real)

    widths = boxes[..., 2] - boxes[..., 0]
    min_border = 0.9 * (w_pix - hop_spectro)
    at_right = boxes[..., 2] >= w_pix - 5
    at_left = boxes[..., 0] <= 4
    small = widths < min_border
    # reference checks i==0 first, so a single-window file uses the
    # right-border condition (run_detection.py:195-200)
    is_first = win_idx == 0
    is_last = win_idx == n_real - 1
    border = jnp.where(
        is_first, at_right & small,
        jnp.where(is_last, at_left & small, (at_left | at_right) & small),
    )
    valid = valid & ~border

    shift = (win_idx * hop_spectro).astype(boxes.dtype)
    boxes = boxes.at[..., 0].add(shift).at[..., 2].add(shift)
    valid = valid & (boxes[..., 2] < spectrogram_length)

    flat_boxes = boxes.reshape(n * r, 4)
    flat_scores = scores.reshape(n * r)
    flat_classes = classes.reshape(n * r)
    flat_valid = valid.reshape(n * r)
    flat_win = win_idx.reshape(n * r)

    # reference candidate order: class asc, window asc, score desc
    sort_class = jnp.where(flat_valid, flat_classes, num_classes + 1)
    order = jnp.lexsort((-flat_scores, flat_win, sort_class))
    n_valid_total = flat_valid.sum().astype(jnp.int32)
    if n * r > max_boxes:
        # capacity cap (documented deviation; candidates beyond the cap are
        # the lowest-ranked of the candidate ordering). n_dropped counts the
        # VALID candidates lost to the cap so production runs can detect it.
        order = order[:max_boxes]
        n_dropped = jnp.maximum(n_valid_total - max_boxes, 0)
    else:
        n_dropped = jnp.int32(0)
    ob = flat_boxes[order]
    ov = flat_valid[order]
    # the candidate ordering puts all valid entries first, so the greedy
    # scan runs only valid.sum() iterations (Pallas kernel on TPU)
    keep = greedy_nms_prefix(
        ob[None], ov.sum()[None].astype(jnp.int32), nms_thresh
    )[0]
    # pack into one array: a single host transfer instead of four (each
    # device->host sync costs a full link round trip)
    rows = jnp.concatenate(
        [
            ob,
            flat_scores[order][:, None],
            flat_classes[order][:, None].astype(jnp.float32),
            keep[:, None].astype(jnp.float32),
        ],
        axis=1,
    )
    # final metadata row: [n_dropped, 0, 0, 0, 0, 0, -1]. keep=-1 marks it
    # so packed_to_class_dict's keep>0.5 filter never sees it as a box.
    meta = jnp.zeros((1, 7), rows.dtype)
    meta = meta.at[0, 0].set(n_dropped.astype(rows.dtype)).at[0, 6].set(-1.0)
    return jnp.concatenate([rows, meta], axis=0)


_merge_on_device = partial(jax.jit, static_argnames=(
    "w_pix", "hop_spectro", "num_classes", "nms_thresh", "max_boxes"))(_merge_core)


def merge_detections(
    det: Detections,
    spectrogram_length: int,
    cfg,
    nms_thresh: float = 0.3,
    n_real: Optional[int] = None,
) -> Dict[str, Dict[str, np.ndarray]]:
    """-> {class_id_str: {"bbox_coord": (k,4), "scores": (k,)}} over classes
    1..num_classes, empty arrays when none (reference output schema).
    det may be padded beyond the real window count; pass n_real."""
    fe = cfg.frontend
    packed = np.asarray(
        _merge_on_device(
            det.boxes, det.scores, det.classes, det.valid,
            jnp.int32(n_real if n_real is not None else det.scores.shape[0]),
            jnp.float32(spectrogram_length),
            fe.w_pix, fe.hop_spectro, cfg.num_classes, nms_thresh,
            cfg.merge_nms_max_boxes,
        )
    )
    return packed_to_class_dict(packed, cfg)


class FilePrefetcher:
    """Overlaps the next file's host decode + H2D transfer + STFT dispatch
    with the current file's detector work (one worker thread; JAX dispatch
    is async so the device pipelines both). submit(path_or_samples) returns
    a future resolving to (samples_or_path, FrontendResult) — None on decode
    failure."""

    def __init__(self, frontend: SpectrogramFrontend, sample_rate: int = 44_100):
        import concurrent.futures as cf

        self.frontend = frontend
        self.sample_rate = sample_rate
        self._pool = cf.ThreadPoolExecutor(1)

    def _work(self, item):
        if isinstance(item, (str, os.PathLike)):
            samples = load_audio_raw(str(item), self.sample_rate)
        else:
            samples = item
        if samples is None or np.asarray(samples).size == 0:
            return None
        return self.frontend.process(samples)

    def submit(self, item):
        return self._pool.submit(self._work, item)

    def close(self):
        self._pool.shutdown(wait=True)


def stream_detections(
    params,
    cfg,
    frontend: SpectrogramFrontend,
    sources,
    min_score: float,
    batch: int,
    sample_rate: int = 44_100,
    data_sharding=None,
    on_frontend=None,
    detect_fn=None,
):
    """Three-way-overlapped per-file detection loop, shared by the
    production sweep (infer/sweep.py) and bench.py so both measure the
    same pipeline: file i+1's decode + H2D + STFT run in the prefetcher
    thread, file i's whole-file detector program is dispatched async, and
    file i-1's packed readback + host formatting happen in the caller —
    each yielded (source, packed) is deferred one file for exactly that
    overlap. Sources may be paths or PCM arrays (FilePrefetcher.submit);
    decode failures are skipped (reference behavior: run_detection returns
    None on empty audio). `on_frontend(source, fe_res)` fires before the
    detector dispatch (e.g. to accumulate audio seconds).

    detect_fn(fe_res) -> packed, when given, replaces the live
    detect_file_packed dispatch (params/cfg/min_score/batch/data_sharding
    are then unused) — this is how an AOT-exported program
    (infer/export.py ExportedDetector) plugs into the same overlap loop."""
    sources = list(sources)
    prefetcher = FilePrefetcher(frontend, sample_rate)
    try:
        futs = [prefetcher.submit(s) for s in sources[:1]]
        pending = None
        for i, src in enumerate(sources):
            fe_res = futs[i].result()
            futs[i] = None  # drop the ref: a FrontendResult pins ~12+ MB of
            # device spectrogram; retaining all of them leaks HBM over a
            # dataset-scale sweep
            if i + 1 < len(sources):
                futs.append(prefetcher.submit(sources[i + 1]))
            if fe_res is None:
                continue
            if on_frontend is not None:
                on_frontend(src, fe_res)
            if detect_fn is not None:
                packed = detect_fn(fe_res)
            else:
                packed = detect_file_packed(
                    params, cfg, fe_res, min_score, batch,
                    data_sharding=data_sharding,
                )
            if pending is not None:
                yield pending
            pending = (src, packed)
        if pending is not None:
            yield pending
    finally:
        prefetcher.close()


# ---------------------------------------------------------------------------
# whole-file driver (reference: run_detection, run_detection.py:28-84)
# ---------------------------------------------------------------------------


def detect_samples(
    params,
    cfg,
    samples: np.ndarray,
    min_score: float,
    bs: int,
    frontend: Optional[SpectrogramFrontend] = None,
) -> Dict[str, Dict[str, np.ndarray]]:
    """PCM samples (int16 or float32) -> per-class merged detections."""
    frontend = frontend or SpectrogramFrontend(cfg.frontend)
    fe_res = frontend.process(samples)
    return detect_from_frontend(params, cfg, fe_res, min_score, bs)


def detect_from_frontend(
    params,
    cfg,
    fe_res,
    min_score: float,
    bs: int,
    whole_file: bool = True,
) -> Dict[str, Dict[str, np.ndarray]]:
    if whole_file:
        packed = detect_file_packed(params, cfg, fe_res, min_score, bs)
        return packed_to_class_dict(np.asarray(packed), cfg)
    det = detect_spectrogram(
        params, cfg, fe_res.spec_padded, fe_res.window_cols, bs, min_score
    )
    # pad detections to a power-of-two window bucket so the merge NMS
    # compiles O(log) times across a sweep, not once per file length
    n = fe_res.n_windows
    n_bucket = 1 << max(4, (n - 1).bit_length())
    if n_bucket != n:
        pad = n_bucket - n
        det = Detections(
            boxes=jnp.pad(det.boxes, ((0, pad), (0, 0), (0, 0))),
            scores=jnp.pad(det.scores, ((0, pad), (0, 0))),
            classes=jnp.pad(det.classes, ((0, pad), (0, 0))),
            valid=jnp.pad(det.valid, ((0, pad), (0, 0))),
        )
    return merge_detections(det, fe_res.total_frames, cfg, n_real=n)


def run_detection(
    params,
    cfg,
    wav_path: str,
    bird_dicts_path: Optional[str] = None,
    min_score: float = 0.5,
    bs: int = 10,
    frontend: Optional[SpectrogramFrontend] = None,
    visualise_outputs: bool = False,
    visualise_dir: Optional[str] = None,
) -> Optional[Dict[str, Dict[str, list]]]:
    """-> {species_name: {"bbox_coord": [[x1,y1,x2,y2], ...], "scores": [...]}}
    for species with at least one detection; None if the audio fails to load.
    visualise_outputs saves per-window spectrogram plots with detection boxes
    (reference: run_detection.py:80-82, visualise_model_out :252-316)."""
    samples = load_audio_raw(wav_path, cfg.frontend.sample_rate)
    if samples is None or samples.size == 0:
        return None
    frontend = frontend or SpectrogramFrontend(cfg.frontend)
    fe_res = frontend.process(samples)
    class_bbox = detect_from_frontend(params, cfg, fe_res, min_score, bs)
    _, reverse = load_bird_dict(bird_dicts_path)
    output = {}
    for idx in range(1, cfg.num_classes + 1):
        entry = class_bbox[str(idx)]
        if len(entry["bbox_coord"]) > 0:
            output[reverse[idx]] = {
                "bbox_coord": entry["bbox_coord"].tolist(),
                "scores": entry["scores"].tolist(),
            }
    if visualise_outputs:
        from ..utils.visualize import visualise_model_out

        out_dir = visualise_dir or (os.path.splitext(wav_path)[0] + "_plots")
        visualise_model_out(
            output, fe_res.spec, cfg.frontend.w_pix, cfg.frontend.hop_spectro,
            out_dir=out_dir,
        )
    return output
