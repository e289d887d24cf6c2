"""Training image dataset + augmentations + fixed-shape batch collation.

Equivalent of the reference's Img_dataset (reference:
nbm_datasets/image_dataset.py:13-116): positive PNG windows with box/id
annotations, a random negative window per item, and the augmentation suite
(additive noise scaled by image std, random gain, hard-negative mixing,
random Butterworth low-pass applied as a log-space mask).

TPU-side difference: batches are collated to fixed shapes — GT boxes padded
to max_gt_boxes with validity masks — instead of the reference's ragged
concat + lengths list (nets_utils.py:159-166).
"""

from __future__ import annotations

import glob
import os
from typing import Dict, List, Optional, Tuple

import numpy as np
import pandas as pd


def _butterworth_lowpass_mask(cutting_freq: float, h_pix: int = 375,
                              freq_accuracy: float = 33.3) -> np.ndarray:
    """Log-space gain column of a 1st-order analog Butterworth low-pass
    evaluated at the spectrogram row frequencies (reference:
    image_dataset.py:86-92)."""
    from scipy import signal

    b, a = signal.butter(1, 2 * np.pi * cutting_freq, "low", analog=True)
    _, h = signal.freqs(b, a, worN=2 * np.pi * (500 + np.arange(h_pix) * freq_accuracy))
    return 0.5 * np.log10(np.clip(np.abs(h), 1e-9, None)).astype(np.float32)


class ImgDataset:
    """Index-addressable dataset over positive windows; thread-safe reads.

    Two item formats:
    - host mode (default): (img f32, neg_img f32, boxes, ids) with the
      augmentations applied on the host (reference semantics,
      image_dataset.py:37-101).
    - device mode (`device_mode=True`, set by device_aug.build_banks): a
      dict of uint8 window bytes OR bank indices plus the drawn
      augmentation *parameters*; the pixel math runs inside the traced
      train step (data/device_aug.py). 2-4x fewer wire bytes per step.
    """

    def __init__(self, dataset_path: str, transform: bool = False,
                 rng: Optional[np.random.Generator] = None):
        self.ds_p = dataset_path
        self.transform = transform
        self.rng = rng or np.random.default_rng()
        self.device_mode = False
        self.bank_positives = False
        self.bank_negatives = False

        def collect(sub):
            files = []
            root = os.path.join(dataset_path, sub)
            if not os.path.isdir(root):
                return files
            for f in os.listdir(root):
                files.extend(
                    os.path.basename(p)
                    for p in glob.glob(os.path.join(root, f) + "/*.png")
                )
            return files

        self.positive_files = collect("positive_files")
        self.negative_files = collect("negative_files")
        self.hard_negative_files = collect("hard_neg")
        self._annot_cache: Dict[str, pd.DataFrame] = {}

    def __len__(self) -> int:
        return len(self.positive_files)

    def load_png_u8(self, sub: str, name: str) -> np.ndarray:
        """Raw uint8 window bytes (what the PNG stores; the wire format of
        device-augment mode)."""
        import imageio.v2 as imageio

        splits = name.replace(".png", "").split("__")
        folder = "__".join(splits[:-1])
        img = imageio.imread(os.path.join(self.ds_p, sub, folder, name))
        return np.asarray(img, np.uint8)

    def _load_png(self, sub: str, name: str) -> np.ndarray:
        return self.load_png_u8(sub, name).astype(np.float32) / 255.0

    def _annots(self, folder: str) -> pd.DataFrame:
        if folder not in self._annot_cache:
            df = pd.read_csv(
                os.path.join(self.ds_p, "positive_files", folder, "annotations.csv"),
                sep=";",
            )
            df["coord"] = df["coord"].apply(eval)
            df["bird_id"] = df["bird_id"].apply(eval)
            self._annot_cache[folder] = df
        return self._annot_cache[folder]

    def _boxes_for(self, idx: int):
        name = self.positive_files[idx]
        splits = name.replace(".png", "").split("__")
        folder, fileidx = "__".join(splits[:-1]), int(splits[-1])
        annot = self._annots(folder)
        row = annot.loc[annot["index"] == fileidx, ["coord", "bird_id"]].values[0]
        boxes, ids = np.asarray(row[0], np.float32), np.asarray(row[1], np.int64)
        # drop class-0 (non-bird) boxes (reference: image_dataset.py:53-55)
        keep = ids != 0
        return boxes.reshape(-1, 4)[keep], ids[keep]

    def _device_item(self, idx: int):
        """Device-augment item: uint8 bytes or bank indices + aug params.
        The parameter draws mirror the host transform's gates (flips[0]
        gates hard mixing, flips[1] the Butterworth mask); the pixel math
        runs on device (data/device_aug.py.assemble_image)."""
        rng = self.rng
        boxes, ids = self._boxes_for(idx)
        item = {}
        if self.bank_positives:
            item["pos_idx"] = np.int32(idx)
        else:
            item["pos_u8"] = self.load_png_u8(
                "positive_files", self.positive_files[idx])
        neg_j = int(rng.integers(len(self.negative_files)))
        if self.bank_negatives:
            item["neg_idx"] = np.int32(neg_j)
        else:
            item["neg_u8"] = self.load_png_u8(
                "negative_files", self.negative_files[neg_j])

        t = self.transform
        item["aug_use_noise"] = np.bool_(t)
        item["aug_seed"] = np.uint32(rng.integers(1 << 31)) if t else np.uint32(0)
        item["aug_gain"] = np.float32(rng.uniform(-0.1, 0.35)) if t else np.float32(0)
        flips = rng.integers(0, 2, size=4) if t else np.zeros(4, np.int64)
        use_hard = bool(flips[0] == 1 and self.hard_negative_files)
        item["aug_use_hard"] = np.bool_(use_hard)
        item["hard_idx"] = np.int32(
            rng.integers(len(self.hard_negative_files)) if use_hard else 0)
        item["aug_hard_coef"] = np.float32(
            rng.uniform(0.1, 0.4) if use_hard else 0)
        item["aug_neg_coef"] = np.float32(
            rng.uniform(0.5, 0.99) if use_hard else 0)
        item["aug_use_butter"] = np.bool_(flips[1] == 1)
        item["aug_cutoff"] = np.float32(
            rng.integers(500, 10000) if flips[1] == 1 else 1000.0)
        return item, boxes, ids

    def __getitem__(self, idx: int):
        """-> (img (h, w), neg_img (h, w), boxes (k, 4), bird_ids (k,)),
        or (item dict, boxes, ids) in device-augment mode."""
        if self.device_mode:
            return self._device_item(idx)
        rng = self.rng
        img = self._load_png("positive_files", self.positive_files[idx])
        boxes, ids = self._boxes_for(idx)

        negp = rng.choice(self.negative_files)
        neg_img = self._load_png("negative_files", negp)

        if self.transform:
            noise = np.clip(
                rng.standard_normal(img.shape).astype(np.float32) * (img.std() / 2),
                -0.5, 0.5,
            )
            img = img + rng.uniform(-0.1, 0.35)
            img = img + noise
            flips = rng.integers(0, 2, size=4)
            if flips[0] == 1 and self.hard_negative_files:
                hardp = rng.choice(self.hard_negative_files)
                hard = self._load_png("hard_neg", hardp)
                coef = rng.uniform(0.1, 0.4)
                img = (img + coef * hard) / (1 + coef)
                neg_coef = rng.uniform(0.5, 0.99)
                neg_img = (neg_img + neg_coef * hard) / (1 + neg_coef)
            if flips[1] == 1:
                cutting_freq = rng.integers(500, 10000)
                col = _butterworth_lowpass_mask(cutting_freq, img.shape[0])
                img = img + col[:, None]
        return img.astype(np.float32), neg_img.astype(np.float32), boxes, ids


def collate_batch(items: List, max_gt: int) -> Dict[str, np.ndarray]:
    """Fixed-shape batch: pad GT to max_gt with validity masks. Handles
    both host-mode tuples and device-augment dict items."""
    b = len(items)
    if isinstance(items[0][0], dict):
        batch = {k: np.stack([it[0][k] for it in items])
                 for k in items[0][0]}
        gt = [(it[1], it[2]) for it in items]
    else:
        batch = {
            "img": np.stack([it[0] for it in items]),
            "neg_img": np.stack([it[1] for it in items]),
        }
        gt = [(it[2], it[3]) for it in items]
    batch["gt_boxes"] = np.zeros((b, max_gt, 4), np.float32)
    batch["gt_valid"] = np.zeros((b, max_gt), bool)
    batch["gt_labels"] = np.zeros((b, max_gt), np.int32)
    for i, (boxes, ids) in enumerate(gt):
        k = min(len(boxes), max_gt)
        batch["gt_boxes"][i, :k] = boxes[:k]
        batch["gt_valid"][i, :k] = True
        batch["gt_labels"][i, :k] = ids[:k]
    return batch


class BatchLoader:
    """Shuffling host loader with thread-pool item fetch and pipelined batch
    prefetch (the reference uses 4 DataLoader worker processes,
    train.py:319; threads suffice here since PNG decode releases the GIL)."""

    def __init__(self, dataset: ImgDataset, indices: np.ndarray, batch_size: int,
                 max_gt: int, rng: Optional[np.random.Generator] = None,
                 drop_last: bool = True, num_workers: int = 4,
                 prefetch_batches: int = 2):
        self.dataset = dataset
        self.indices = np.asarray(indices)
        self.batch_size = batch_size
        self.max_gt = max_gt
        self.rng = rng or np.random.default_rng()
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.prefetch_batches = max(0, prefetch_batches)

    def _batches(self):
        order = self.rng.permutation(self.indices)
        n = len(order)
        stop = n - (n % self.batch_size) if self.drop_last else n
        for i in range(0, stop, self.batch_size):
            yield order[i:i + self.batch_size]

    def __iter__(self):
        import concurrent.futures as cf
        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch_batches + 1)
        stop = object()

        def producer():
            try:
                with cf.ThreadPoolExecutor(self.num_workers) as pool:
                    for idx_batch in self._batches():
                        items = list(
                            pool.map(self.dataset.__getitem__, map(int, idx_batch))
                        )
                        q.put(collate_batch(items, self.max_gt))
            finally:
                q.put(stop)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            batch = q.get()
            if batch is stop:
                break
            yield batch

    def __len__(self):
        n = len(self.indices)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)
