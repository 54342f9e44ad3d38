"""Host-side batching and prefetch.

Replaces torch's DataLoader + SameTrCollate + cycle_data (reference
data/dataset.py:13-45,91-95,169-172) with a thread-pool pipeline tuned for an
accelerator-bound trainer: fixed-shape float32 batches are built and augmented
on host threads (PIL/cv2 release the GIL) and handed to JAX ahead of time, so
the TPU never waits on image IO. ``device_prefetch`` additionally keeps N
batches resident on device with the right sharding.
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from htr_vt_tpu.config import AugmentConfig, DataConfig
from htr_vt_tpu.data.augment import augment_batch
from htr_vt_tpu.data.image import from_uint8, load_line_image, to_uint8
from htr_vt_tpu.data.lists import LineIndex
from htr_vt_tpu.data.synthetic import SyntheticLineDataset
from htr_vt_tpu.text.converter import CTCLabelConverter


class FileLineDataset:
    """Disk-backed dataset over a LineIndex; images are decoded once and
    cached as the fixed 64x512 uint8 canvas (a full IAM split is ~200 MB)."""

    def __init__(self, index: LineIndex, img_size: Tuple[int, int] = (64, 512),
                 cache: bool = True):
        self.index = index
        self.height, self.width = img_size
        self.labels = index.labels
        self.alphabet = index.alphabet
        self._cache: Optional[List[np.ndarray]] = [None] * len(index) if cache else None

    def __len__(self) -> int:
        return len(self.index)

    def __getitem__(self, i: int) -> Tuple[np.ndarray, str]:
        if self._cache is not None and self._cache[i] is not None:
            return self._cache[i], self.labels[i]
        img = load_line_image(self.index.paths[i], self.width, self.height)
        u8 = to_uint8(img)
        if self._cache is not None:
            self._cache[i] = u8
        return u8, self.labels[i]


def build_dataset(cfg: DataConfig, split: str):
    """split: train | val | test. Returns a dataset with .alphabet/.labels."""
    if cfg.dataset == "SYNTH":
        size = cfg.synth_train_size if split == "train" else cfg.synth_eval_size
        seed = cfg.synth_seed + {"train": 0, "val": 1, "test": 2}[split]
        ds = SyntheticLineDataset(size, cfg.synth_alphabet, seed,
                                  cfg.img_size[0], cfg.img_size[1])
        return ds
    list_path = {"train": cfg.train_list, "val": cfg.val_list,
                 "test": cfg.test_list}[split]
    index = LineIndex.from_list_file(list_path, cfg.data_path,
                                     max_label_len=cfg.max_label_len)
    return FileLineDataset(index, cfg.img_size)


def make_converter(cfg: DataConfig, train_dataset) -> CTCLabelConverter:
    """Alphabet policy: data-derived by default; the fork's Vietnamese charset
    override when configured (reference model_v1/data/dataset.py:60-81)."""
    if cfg.vietnamese_charset:
        from htr_vt_tpu.text.converter import VIETNAMESE_CHARSET
        return CTCLabelConverter(list(VIETNAMESE_CHARSET))
    return CTCLabelConverter(train_dataset.alphabet)


def collate(images: List[np.ndarray], texts: List[str],
            converter: CTCLabelConverter, max_label_len: int,
            augment: Optional[AugmentConfig] = None,
            rng: Optional[np.random.Generator] = None,
            extras_fn=None) -> Dict[str, np.ndarray]:
    """uint8 images + strings -> fixed-shape numpy batch. ``extras_fn(texts)``
    may contribute additional arrays (e.g. SGM context windows)."""
    if augment is not None and augment.enable:
        images = augment_batch(images, augment, rng)
    batch_img = np.stack([from_uint8(im) for im in images])  # [B,H,W,1] f32
    labels, lengths = converter.encode_padded(texts, max_label_len)
    out = {"image": batch_img, "labels": labels, "label_lengths": lengths}
    if extras_fn is not None:
        out.update(extras_fn(texts))
    return out


def choose_max_label_len(labels: Sequence[str], num_frames: int = 128,
                         multiple: int = 8) -> int:
    """Static label width: the longest training label rounded up, capped at
    the CTC feasibility bound (labels longer than the frame count can never
    align)."""
    longest = max((len(l) for l in labels), default=1)
    padded = ((longest + multiple - 1) // multiple) * multiple
    return max(multiple, min(padded, num_frames))


class _EpochSampler:
    """Shared epoch-shuffled index stream (reference semantics: torch
    DataLoader(shuffle=True) cycled by cycle_data, data/dataset.py:169-172 —
    every sample appears exactly once per epoch, reshuffled each epoch).

    Fixed-shape batching requires full batches, so a batch may straddle the
    epoch boundary (the reference's last partial batch is instead smaller);
    the exactly-once-per-epoch guarantee is preserved.
    """

    def __init__(self, n: int, seed: int):
        self._n = n
        self._rng = np.random.default_rng(seed)
        self._perm = self._rng.permutation(n)
        self._pos = 0
        self._lock = threading.Lock()

    def next_batch(self, batch_size: int) -> np.ndarray:
        with self._lock:
            out = []
            got = 0
            while got < batch_size:
                take = min(batch_size - got, self._n - self._pos)
                out.append(self._perm[self._pos:self._pos + take])
                got += take
                self._pos += take
                if self._pos == self._n:
                    self._perm = self._rng.permutation(self._n)
                    self._pos = 0
            return np.concatenate(out)


class TrainLoader:
    """Infinite shuffled loader with background batch construction.

    sampling="epoch" (default) follows the reference's epoch-shuffled
    DataLoader; sampling="iid" draws each batch i.i.d. per worker (items may
    repeat across adjacent batches, no per-epoch guarantee — cheaper
    coordination, statistically equivalent for 100k-iteration training).
    """

    def __init__(self, dataset, converter: CTCLabelConverter, batch_size: int,
                 max_label_len: int, augment: Optional[AugmentConfig] = None,
                 seed: int = 0, num_threads: int = 4, prefetch: int = 4,
                 extras_fn=None, sampling: str = "epoch"):
        self.dataset = dataset
        self.converter = converter
        self.batch_size = batch_size
        self.max_label_len = max_label_len
        self.augment = augment
        self.extras_fn = extras_fn
        if sampling not in ("epoch", "iid"):
            raise ValueError(f"sampling must be 'epoch' or 'iid', got {sampling!r}")
        self._sampler = (_EpochSampler(len(dataset), seed)
                         if sampling == "epoch" else None)
        self._queue: "queue.Queue" = queue.Queue(maxsize=prefetch)
        self._stop = threading.Event()
        self._seed = seed
        self._threads = [
            threading.Thread(target=self._worker, args=(w, num_threads), daemon=True)
            for w in range(num_threads)]
        for t in self._threads:
            t.start()

    def _worker(self, worker_id: int, num_workers: int) -> None:
        rng = np.random.default_rng(self._seed * 1000 + worker_id)
        n = len(self.dataset)
        while not self._stop.is_set():
            if self._sampler is not None:
                idx = self._sampler.next_batch(self.batch_size)
            else:
                idx = rng.choice(n, size=self.batch_size, replace=n < self.batch_size)
            images, texts = [], []
            for i in idx:
                im, tx = self.dataset[int(i)]
                images.append(im)
                texts.append(tx)
            batch = collate(images, texts, self.converter, self.max_label_len,
                            self.augment, rng, self.extras_fn)
            while not self._stop.is_set():
                try:
                    self._queue.put(batch, timeout=0.5)
                    break
                except queue.Full:
                    continue

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        while True:
            yield self._queue.get()

    def __next__(self) -> Dict[str, np.ndarray]:
        return self._queue.get()

    def close(self) -> None:
        self._stop.set()


def eval_batches(dataset, converter: CTCLabelConverter, batch_size: int,
                 max_label_len: int,
                 extras_fn=None) -> Iterator[Tuple[Dict[str, np.ndarray], int, List[str]]]:
    """Sequential fixed-shape eval batches. The last batch is padded by
    repeating sample 0; yields (batch, num_valid, texts) so metrics skip the
    padding. Fixed shapes keep eval on the single compiled XLA program."""
    n = len(dataset)
    for start in range(0, n, batch_size):
        idx = list(range(start, min(start + batch_size, n)))
        valid = len(idx)
        idx += [0] * (batch_size - valid)
        images, texts = [], []
        for i in idx:
            im, tx = dataset[i]
            images.append(im)
            texts.append(tx)
        batch = collate(images, texts, converter, max_label_len,
                        extras_fn=extras_fn)
        yield batch, valid, texts[:valid]


def device_prefetch(it: Iterator[Dict[str, np.ndarray]], sharding,
                    depth: int = 2) -> Iterator[Dict]:
    """Move batches onto the mesh ahead of consumption (double-buffering the
    host->HBM copy behind the running step)."""
    import collections
    import jax
    buf = collections.deque()
    it = iter(it)
    try:
        while True:
            while len(buf) < depth:
                host = next(it)
                buf.append({k: jax.device_put(v, sharding) for k, v in host.items()})
            yield buf.popleft()
    except StopIteration:
        while buf:
            yield buf.popleft()
