"""Batch loading machinery.

Replaces torch DataLoader worker processes (reference: datasets/ACDC.py:127-129,
workers=4) with a thread-pool batch assembler + background prefetch: numpy
releases the GIL inside h5py/scipy, so threads overlap decode/augment with
device compute without process-spawn overhead, and the arrays land in
page-locked host memory ready for a single device_put per batch.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterator, Protocol, Sequence

import numpy as np


class SliceSource(Protocol):
    def __len__(self) -> int: ...

    def load(self, idx: int):
        """Return the raw (image, mask) numpy pair for one sample."""


class Subset:
    """Index-based view of a source (torch random_split equivalent,
    reference: datasets/ACDC.py:122-124)."""

    def __init__(self, source: SliceSource, indices: Sequence[int]):
        self.source = source
        self.indices = list(indices)

    def __len__(self) -> int:
        return len(self.indices)

    def load(self, idx: int):
        return self.source.load(self.indices[idx])


def random_split(source: SliceSource, first_len: int,
                 seed: int) -> tuple[Subset, Subset]:
    perm = np.random.default_rng(seed).permutation(len(source))
    return (Subset(source, perm[:first_len]),
            Subset(source, perm[first_len:]))


class BatchLoader:
    """Shuffled, drop-last batch iterator with threaded sample assembly.

    transform(image, mask) runs per sample in the worker pool; batches are
    stacked into contiguous float32/int32 arrays (NHWC images, HxW masks).
    """

    def __init__(self, source: SliceSource, batch_size: int,
                 transform: Callable | None = None, shuffle: bool = True,
                 drop_last: bool = True, seed: int = 0, num_threads: int = 8,
                 prefetch: int = 4):
        self.source = source
        self.batch_size = batch_size
        self.transform = transform
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.num_threads = num_threads
        self.prefetch = prefetch
        self._epoch = 0
        # deterministic transforms (e.g. ResizeOnly for the device-augment
        # path) are cached per index — one host resize per run, not per epoch
        self._xform_cache: dict[int, tuple] | None = (
            {} if getattr(transform, "deterministic", False) else None)
        # stateless per-sample rng keeps threaded assembly bit-deterministic
        import inspect

        self._transform_takes_rng = False
        if transform is not None:
            try:
                params = inspect.signature(transform.__call__).parameters
                self._transform_takes_rng = "rng" in params
            except (TypeError, ValueError):
                pass

    def __len__(self) -> int:
        n = len(self.source)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _load_one(self, idx: int, epoch: int = 0):
        if self._xform_cache is not None and idx in self._xform_cache:
            return self._xform_cache[idx]
        image, mask = self.source.load(idx)
        if self.transform is not None:
            if self._transform_takes_rng:
                rng = np.random.default_rng((self.seed, epoch, int(idx)))
                image, mask = self.transform(image, mask, rng=rng)
            else:
                image, mask = self.transform(image, mask)
        if self._xform_cache is not None:
            self._xform_cache[idx] = (image, mask)
        return image, mask

    def _batches_for_epoch(self, epoch: int) -> list[np.ndarray]:
        n = len(self.source)
        if self.shuffle:
            order = np.random.default_rng(self.seed + epoch).permutation(n)
        else:
            order = np.arange(n)
        end = (n // self.batch_size) * self.batch_size if self.drop_last else n
        return [order[i:i + self.batch_size]
                for i in range(0, end, self.batch_size)]

    def __iter__(self) -> Iterator[tuple[np.ndarray, np.ndarray]]:
        epoch = self._epoch
        self._epoch += 1
        batches = self._batches_for_epoch(epoch)
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            try:
                with ThreadPoolExecutor(self.num_threads) as pool:
                    for idxs in batches:
                        if stop.is_set():
                            return
                        samples = list(pool.map(
                            lambda i: self._load_one(i, epoch), idxs))
                        images = np.stack([s[0] for s in samples]).astype(np.float32)
                        masks = np.stack([s[1] for s in samples]).astype(np.int32)
                        q.put((images, masks))
                q.put(None)
            except BaseException as exc:  # surface worker errors to consumer
                q.put(exc)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
            # drain so a blocked producer can observe `stop`
            while not q.empty():
                q.get_nowait()

    def cycle(self) -> Iterator[tuple[np.ndarray, np.ndarray]]:
        """Eternal iteration (the reference's StopIteration-reinit labeled
        stream, e.g. 2017_03_NIPS_Mean-Teacher_ACDC.py:83-87)."""
        if len(self) == 0:
            # drop_last batching with fewer samples than one batch would
            # otherwise spin forever — fail loudly (e.g. a labeled split of
            # label_num * n_slices < batch_size)
            raise ValueError(
                f"loader over {len(self.source)} samples yields no batches "
                f"at batch_size={self.batch_size} (drop_last); decrease the "
                "batch size or enlarge the split")
        while True:
            yield from self


class VolumeLoader:
    """Batch-size-1 volume iterator for eval (reference test loaders,
    datasets/ACDC.py:129: DataLoader(test_dataset, batch_size=1))."""

    def __init__(self, source: SliceSource):
        self.source = source

    def __len__(self) -> int:
        return len(self.source)

    def __iter__(self):
        for i in range(len(self.source)):
            yield self.source.load(i)


def patients_to_slices(dataset: str, patients_num) -> int:
    """Patient-count → labeled-slice-count map (reference patients_to_slices,
    datasets/utils.py:11-21)."""
    if "ACDC" in dataset:
        ref = {"3": 68, "7": 136, "14": 256, "21": 396, "28": 512,
               "35": 664, "140": 1312}
    else:  # the reference falls through to the Prostate table
        ref = {"2": 27, "4": 53, "8": 120, "12": 179, "16": 256,
               "21": 312, "42": 623}
    return ref[str(patients_num)]


class TwoStreamBatchLoader:
    """Joint labeled+unlabeled batches from one source
    (reference TwoStreamBatchSampler, datasets/utils.py:23-52: an 'epoch' is
    one pass over the primary labeled indices while the secondary unlabeled
    indices cycle eternally; each yielded batch is the concatenation).

    Yields (images [P+S, H, W, C], masks [P+S, H, W], label_mask [P+S] bool)
    where label_mask marks the primary (labeled) rows.
    """

    def __init__(self, source: SliceSource, primary_indices, secondary_indices,
                 batch_size: int, secondary_batch_size: int,
                 transform: Callable | None = None, seed: int = 0,
                 num_threads: int = 8):
        self.primary = list(primary_indices)
        self.secondary = list(secondary_indices)
        self.primary_bs = batch_size - secondary_batch_size
        self.secondary_bs = secondary_batch_size
        assert len(self.primary) >= self.primary_bs > 0
        assert len(self.secondary) >= self.secondary_bs > 0
        self.source = source
        self.transform = transform
        self.seed = seed
        self.num_threads = num_threads
        self._epoch = 0

    def __len__(self) -> int:
        return len(self.primary) // self.primary_bs

    def __iter__(self):
        rng = np.random.default_rng(self.seed + self._epoch)
        self._epoch += 1
        primary = rng.permutation(self.primary)

        def eternal_secondary():
            while True:
                yield from rng.permutation(self.secondary)

        sec = eternal_secondary()
        with ThreadPoolExecutor(self.num_threads) as pool:
            for i in range(len(self)):
                p_idx = primary[i * self.primary_bs:(i + 1) * self.primary_bs]
                s_idx = [next(sec) for _ in range(self.secondary_bs)]
                idxs = list(p_idx) + list(s_idx)

                def load(j):
                    image, mask = self.source.load(int(j))
                    if self.transform is not None:
                        image, mask = self.transform(image, mask)
                    return image, mask

                samples = list(pool.map(load, idxs))
                images = np.stack([s[0] for s in samples]).astype(np.float32)
                masks = np.stack([s[1] for s in samples]).astype(np.int32)
                label_mask = np.zeros(len(idxs), bool)
                label_mask[:len(p_idx)] = True
                yield images, masks, label_mask
