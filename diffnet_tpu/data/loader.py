"""Host-side dataset/loader utilities (replaces torch Dataset/DataLoader).

Datasets are plain-python objects with ``__len__`` and ``__getitem__``
returning ``(inputs, forcing)`` numpy arrays, channels-LAST
(``[H, W, C]`` / ``[D, H, W, C]``) — the TPU-native layout, vs the
reference's ``[C, H, W]`` torch convention
(reference: DiffNet/datasets/single_instances/rectangles.py:27-31).

`NumpyLoader` batches on host and (optionally) places batches with a
`jax.sharding.Sharding` so multi-chip data parallelism happens at transfer
time (the pjit-native version of Lightning DDP's per-process loaders,
IBN/poisson-3d/parametric/IBN_3D.py:193-199).
"""

from __future__ import annotations

from typing import Iterator

import jax
import numpy as np

__all__ = ["NumpyLoader", "InMemoryDataset"]


class InMemoryDataset:
    """Wrap pre-built arrays as a dataset: (inputs[N,...], forcing[N,...]).

    Exposes :meth:`batch` (native threaded row-gather) so `NumpyLoader`
    assembles whole batches with one OpenMP memcpy sweep per array
    instead of a per-item ``__getitem__`` loop + np.stack."""

    def __init__(self, inputs: np.ndarray, forcing: np.ndarray):
        assert len(inputs) == len(forcing)
        self.inputs = inputs
        self.forcing = forcing

    def __len__(self):
        return len(self.inputs)

    def __getitem__(self, idx):
        return self.inputs[idx], self.forcing[idx]

    def batch(self, idx):
        """Assemble a whole batch: equivalent to stacking ``self[i]`` for
        ``i in idx`` (the `NumpyLoader` fast-path contract: any dataset
        exposing ``batch`` must keep it consistent with ``__getitem__``)."""
        from ..utils.native import gather_batch

        idx = np.asarray(idx, np.int64)
        idx = np.where(idx < 0, idx + len(self), idx)
        return (gather_batch(np.asarray(self.inputs), idx),
                gather_batch(np.asarray(self.forcing), idx))


class NumpyLoader:
    """Minimal batching iterator.

    Parameters
    ----------
    dataset : object with __len__/__getitem__ -> tuple of numpy arrays
    batch_size : int
    shuffle : reshuffle each epoch
    drop_last : drop trailing partial batch (default True: static shapes keep
        XLA from recompiling)
    sharding : optional jax.sharding.Sharding applied via jax.device_put
    seed : shuffle seed
    """

    def __init__(self, dataset, batch_size: int = 1, shuffle: bool = False,
                 drop_last: bool = True, sharding=None, seed: int = 42,
                 prefetch: int = 0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.sharding = sharding
        self.prefetch = prefetch
        self._rng = np.random.default_rng(seed)

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator:
        if self.prefetch > 0:
            return self._prefetch_iter()
        return self._plain_iter()

    def _prefetch_iter(self):
        """Host-side background prefetch (the counterpart of torch
        DataLoader workers, reference base.py:18 n_workers).

        The producer forwards dataset exceptions to the consumer (a raise
        inside __getitem__ used to leave the consumer blocked forever) and
        watches a stop flag so an early consumer exit (fast_dev_run
        breaking after one batch) releases the thread instead of leaking
        it blocked on a full queue."""
        import queue
        import threading

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        END = object()
        stop = threading.Event()

        def put(item):
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                for b in self._plain_iter():
                    if not put(b):
                        return
            except BaseException as e:  # forwarded, re-raised by consumer
                put(e)
                return
            put(END)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                b = q.get()
                if b is END:
                    return
                if isinstance(b, BaseException):
                    raise b
                yield b
        finally:
            stop.set()

    def _plain_iter(self) -> Iterator:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            self._rng.shuffle(order)
        nb = len(self)
        batch_fn = getattr(self.dataset, "batch", None)
        if not callable(batch_fn):
            # only opt in on a callable `batch` (a dataset with an
            # unrelated attribute of that name keeps the per-item path)
            batch_fn = None
        for b in range(nb):
            idx = order[b * self.batch_size:(b + 1) * self.batch_size]
            if batch_fn is not None:
                # dataset-provided whole-batch assembly (native threaded
                # gather for InMemoryDataset — see its `batch` contract)
                batch = tuple(batch_fn(idx))
            else:
                samples = [self.dataset[int(i)] for i in idx]
                batch = tuple(
                    np.stack([s[k] for s in samples])
                    for k in range(len(samples[0]))
                )
            if self.sharding is not None:
                batch = jax.device_put(batch, self.sharding)
            yield batch
