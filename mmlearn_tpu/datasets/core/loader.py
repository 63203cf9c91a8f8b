"""Host-side data loader with background prefetch.

Replaces ``torch.utils.data.DataLoader`` in the reference stack. Design goals
for TPU training:

- **fixed batch shapes**: ``drop_last=True`` by default for training; for
  evaluation, partial batches are padded to ``batch_size`` and carry a
  ``batch_validity`` mask so jitted eval steps never recompile
  (SURVEY.md §7, hard part #1);
- **overlap**: a background thread pool maps examples and a bounded queue
  prefetches collated numpy batches while the device computes;
- host-only: device placement/sharding happens in the trainer
  (``jax.device_put`` with a ``NamedSharding`` over the ``data`` axis).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable, Iterator, Optional

import numpy as np

from mmlearn_tpu.datasets.core.data_collator import DefaultDataCollator
from mmlearn_tpu.datasets.core.samplers import RandomSampler, SequentialSampler

_BATCH_VALIDITY_KEY = "batch_validity"


def _propagate_set_epoch(dataset: Any, epoch: int) -> None:
    """Recursively call ``set_epoch`` on a dataset and its sub-datasets."""
    if dataset is None:
        return
    if hasattr(dataset, "set_epoch"):
        dataset.set_epoch(epoch)
        return  # container that owns set_epoch handles its own children
    for sub in getattr(dataset, "datasets", []):
        _propagate_set_epoch(sub, epoch)


class DataLoader:
    """Iterate a map-style dataset in collated, fixed-size numpy batches."""

    def __init__(
        self,
        dataset: Any = None,
        batch_size: int = 1,
        shuffle: bool = False,
        sampler: Optional[Any] = None,
        drop_last: bool = False,
        collate_fn: Optional[Callable] = None,
        num_workers: int = 0,
        prefetch_factor: int = 2,
        pad_partial_batches: bool = False,
        seed: int = 0,
    ) -> None:
        self.dataset = dataset
        self.batch_size = int(batch_size)
        self.drop_last = drop_last
        self.pad_partial_batches = pad_partial_batches
        self.collate_fn = collate_fn or DefaultDataCollator()
        self.num_workers = int(num_workers)
        self.prefetch_factor = max(1, int(prefetch_factor))
        self._pool: Optional[ThreadPoolExecutor] = None
        if sampler is not None:
            self.sampler = sampler
        elif shuffle:
            self.sampler = RandomSampler(dataset, seed=seed)
        else:
            self.sampler = SequentialSampler(dataset)

    def set_epoch(self, epoch: int) -> None:
        if hasattr(self.sampler, "set_epoch"):
            self.sampler.set_epoch(epoch)
        # streaming/iterable sub-datasets reshuffle their shard order per
        # epoch (the ratio sampler propagates this itself; plain samplers
        # don't, so cover the direct path here) — including a streaming
        # dataset passed directly as the loader's dataset, and nested
        # CombinedDatasets
        _propagate_set_epoch(self.dataset, epoch)

    def __len__(self) -> int:
        n = len(self.sampler)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _index_batches(self, skip: int = 0) -> Iterator[list[int]]:
        """Batch index lists; the first ``skip`` batches are DRAWN from the
        sampler (preserving its RNG order) but not yielded."""
        produced = 0
        batch: list[int] = []
        for idx in self.sampler:
            batch.append(idx)
            if len(batch) == self.batch_size:
                if produced >= skip:
                    yield batch
                produced += 1
                batch = []
        if batch and not self.drop_last and produced >= skip:
            yield batch

    def _fetch(self, indices: list[int]) -> dict[str, Any]:
        if self.num_workers > 0 and len(indices) > 1:
            if self._pool is None:
                # one pool per loader, reused across batches (a fresh pool
                # per batch paid thread spawn/join on the critical path)
                self._pool = ThreadPoolExecutor(max_workers=self.num_workers)
            examples = list(self._pool.map(self.dataset.__getitem__, indices))
        else:
            examples = [self.dataset[i] for i in indices]
        n_real = len(examples)
        if self.pad_partial_batches and n_real < self.batch_size:
            examples = examples + [examples[-1]] * (self.batch_size - n_real)
        batch = self.collate_fn(examples)
        if self.pad_partial_batches:
            validity = np.zeros(len(examples), dtype=bool)
            validity[:n_real] = True
            batch[_BATCH_VALIDITY_KEY] = validity
        return batch

    def _iter_sync(self, skip: int = 0) -> Iterator[dict[str, Any]]:
        for indices in self._index_batches(skip):
            yield self._fetch(indices)

    def _iter_prefetch(self, skip: int = 0) -> Iterator[dict[str, Any]]:
        q: queue.Queue = queue.Queue(maxsize=self.prefetch_factor)
        sentinel = object()
        error_box: list[BaseException] = []
        stop = threading.Event()

        def producer() -> None:
            try:
                for indices in self._index_batches(skip):
                    if stop.is_set():
                        return
                    batch = self._fetch(indices)
                    # bounded put so an abandoned consumer (trainer break at
                    # limit_*_batches/max_steps) cannot block this thread on
                    # a full queue forever — re-check the stop flag instead
                    while not stop.is_set():
                        try:
                            q.put(batch, timeout=0.1)
                            break
                        except queue.Full:
                            continue
            except BaseException as err:  # propagate into consumer
                error_box.append(err)
            finally:
                # the sentinel must be DELIVERED whenever a consumer is
                # still reading (a dropped sentinel deadlocks its q.get());
                # only an abandoned consumer (stop set) may skip it
                while not stop.is_set():
                    try:
                        q.put(sentinel, timeout=0.1)
                        break
                    except queue.Full:
                        continue

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                item = q.get()
                if item is sentinel:
                    break
                yield item
            thread.join()
            if error_box:
                raise error_box[0]
        finally:
            # generator closed early (break out of the epoch): release the
            # producer and drain so it observes the flag promptly
            stop.set()
            while True:
                try:
                    q.get_nowait()
                except queue.Empty:
                    break

    def _can_fast_skip(self) -> bool:
        # explicit opt-in only: CombinedDataset declares purity via
        # all_map_style; an unknown dataset's __getitem__ may have
        # consumption side effects, so "unknown" means the safe fallback
        return bool(getattr(self.dataset, "all_map_style", False))

    def iter_from_batch(self, start: int) -> Optional[Iterator[dict[str, Any]]]:
        """This epoch's batches from batch index ``start``, WITHOUT loading
        or decoding the skipped examples (mid-epoch resume fast-forward).
        Sampler indices for skipped batches are still drawn, so data order
        matches an uninterrupted epoch exactly. Returns ``None`` when the
        dataset consumes iterable streams on ``__getitem__`` — the caller
        must then fall back to fetch-and-discard to keep stream positions."""
        start = int(start)
        if start <= 0:
            return iter(self)
        if not self._can_fast_skip():
            return None
        return self._dispatch(start)

    def _dispatch(self, skip: int = 0) -> Iterator[dict[str, Any]]:
        if self.num_workers > 0 or self.prefetch_factor > 1:
            return self._iter_prefetch(skip)
        return self._iter_sync(skip)

    def __iter__(self) -> Iterator[dict[str, Any]]:
        return self._dispatch()


class DeviceFeeder:
    """The framework entry point for the input-fed device pipeline.

    Owns the four pieces every input-fed training loop needs (one place,
    instead of hand-rolled queue plumbing per call site): a background
    producer thread draining a host-batch source, a bounded prefetch queue,
    the host→device transfer (uint8 transfers quarter the h2d traffic vs
    f32), and an optional device-side ``normalize`` jitted once and applied
    after placement. Used by the trainer's fit loop and by ``bench.py``'s
    two input-fed phases.

    Parameters
    ----------
    source:
        Iterable yielding host batches (pytrees of numpy arrays) — or
        items of any pytree shape; each is placed and normalized in order.
    device_put:
        Placement fn for one host batch (default: ``jax.device_put`` of
        the whole pytree). The trainer passes its mesh-sharded placement.
    normalize:
        Optional device-side fn applied after placement (jitted once here
        unless already jitted), e.g. uint8 → CLIP-normalized bf16.
    prefetch:
        Queue depth bound (device batches held at once; keep small — each
        pinned batch occupies HBM).
    timeout_s:
        Consumer-side wait bound: a silently-dead producer fails the run
        (raises ``TimeoutError``) instead of hanging it.

    Donation safety: the feeder keeps NO reference to a batch after
    yielding it, and each batch lives in fresh device buffers — a consumer
    driving a ``donate_argnums`` train step can never alias feeder-held
    memory (regression: tests/datasets/test_device_feeder.py, the
    use-after-free hazard fixed in commit bc479dc lived in exactly this
    plumbing when it was hand-rolled inside bench.py).
    """

    _SENTINEL = object()

    def __init__(
        self,
        source: Any,
        device_put: Optional[Callable] = None,
        normalize: Optional[Callable] = None,
        prefetch: int = 2,
        timeout_s: float = 300.0,
    ) -> None:
        self._source = source
        self._device_put = device_put
        self._normalize_raw = normalize
        self._normalize: Optional[Callable] = None
        self._prefetch = max(1, int(prefetch))
        self._timeout_s = float(timeout_s)
        self._queue: queue.Queue = queue.Queue(maxsize=self._prefetch)
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None

    # -- pipeline stages (producer thread) ---------------------------------
    def _place(self, batch: Any) -> Any:
        import jax

        if self._device_put is not None:
            out = self._device_put(batch)
        else:
            out = jax.device_put(batch)
        if self._normalize_raw is not None:
            if self._normalize is None:
                fn = self._normalize_raw
                self._normalize = fn if hasattr(fn, "lower") else jax.jit(fn)
            out = self._normalize(out)
        return out

    def _producer(self) -> None:
        try:
            for host_batch in self._source:
                if self._stop.is_set():
                    return
                item = self._place(host_batch)
                # bounded put + stop re-check: an abandoned consumer (break
                # at max_steps / limit_*_batches) must not block this
                # thread on a full queue forever
                while not self._stop.is_set():
                    try:
                        self._queue.put(item, timeout=0.1)
                        del item
                        break
                    except queue.Full:
                        continue
                else:
                    return
            end: Any = self._SENTINEL
        except BaseException as err:  # surface in the consumer
            end = err
        while not self._stop.is_set():
            try:
                self._queue.put(end, timeout=0.1)
                break
            except queue.Full:
                continue

    # -- consumer ----------------------------------------------------------
    def _ensure_started(self) -> None:
        if self._thread is None:
            self._thread = threading.Thread(target=self._producer, daemon=True)
            self._thread.start()

    def __iter__(self) -> Iterator[Any]:
        self._ensure_started()
        while True:
            try:
                item = self._queue.get(timeout=self._timeout_s)
            except queue.Empty:
                raise TimeoutError(
                    f"DeviceFeeder: no batch within {self._timeout_s:.0f}s "
                    "(producer dead or source stalled)"
                ) from None
            if item is self._SENTINEL:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
            del item  # drop our reference before blocking on the next get

    def close(self) -> None:
        """Stop the producer and drain held batches (frees their HBM)."""
        self._stop.set()
        while True:
            try:
                self._queue.get_nowait()
            except queue.Empty:
                break
        if self._thread is not None:
            self._thread.join(timeout=5.0)

    def __enter__(self) -> "DeviceFeeder":
        self._ensure_started()
        return self

    def __exit__(self, *exc: Any) -> None:
        self.close()
