"""Parallel host input pipeline: worker pool + collate + device prefetch.

The reference trains with 6 torch DataLoader workers per GPU (SURVEY §3.2).
A single python thread feeds ~110 ex/s of decode+filter+augment — enough
for one chip, starving an 8-chip data-parallel mesh.  Here:

  reader thread   tar IO + per-person split + shuffle buffer (sequential,
                  cheap — the stream order lives here)
  worker threads  filter stack + crop/warp/augment (cv2/numpy release the
                  GIL, so threads scale; each worker owns its own RNG)
  collator        batch assembly + numpy collate
  device_prefetch overlaps the host->device transfer of batch N+1 with
                  step N's compute (double buffering)

Items complete out of order across workers — harmless for training, which
shuffles anyway.
"""
from __future__ import annotations

import collections
import queue
import threading
from typing import Any, Callable, Dict, Iterator, Optional

import numpy as np


def parallel_batched(
    mixed,
    batch_size: int,
    num_workers: int = 6,
    prefetch: int = 4,
    seed: int = 0,
) -> Iterator[Dict]:
    """Batches from a dataset exposing `iter_raw()` -> (dataset, person).

    Infinite-stream training loader (daemon threads; GC'd with the process).
    """
    from .npz_dataset import collate

    in_q: "queue.Queue" = queue.Queue(maxsize=max(num_workers * 4, 8))
    out_q: "queue.Queue" = queue.Queue(maxsize=max(batch_size * 2, 16))
    batch_q: "queue.Queue" = queue.Queue(maxsize=prefetch)

    def reader():
        for ds, person in mixed.iter_raw():
            in_q.put((ds, person))

    def worker(widx: int):
        rng = np.random.default_rng(seed * 1000 + widx)
        while True:
            ds, person = in_q.get()
            p = ds._apply_filters(ds._decode(person))
            if p is None:
                continue
            out_q.put(ds._process(p, rng=rng))

    def collator():
        while True:
            batch = [out_q.get() for _ in range(batch_size)]
            batch_q.put(collate(batch))

    threading.Thread(target=reader, daemon=True).start()
    for w in range(num_workers):
        threading.Thread(target=worker, args=(w,), daemon=True).start()
    threading.Thread(target=collator, daemon=True).start()

    while True:
        yield batch_q.get()


def mp_batched(
    make_stream_fn: Callable[[int, int], Any],
    batch_size: int,
    num_workers: int = 6,
    prefetch: int = 4,
) -> Iterator[Dict]:
    """Process-pool loader, webdataset split_by_worker style (the reference
    trains with 6 torch DataLoader worker PROCESSES per GPU, SURVEY §3.2).

    make_stream_fn(worker_idx, num_workers) is called INSIDE each forked
    worker and must return an item iterator (e.g. a MixedTarDataset built
    with process_index=host*W+w so every worker owns a disjoint shard
    subset).  Each worker runs the full decode/filter/augment/collate
    pipeline on its own interpreter (no GIL contention — the thread-pool
    variant above measured only ~1.1x because the per-item python overhead
    serializes) and ships collated numpy batches to the parent.
    """
    import multiprocessing as mp

    ctx = mp.get_context("fork")  # closures need not pickle
    q: "mp.Queue" = ctx.Queue(maxsize=prefetch)

    def worker(widx: int):
        from .npz_dataset import collate

        stream = iter(make_stream_fn(widx, num_workers))
        batch = []
        while True:
            batch.append(next(stream))
            if len(batch) == batch_size:
                q.put(collate(batch))
                batch = []

    procs = [ctx.Process(target=worker, args=(w,), daemon=True)
             for w in range(num_workers)]
    for p in procs:
        p.start()
    try:
        while True:
            yield q.get()
    finally:
        for p in procs:
            p.terminate()


def device_prefetch(
    batches: Iterator[Any],
    put_fn: Callable[[Any], Any],
    depth: int = 2,
) -> Iterator[Any]:
    """Apply `put_fn` (host prep + jax.device_put) to batch N+1 while batch
    N is being consumed.  device_put is async, so the H2D DMA of the next
    batch rides under the current step's compute."""
    buf: collections.deque = collections.deque()
    it = iter(batches)
    try:
        while len(buf) < depth:
            buf.append(put_fn(next(it)))
        while True:
            nxt = put_fn(next(it))
            yield buf.popleft()
            buf.append(nxt)
    except StopIteration:
        pass
    while buf:
        yield buf.popleft()
