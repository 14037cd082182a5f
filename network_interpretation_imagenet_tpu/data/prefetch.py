"""Threaded prefetching over an indexable dataset — the TPU-native
counterpart of the reference's ``DataLoader(num_workers=N)``
(``bayesian_active_learning_imagenet.py:405-415`` uses one worker process;
``args.py`` exposes ``--workers/-j``).

Design: JPEG decode + resize/normalize are the host-side cost of a real-data
sweep (docs/PERFORMANCE.md: ~34 ms/image FH + decode on one core). A
process pool would re-serialize images across the boundary; a THREAD pool
is the right tool here because PIL decode and numpy release the GIL for the
heavy parts, and the consumer (the sweep) wants items IN ORDER with bounded
memory. ``prefetch(dataset, num_workers, buffer)`` keeps up to ``buffer``
``dataset[i]`` calls in flight and yields results in index order, so the
device never waits on a cold decode and a slow item never grows the queue
unboundedly.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Sequence


def prefetch(dataset, num_workers: int = 4, buffer: int = 16,
             indices: Sequence[int] = None) -> Iterator:
    """Yield ``dataset[i]`` for each index, decoded ahead by worker threads.

    Args:
      dataset: indexable (``__len__`` + ``__getitem__``). Plain iterables
        are yielded through unchanged (no prefetch — they cannot be read
        ahead safely).
      num_workers: decoding threads; ``0`` disables prefetching entirely.
      buffer: max in-flight items (bounds memory: ~buffer decoded images).
      indices: optional explicit index order (e.g. a multi-host stride from
        ``process_strided_indices``); defaults to ``range(len(dataset))``.

    Exceptions raised by ``dataset[i]`` propagate at the yield point for
    that index, in order — a sweep's per-image failure isolation sees them
    exactly as it would serially.
    """
    if num_workers <= 0 or not hasattr(dataset, "__getitem__"):
        if indices is not None:
            for i in indices:
                yield dataset[i]
        elif hasattr(dataset, "__getitem__"):
            # Explicit range iteration — the legacy __getitem__ protocol
            # would spin forever on datasets that don't raise IndexError.
            for i in range(len(dataset)):
                yield dataset[i]
        else:
            yield from dataset
        return

    order = list(indices) if indices is not None else list(range(len(dataset)))
    buffer = max(int(buffer), 1)

    with ThreadPoolExecutor(max_workers=int(num_workers)) as pool:
        futures = {}
        next_submit = 0

        def top_up():
            nonlocal next_submit
            while next_submit < len(order) and len(futures) < buffer:
                pos = next_submit
                futures[pos] = pool.submit(dataset.__getitem__, order[pos])
                next_submit += 1

        top_up()
        for pos in range(len(order)):
            fut = futures.pop(pos)
            try:
                item = fut.result()
            except BaseException:
                # Drop the remaining queue fast on fatal errors; the
                # executor context cancels nothing already running but we
                # must not deadlock on exit.
                for f in futures.values():
                    f.cancel()
                raise
            top_up()
            yield item
