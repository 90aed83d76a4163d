"""Fixed-shape batch iteration for TPU training.

The reference uses `torch.utils.data.DataLoader(num_workers=0)` — serial,
per-item Python (reference trainer.py:67). Here a batch is a single numpy
gather over the whole split (vectorized), shapes are static (drop_last) so
every step hits the same compiled executable, and device placement is done
once per batch via `jax.device_put` with an optional mesh sharding.
"""
from __future__ import annotations

from typing import Dict, Iterator, Optional

import numpy as np


def shard_arrays_for_process(arrays: Dict[str, np.ndarray],
                             process_index: Optional[int] = None,
                             process_count: Optional[int] = None
                             ) -> Dict[str, np.ndarray]:
    """Slice a corpus dict to this host's shard for multi-host training.

    Each process keeps a contiguous, equal-size slice (n // process_count
    items) so every host yields the same number of fixed-shape batches —
    required for the lockstep collective schedule of a pjit train loop.
    The < process_count remainder items are dropped on every host (same
    rationale as the loader's drop_last). Single process: arrays unchanged.

    The reference is single-process (SURVEY.md §2.2); this is TPU-introduced,
    mirroring the standard JAX multi-host recipe: each process keeps 1/pc of
    the corpus AND feeds per-host batches of batch_size // pc rows, which
    the Trainer assembles into global arrays with
    `jax.make_array_from_process_local_data` (train/trainer.py::_place and
    the compiled-epoch placement).
    """
    import jax
    pc = jax.process_count() if process_count is None else process_count
    pi = jax.process_index() if process_index is None else process_index
    if pc <= 1:
        return arrays
    n = len(next(iter(arrays.values())))
    per = n // pc
    if per == 0:
        raise ValueError(f"corpus of {n} items cannot be sharded over "
                         f"{pc} processes")
    start = pi * per
    return {k: v[start: start + per] for k, v in arrays.items()}


def batch_iterator(arrays: Dict[str, np.ndarray], batch_size: int,
                   shuffle: bool = True, seed: Optional[int] = None,
                   drop_last: bool = True) -> Iterator[Dict[str, np.ndarray]]:
    """Yield dict batches with leading axis `batch_size`.

    drop_last defaults True to keep shapes static for XLA; the reference's
    ragged final batch only perturbs per-epoch loss averages.
    """
    n = len(next(iter(arrays.values())))
    idx = np.arange(n)
    if shuffle:
        rng = np.random.default_rng(seed)
        rng.shuffle(idx)
    end = n - (n % batch_size) if drop_last else n
    for s in range(0, end, batch_size):
        sel = idx[s: s + batch_size]
        yield {k: v[sel] for k, v in arrays.items()}


def num_batches(arrays: Dict[str, np.ndarray], batch_size: int,
                drop_last: bool = True) -> int:
    n = len(next(iter(arrays.values())))
    return n // batch_size if drop_last else -(-n // batch_size)
