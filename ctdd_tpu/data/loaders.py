"""Dataset registry + host-side batch iteration.

Counterpart of reference lib/datasets/dataset_utils.py (registry) and the
torch Dataset/DataLoader pattern of its train scripts. TPU data reality:
datasets here are host numpy arrays (or on-the-fly generators); batches are
yielded as numpy and sharded onto the device mesh by the training loop.
"""

from __future__ import annotations

import os
from typing import Iterator, Optional

import numpy as np

from ctdd_tpu import registry


class ArrayDataset:
    """An in-memory (N, ...) integer dataset with optional labels."""

    def __init__(self, data: np.ndarray, labels: Optional[np.ndarray] = None):
        self.data = data
        self.labels = labels

    def __len__(self):
        return self.data.shape[0]


def mix_pool_seed(base_seed: int, epoch: int) -> int:
    """Generator seed for a stream_fresh pool keyed by (data.seed, epoch).

    Well-mixed so epoch pools never collide across base seeds: a plain
    gen(epoch) key would make data.seed=k replay its own initial gen(k) pool
    at epoch k, and would give every base seed the identical stream from
    epoch 1 on."""
    ss = np.random.SeedSequence([int(base_seed), int(epoch)])
    return int(ss.generate_state(1, np.uint64)[0] & 0x7FFFFFFF)


def iterate_batches(
    dataset, batch_size: int, *, shuffle: bool = True, seed: int = 0,
    drop_last: bool = True,
) -> Iterator:
    """Epoch-looping batch iterator (counterpart of the infinite
    `while True: for minibatch in dataloader` loops, train_image.py:99)."""
    rng = np.random.RandomState(seed)
    n = len(dataset)
    while True:
        idx = rng.permutation(n) if shuffle else np.arange(n)
        end = n - (n % batch_size) if drop_last else n
        for s in range(0, end, batch_size):
            batch_idx = idx[s : s + batch_size]
            if dataset.labels is not None:
                yield dataset.data[batch_idx], dataset.labels[batch_idx]
            else:
                yield dataset.data[batch_idx], None


@registry.datasets.register(name="SyntheticData")
def synthetic_data(cfg, root: Optional[str] = None) -> ArrayDataset:
    """Binarized 2D synthetic dataset (ref synthetic.py:234-258).

    Loads cfg.data.location if it exists; otherwise generates the data on the
    fly (the reference requires a pre-generated .npy from its CLI — we fold
    the generator in, no artifact needed).
    """
    from ctdd_tpu.data.synthetic import generate_dataset

    path = root or cfg.data.get("location", "")
    if path and os.path.exists(path):
        data = np.load(path).astype(np.int32)
    else:
        num = int(cfg.data.get("num_samples", 100000))
        data, _ = generate_dataset(
            cfg.data.type,
            num,
            discrete_dim=cfg.data.shape[0],
            binmode=cfg.data.get("binmode", "gray"),
            seed=0,
        )
    return ArrayDataset(data.astype(np.int32))


def get_dataset(cfg, root: Optional[str] = None):
    """Resolve cfg.data.name through the dataset registry
    (ref dataset_utils.py:10-11)."""
    return registry.datasets.get(cfg.data.name)(cfg, root)
