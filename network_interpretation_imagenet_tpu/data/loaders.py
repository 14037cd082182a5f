"""MNIST / CIFAR loaders (host decode, numpy batches).

Replaces the reference's torchvision dataset usage
(``generate_gp_training_data_mnist.py:57-69``, ``dataloader.py:6-78``) with
direct readers of the standard on-disk formats (no torchvision in this
stack): MNIST IDX files, CIFAR-10/100 python pickles. Split semantics follow
``dataloader.getDataloaders``: validation = the LAST 5000 training images
(``dataloader.py:40-54``); '+' datasets get standard flip + pad-4-crop
augmentation.
"""

from __future__ import annotations

import gzip
import os
import pickle
import struct
from typing import Iterator, Tuple

import numpy as np


# --- MNIST (IDX format) -----------------------------------------------------


def _read_idx(path: str) -> np.ndarray:
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as f:
        zeros, dtype_code, ndim = struct.unpack(">HBB", f.read(4))
        if zeros != 0:
            raise ValueError(f"bad IDX magic in {path}")
        shape = struct.unpack(f">{ndim}I", f.read(4 * ndim))
        data = np.frombuffer(f.read(), np.uint8)
    return data.reshape(shape)


def load_mnist_dir(data_dir: str, train: bool = False):
    """Load MNIST from a directory holding the standard IDX files
    (``train-images-idx3-ubyte[.gz]`` etc.). Returns (images f32 [N,28,28,1]
    in [0,1] — the reference applies only ToTensor, no normalization
    (``generate_gp_training_data_mnist.py:59-62``) — and labels int64 [N])."""
    prefix = "train" if train else "t10k"
    imgs = labels = None
    for suffix in ("", ".gz"):
        ip = os.path.join(data_dir, f"{prefix}-images-idx3-ubyte{suffix}")
        lp = os.path.join(data_dir, f"{prefix}-labels-idx1-ubyte{suffix}")
        if os.path.exists(ip) and os.path.exists(lp):
            imgs = _read_idx(ip)
            labels = _read_idx(lp)
            break
    if imgs is None:
        raise FileNotFoundError(f"MNIST IDX files not found under {data_dir}")
    return (imgs.astype(np.float32) / 255.0)[..., None], labels.astype(np.int64)


# --- CIFAR (python pickle format) ------------------------------------------


def load_cifar10_dir(data_dir: str, train: bool = False):
    """Load CIFAR-10 python-format batches from ``cifar-10-batches-py``.
    Returns (images f32 [N,32,32,3] in [0,1], labels int64 [N])."""
    base = data_dir
    if os.path.isdir(os.path.join(data_dir, "cifar-10-batches-py")):
        base = os.path.join(data_dir, "cifar-10-batches-py")
    names = [f"data_batch_{i}" for i in range(1, 6)] if train else ["test_batch"]
    xs, ys = [], []
    for n in names:
        with open(os.path.join(base, n), "rb") as f:
            d = pickle.load(f, encoding="bytes")
        xs.append(d[b"data"])
        ys.extend(d[b"labels"])
    x = np.concatenate(xs).reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
    return x.astype(np.float32) / 255.0, np.asarray(ys, np.int64)


def load_cifar100_dir(data_dir: str, train: bool = False):
    """Load CIFAR-100 python format (``cifar-100-python`` with 'train'/'test'
    files and b'fine_labels')."""
    base = data_dir
    if os.path.isdir(os.path.join(data_dir, "cifar-100-python")):
        base = os.path.join(data_dir, "cifar-100-python")
    with open(os.path.join(base, "train" if train else "test"), "rb") as f:
        d = pickle.load(f, encoding="bytes")
    x = d[b"data"].reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
    return x.astype(np.float32) / 255.0, np.asarray(d[b"fine_labels"], np.int64)


# --- batching / augmentation ------------------------------------------------


def _augment(images: np.ndarray, rng: np.random.RandomState) -> np.ndarray:
    """Standard CIFAR '+' augmentation: pad 4 + random crop, random h-flip
    (the reference's ``augmentation`` flag, ``config.py:3-20``)."""
    n, h, w, c = images.shape
    out = np.empty_like(images)
    # Zero padding — torchvision RandomCrop(32, padding=4) default, which
    # the reference's '+' recipe uses (dataloader.py:26-33 semantics).
    padded = np.pad(images, ((0, 0), (4, 4), (4, 4), (0, 0)), mode="constant")
    for i in range(n):
        dy, dx = rng.randint(0, 9, 2)
        img = padded[i, dy : dy + h, dx : dx + w]
        if rng.rand() < 0.5:
            img = img[:, ::-1]
        out[i] = img
    return out


class ArrayLoader:
    """Minimal epoch iterator over in-memory arrays with optional shuffling,
    augmentation and normalization."""

    def __init__(
        self,
        images: np.ndarray,
        labels: np.ndarray,
        batch_size: int,
        shuffle: bool = False,
        augment: bool = False,
        mean=(0.0,),
        std=(1.0,),
        seed: int = 0,
        drop_last: bool = False,
    ):
        self.images = images
        self.labels = labels
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.augment = augment
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)
        self.seed = int(seed)
        self.rng = np.random.RandomState(seed)
        self.drop_last = drop_last

    def set_epoch(self, epoch: int) -> None:
        """Re-derive the shuffle/augment RNG from ``(seed, epoch)`` so the
        epoch's batch stream is a pure function of those two values — a
        process restarted mid-epoch (Trainer ``--save-every-steps`` resume)
        replays the SAME permutation the interrupted run trained on. Without
        this the stateful ``self.rng`` advances once per ``__iter__``, so a
        fresh process's epoch-E shuffle would equal the original epoch-0's."""
        self.rng = np.random.RandomState(
            np.random.SeedSequence([self.seed, int(epoch)]).generate_state(1)[0]
        )

    def __len__(self) -> int:
        n = len(self.images)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        idx = np.arange(len(self.images))
        if self.shuffle:
            self.rng.shuffle(idx)
        stop = (
            len(idx) - len(idx) % self.batch_size if self.drop_last else len(idx)
        )
        for i in range(0, stop, self.batch_size):
            sel = idx[i : i + self.batch_size]
            x = self.images[sel]
            if self.augment:
                x = _augment(x, self.rng)
            x = (x - self.mean) / self.std
            yield x, self.labels[sel]


def get_cifar_loaders(
    data_dir: str,
    dataset: str = "cifar10+",
    batch_size: int = 64,
    seed: int = 0,
):
    """(train, val, test) loaders with the reference's split semantics
    (``dataloader.py:6-78``): val = last 5000 of train, train keeps all 50k
    (the reference samples train from the full index set too)."""
    from network_interpretation_imagenet_tpu.config import DATASETS

    spec = DATASETS[dataset]
    loader = load_cifar100_dir if dataset.startswith("cifar100") else load_cifar10_dir
    train_x, train_y = loader(data_dir, train=True)
    test_x, test_y = loader(data_dir, train=False)
    val_x, val_y = train_x[-5000:], train_y[-5000:]
    common = dict(mean=spec.mean, std=spec.std, seed=seed)
    return (
        ArrayLoader(
            train_x, train_y, batch_size, shuffle=True,
            augment=spec.augmentation, **common,
        ),
        ArrayLoader(val_x, val_y, batch_size, **common),
        ArrayLoader(test_x, test_y, batch_size, **common),
    )
