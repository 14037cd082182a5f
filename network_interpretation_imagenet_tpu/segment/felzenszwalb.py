"""Felzenszwalb-Huttenlocher segmentation: ctypes binding + numpy fallback.

Reference usage (must match parameter semantics):
``felzenszwalb(img_as_float(img_show), scale=100, sigma=0.5, min_size=50)``
at ``bayesian_active_learning_imagenet.py:150`` (MNIST min_size=5 at
``generate_gp_training_data_mnist.py:187``, CIFAR min_size=10 at
``generate_gp_training_data_cifar.py:293``).

The serial union-find makes this a host kernel: the C++ implementation
(``native/felzenszwalb.cc``) is built on demand with g++ and loaded via
ctypes; a pure-numpy implementation provides a toolchain-free fallback and a
cross-check for the native kernel. Gaussian pre-smoothing happens here (scipy)
so both backends consume identical inputs.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_SO_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libfelzenszwalb.so"))

_lib: Optional[ctypes.CDLL] = None
_lib_tried = False
_lib_lock = __import__("threading").Lock()


def _load_native() -> Optional[ctypes.CDLL]:
    """Build (once, via make) and load the C++ kernel; None on any failure.
    Thread-safe: ``segment_image_batch`` fans FH across a thread pool, and
    two first-callers must not race the make build."""
    with _lib_lock:
        return _load_native_locked()


def _load_native_locked() -> Optional[ctypes.CDLL]:
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    try:
        # Run make even when the .so exists: its source-newer-than-target
        # rule rebuilds after a kernel edit (a stale cached .so would miss
        # newly added symbols); a fresh build is a ~10 ms no-op.
        subprocess.run(
            ["make", "-s", "-C", os.path.abspath(_NATIVE_DIR)],
            check=True,
            capture_output=True,
            timeout=120,
        )
        lib = ctypes.CDLL(_SO_PATH)
        lib.felzenszwalb_segment.restype = ctypes.c_int32
        lib.felzenszwalb_segment.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_float,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.label_components.restype = ctypes.c_int32
        lib.label_components.argtypes = [
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.slic_postpass.restype = ctypes.c_int32
        lib.slic_postpass.argtypes = [
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_float,
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.felzenszwalb_ladder.restype = None
        lib.felzenszwalb_ladder.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.xrai_greedy_rank.restype = ctypes.c_int32
        lib.xrai_greedy_rank.argtypes = [
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float),
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def _smooth(img: np.ndarray, sigma: float) -> np.ndarray:
    """Per-channel gaussian smoothing (sigma in pixels, reflect boundary)."""
    from scipy import ndimage

    img = np.ascontiguousarray(img, np.float32)
    if sigma <= 0:
        return img
    out = np.empty_like(img)
    for ch in range(img.shape[2]):
        ndimage.gaussian_filter(img[:, :, ch], sigma, output=out[:, :, ch], mode="reflect")
    return out


def _edges_8conn(h: int, w: int):
    """Vectorized 8-connectivity edge lists in the SAME order the C++ kernel
    emits them (pixel raster-major, then right/down/down-right/down-left per
    pixel). Order matters: FH merge decisions depend on processing order
    within equal-weight tie classes, and both backends use stable sorts — a
    matching pre-sort order keeps the two backends bit-identical even on
    quantized images full of ties."""
    idx = np.arange(h * w, dtype=np.int32).reshape(h, w)
    n = h * w
    a4 = np.full((n, 4), -1, np.int32)
    b4 = np.full((n, 4), -1, np.int32)
    flat = idx.ravel()
    # direction 0: right
    m = np.zeros((h, w), bool); m[:, :-1] = True
    a4[flat[m.ravel()], 0] = idx[:, :-1].ravel()
    b4[flat[m.ravel()], 0] = idx[:, 1:].ravel()
    # direction 1: down
    m = np.zeros((h, w), bool); m[:-1, :] = True
    a4[flat[m.ravel()], 1] = idx[:-1, :].ravel()
    b4[flat[m.ravel()], 1] = idx[1:, :].ravel()
    # direction 2: down-right
    m = np.zeros((h, w), bool); m[:-1, :-1] = True
    a4[flat[m.ravel()], 2] = idx[:-1, :-1].ravel()
    b4[flat[m.ravel()], 2] = idx[1:, 1:].ravel()
    # direction 3: down-left
    m = np.zeros((h, w), bool); m[:-1, 1:] = True
    a4[flat[m.ravel()], 3] = idx[:-1, 1:].ravel()
    b4[flat[m.ravel()], 3] = idx[1:, :-1].ravel()
    valid = a4.ravel() >= 0
    return a4.ravel()[valid], b4.ravel()[valid]


def _felzenszwalb_numpy(
    img: np.ndarray, scale: float, min_size: int
) -> np.ndarray:
    """Reference-free numpy implementation of the FH algorithm (edges
    vectorized; the union-find loop is Python — fine for test-sized images,
    the C++ kernel covers 224²)."""
    h, w, c = img.shape
    a, b = _edges_8conn(h, w)
    flat = img.reshape(-1, c)
    weights = np.sqrt(((flat[a] - flat[b]) ** 2).sum(axis=1))
    order = np.argsort(weights, kind="stable")
    a, b, weights = a[order], b[order], weights[order]

    n = h * w
    parent = np.arange(n, dtype=np.int32)
    size = np.ones(n, np.int32)
    # float32 like the C++ kernel: the merge threshold must round identically
    # in both backends or near-threshold edges diverge (bit-parity contract).
    internal = np.zeros(n, np.float32)
    scale32 = np.float32(scale)

    def find(x: int) -> int:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    def merge(ra: int, rb: int, wt: float) -> None:
        if size[ra] < size[rb]:
            ra, rb = rb, ra
        parent[rb] = ra
        size[ra] += size[rb]
        internal[ra] = wt

    for i in range(len(a)):
        ra, rb = find(int(a[i])), find(int(b[i]))
        if ra == rb:
            continue
        wt = weights[i]
        ta = internal[ra] + scale32 / np.float32(size[ra])
        tb = internal[rb] + scale32 / np.float32(size[rb])
        if wt <= ta and wt <= tb:
            merge(ra, rb, wt)

    for i in range(len(a)):
        ra, rb = find(int(a[i])), find(int(b[i]))
        if ra != rb and (size[ra] < min_size or size[rb] < min_size):
            merge(ra, rb, weights[i])

    roots = np.fromiter((find(int(p)) for p in range(n)), np.int32, n)
    from network_interpretation_imagenet_tpu.segment.common import relabel_sequential

    return relabel_sequential(roots.reshape(h, w))


def felzenszwalb(
    image: np.ndarray,
    scale: float = 100.0,
    sigma: float = 0.5,
    min_size: int = 50,
    backend: str = "auto",
) -> np.ndarray:
    """Segment an image; returns int32[H, W] contiguous labels.

    ``image``: uint8 or float [H, W] / [H, W, C]. uint8 is scaled to [0, 1]
    (``img_as_float`` semantics the reference relies on).
    ``backend``: "auto" (native if buildable) | "native" | "numpy".
    """
    img = np.asarray(image)
    if img.ndim == 2:
        img = img[:, :, None]
    if img.dtype == np.uint8:
        img = img.astype(np.float32) / 255.0
    img = _smooth(img.astype(np.float32), sigma)

    if backend in ("auto", "native"):
        lib = _load_native()
        if lib is not None:
            h, w, c = img.shape
            img_c = np.ascontiguousarray(img, np.float32)
            out = np.empty(h * w, np.int32)
            lib.felzenszwalb_segment(
                img_c.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                h,
                w,
                c,
                ctypes.c_float(scale),
                ctypes.c_int32(min_size),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            )
            return out.reshape(h, w)
        if backend == "native":
            raise RuntimeError("native felzenszwalb kernel unavailable")
    return _felzenszwalb_numpy(img, scale, min_size)


def label_components(labels: np.ndarray):
    """4-connectivity connected components of an int32 label map (pixels
    join iff adjacent AND equal label) via the native kernel: returns
    ``(comp int32[H, W], n_components)`` with contiguous ids in raster
    first-occurrence order, or ``None`` when the toolchain is unavailable
    (callers fall back to the per-label ``scipy.ndimage.label`` loop).
    One O(n·alpha) pass over the whole map — the fast path of
    ``segment.slic.enforce_connectivity``."""
    lib = _load_native()
    if lib is None:
        return None
    labels = np.ascontiguousarray(labels, np.int32)
    h, w = labels.shape
    out = np.empty(h * w, np.int32)
    n = lib.label_components(
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        h,
        w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out.reshape(h, w), int(n)


def slic_postpass_native(labels: np.ndarray, min_fraction: float):
    """Native full SLIC connectivity postpass (CC + keep rule + adjacency
    absorption — see ``segment.slic.enforce_connectivity`` for the spec):
    returns the absorbed int32 label map (NOT relabeled), or ``None``
    when the toolchain is unavailable."""
    lib = _load_native()
    if lib is None:
        return None
    labels = np.ascontiguousarray(labels, np.int32)
    h, w = labels.shape
    out = np.empty(h * w, np.int32)
    lib.slic_postpass(
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        h,
        w,
        ctypes.c_float(min_fraction),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out.reshape(h, w)


def felzenszwalb_ladder(
    image: np.ndarray,
    scales,
    sigma: float = 0.5,
    min_sizes=None,
    backend: str = "auto",
) -> list:
    """Multi-scale FH oversegmentation (XRAI's ladder) in one pass.

    Every scale shares ``sigma``, so the smoothed image, the 8-connectivity
    edge build, and the O(E log E) sort — the dominant cost of a run — are
    computed ONCE; only the cheap union-find passes repeat per scale
    (``native/felzenszwalb.cc felzenszwalb_ladder``). Bit-exact with
    ``[felzenszwalb(image, s, sigma, m) for s, m in zip(scales, min_sizes)]``
    — each scale's result is a pure function of the sorted edge list, which
    both paths build identically (stable sort, same emission order).

    ``min_sizes`` defaults to the XRAI convention ``max(round(s/10), 5)``.
    Returns a list of int32[H, W] contiguous label maps, one per scale.
    """
    scales = [float(s) for s in scales]
    if min_sizes is None:
        min_sizes = [max(int(round(s / 10.0)), 5) for s in scales]
    min_sizes = [int(m) for m in min_sizes]
    if len(min_sizes) != len(scales):
        raise ValueError(
            f"min_sizes length {len(min_sizes)} != scales {len(scales)}")
    if not scales:
        return []

    img = np.asarray(image)
    if img.ndim == 2:
        img = img[:, :, None]
    if img.dtype == np.uint8:
        img = img.astype(np.float32) / 255.0
    img = _smooth(img.astype(np.float32), sigma)

    if backend in ("auto", "native"):
        lib = _load_native()
        if lib is not None:
            h, w, c = img.shape
            img_c = np.ascontiguousarray(img, np.float32)
            n_s = len(scales)
            labels = np.empty(n_s * h * w, np.int32)
            counts = np.empty(n_s, np.int32)
            sc = np.asarray(scales, np.float32)
            ms = np.asarray(min_sizes, np.int32)
            lib.felzenszwalb_ladder(
                img_c.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                h, w, c,
                sc.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                ms.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                n_s,
                labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            )
            return [labels[i * h * w:(i + 1) * h * w].reshape(h, w)
                    for i in range(n_s)]
        if backend == "native":
            raise RuntimeError("native felzenszwalb kernel unavailable")
    return [_felzenszwalb_numpy(img, s, m)
            for s, m in zip(scales, min_sizes)]
