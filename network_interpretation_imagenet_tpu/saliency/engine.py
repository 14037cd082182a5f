"""The masked-forward engine — this framework's hot kernel.

Reference hot loop (``generate_gp_training_data_imagenet.py:221-267``): per
sample, build ONE mask with a Python loop, run ONE CUDA forward, write ONE
PNG, repeat 100-1000×, with host↔device round-trips at every step. The BO
path is worse — it re-iterates the whole val dataset per sample
(``bayesian_active_learning_imagenet.py:126-129``).

TPU redesign: the image and segment map live on device; masks are *fused*
into the forward — each flat mega-batch (up to ``mask_batch`` masks, default
1024) builds its [B, H, W] masks from window starts by pure comparison,
multiplies them into the image broadcast, and runs one batched bf16 forward
on the MXU. Flat batches beat a `lax.scan` over small chunks measurably
(v5e: 7.0k vs 4.5k evals/s) because XLA pipelines across the whole batch;
remainders bucket to powers of two so repeat workloads stay on a handful of
compiled shapes, and all outcome arrays come back in a single batched
device→host fetch (per-array readbacks pay a tunnel round-trip each).
Per-mask survive labels, predictions, and target probabilities come back as
numpy arrays; aggregation is an einsum downstream.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from network_interpretation_imagenet_tpu.models import ModelBundle
from network_interpretation_imagenet_tpu.ops import masking

Array = jax.Array


@dataclasses.dataclass
class MaskEvalResult:
    """Per-mask outcomes for a bank of K masks (numpy, trimmed to true K)."""

    survived: np.ndarray     # bool[K] — masked prediction still == target
    preds: np.ndarray        # int32[K] argmax class
    prob_target: np.ndarray  # f32[K] softmax prob of the target class
    prob_max: np.ndarray     # f32[K] max softmax prob

    @property
    def labels(self) -> np.ndarray:
        """1/0 labels as the reference encodes them in mask filenames."""
        return self.survived.astype(np.int32)


class SaliencyEngine:
    """Owns jitted compute for one classifier (params resident on device)."""

    def __init__(
        self,
        bundle: ModelBundle,
        variables: Any,
        mask_batch: int = 1024,
        compute_dtype: Any = jnp.bfloat16,
    ) -> None:
        self.bundle = bundle
        self.mask_batch = int(mask_batch)
        self.compute_dtype = compute_dtype
        # Keep a by-reference handle to host-resident weight trees (e.g.
        # straight from convert_checkpoint): serving.export_engine reuses it
        # to avoid a device→host readback that runs at ~1 MB/s on
        # remote-tunnel TPU setups.
        self.host_variables = (
            variables
            if all(isinstance(a, np.ndarray) for a in jax.tree.leaves(variables))
            else None
        )
        self.variables = jax.device_put(variables)

        apply_fn = bundle.logits

        @jax.jit
        def _predict(variables, images):
            logits = apply_fn(variables, images.astype(compute_dtype))
            return logits.astype(jnp.float32)

        self._predict = _predict

        def _outcomes(logits: Array, target: Array):
            logits = logits.astype(jnp.float32)
            probs = jax.nn.softmax(logits, axis=-1)
            preds = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return (
                preds == target,
                preds,
                probs[:, target],
                jnp.max(probs, axis=-1),
            )

        # The masking stage is deliberately plain XLA: a Pallas fused
        # build+mask+cast kernel was measured 36-40% SLOWER end-to-end on
        # v5e (its [K,H,W,3] output lane-pads C 3→128, 42× the bytes, and
        # OOMs outright at K≥2048) — see ops/pallas_masking.py and
        # docs/PERFORMANCE.md for the numbers.
        @jax.jit
        def _eval_window(variables, image, segments, firsts, width, target):
            masks = masking.window_masks(segments, firsts, width)
            imgs = masking.apply_masks(image, masks).astype(compute_dtype)
            return _outcomes(apply_fn(variables, imgs), target)

        self._eval_window = _eval_window

        @jax.jit
        def _eval_knockout(variables, image, segments, knock_ids, target):
            masks = masking.knockout_masks(segments, knock_ids)
            imgs = masking.apply_masks(image, masks).astype(compute_dtype)
            return _outcomes(apply_fn(variables, imgs), target)

        self._eval_knockout = _eval_knockout

        @jax.jit
        def _eval_bank(variables, image, masks, target):
            imgs = masking.apply_masks(image, masks).astype(compute_dtype)
            return _outcomes(apply_fn(variables, imgs), target)

        self._eval_bank = _eval_bank

        @jax.jit
        def _eval_window_flat(variables, images, segments, pairs, widths, targets):
            """Flat (image_idx, first) pairs → one batched forward.

            The N×K image/mask grid is flattened on the host and fed through
            the same `mask_batch` pow-2 chunking as the single-image path, so
            small per-image mask counts (the reference's 100/image) still
            fill the MXU while large sweeps stay at bounded memory — the
            val-set-sweep throughput path.
            """
            img_idx = pairs[:, 0]
            firsts = pairs[:, 1]
            seg = segments[img_idx]                            # [B,H,W]
            lo = firsts[:, None, None]
            hi = lo + widths[img_idx][:, None, None]
            masks = (seg >= lo) & (seg < hi)                   # [B,H,W]
            imgs = (
                images[img_idx] * masks[..., None].astype(images.dtype)
            ).astype(compute_dtype)
            logits = apply_fn(variables, imgs).astype(jnp.float32)
            probs = jax.nn.softmax(logits, axis=-1)
            preds = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            t = targets[img_idx]
            p_t = jnp.take_along_axis(probs, t[:, None], axis=1)[:, 0]
            return preds == t, preds, p_t, jnp.max(probs, axis=-1)

        self._eval_window_flat = _eval_window_flat

        @jax.jit
        def _eval_knockout_flat(variables, images, segments, rows, targets):
            """Flat (image_idx, m knock ids) rows → one batched forward.

            The knockout twin of `_eval_window_flat`: rows[:, 0] selects the
            image/segment map, rows[:, 1:] are the M segment IDs each mask
            zeros (reference MNIST M=1 / CIFAR M=5 semantics,
            ``generate_gp_training_data_mnist.py:218-223``). Same pow-2
            chunking and one-fetch contract as the window grid.
            """
            img_idx = rows[:, 0]
            ids = rows[:, 1:]                                  # [B, M]
            seg = segments[img_idx]                            # [B,H,W]
            hit = jnp.any(
                seg[:, None, :, :] == ids[:, :, None, None], axis=1
            )
            imgs = (
                images[img_idx] * (~hit)[..., None].astype(images.dtype)
            ).astype(compute_dtype)
            logits = apply_fn(variables, imgs).astype(jnp.float32)
            probs = jax.nn.softmax(logits, axis=-1)
            preds = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            t = targets[img_idx]
            p_t = jnp.take_along_axis(probs, t[:, None], axis=1)[:, 0]
            return preds == t, preds, p_t, jnp.max(probs, axis=-1)

        self._eval_knockout_flat = _eval_knockout_flat

    def _chunk_sizes(self, k: int):
        """Cover k masks with as few forwards as possible: full `mask_batch`
        chunks, then one power-of-two-bucketed remainder (min 32) so repeat
        workloads hit a handful of compiled shapes.

        Flat mega-batches beat a lax.scan over small chunks measurably (v5e,
        ResNet-101@224²: 7.0k evals/s at 2048 flat vs 4.5k at scan-of-128) —
        the scan serializes chunks and blocks XLA's cross-batch pipelining.
        """
        sizes = []
        while k > 0:
            if k >= self.mask_batch:
                sizes.append(self.mask_batch)
                k -= self.mask_batch
            else:
                b = 32
                while b < k:
                    b *= 2
                sizes.append(min(b, self.mask_batch))
                k = 0
        return sizes

    def _dispatch_chunked(self, fn, lead: np.ndarray, pad_value, args_before,
                          args_after):
        """Enqueue bucketed chunks of the leading array on the device WITHOUT
        fetching — returns an opaque handle for :meth:`_collect_chunked`.
        JAX dispatch is async, so the host is free to do other work (e.g.
        segment the next image) while the device churns."""
        k = lead.shape[0]
        outs = []
        off = 0
        for size in self._chunk_sizes(k):
            chunk = lead[off : off + size]
            off += len(chunk)
            if len(chunk) < size:
                pad = np.full((size - len(chunk),) + chunk.shape[1:], pad_value,
                              chunk.dtype)
                chunk = np.concatenate([chunk, pad])
            outs.append(fn(*args_before, jnp.asarray(chunk), *args_after))
        return outs, k

    def _collect_chunked(self, handle):
        """Block on a :meth:`_dispatch_chunked` handle; concatenates the
        4-tuple outcome arrays."""
        outs, k = handle
        if k == 0:
            z = np.zeros(0)
            return (z.astype(bool), z.astype(np.int32), z.astype(np.float32),
                    z.astype(np.float32))
        # ONE batched device→host fetch: per-array np.asarray readbacks pay a
        # tunnel round-trip each (~15ms on axon) — device_get amortizes them.
        outs = jax.device_get(outs)
        return tuple(
            np.concatenate([np.asarray(o[i]) for o in outs])[:k] for i in range(4)
        )

    def _run_chunked(self, fn, lead: np.ndarray, pad_value, args_before, args_after):
        return self._collect_chunked(
            self._dispatch_chunked(fn, lead, pad_value, args_before, args_after)
        )

    # -- public API ---------------------------------------------------------

    def predict_logits_device(self, images: Array) -> Array:
        """Dispatch a batched unmasked forward; returns DEVICE logits
        [B, num_classes] (async — callers can keep argmax targets as device
        scalars). The batch pads to a power of two so tail flushes of a
        sweep reuse compiled shapes instead of compiling one-off sizes."""
        images = jnp.asarray(images)
        b = images.shape[0]
        b_pad = max(1, 1 << max(b - 1, 0).bit_length())
        if b_pad > b:
            images = jnp.concatenate(
                [images,
                 jnp.broadcast_to(images[:1], (b_pad - b,) + images.shape[1:])]
            )
        return self._predict(self.variables, images)[:b]

    def predict(self, images: Array) -> np.ndarray:
        """Batched unmasked forward → f32 logits [B, num_classes]."""
        return np.asarray(self.predict_logits_device(images))

    def predict_one(self, image: Array) -> Tuple[int, np.ndarray]:
        logits = self.predict(jnp.asarray(image)[None])[0]
        return int(logits.argmax()), logits

    def eval_window_masks(
        self, image: Array, segments: Array, firsts: np.ndarray, width: int, target: int
    ) -> MaskEvalResult:
        """Evaluate K contiguous-window masks (reference window semantics,
        ``bayesian_active_learning_imagenet.py:178-185``) in ceil(K/B) batched
        forwards."""
        return self.collect(
            self.eval_window_masks_async(image, segments, firsts, width, target)
        )

    def eval_window_masks_async(
        self, image: Array, segments: Array, firsts: np.ndarray, width: int, target: int
    ):
        """Enqueue K window-mask evaluations; returns a handle for
        :meth:`collect`. The host stays free while the device computes —
        the sweep segments image i+1 during image i's forwards."""
        return self._dispatch_chunked(
            self._eval_window,
            np.asarray(firsts, np.int32),
            0,
            (self.variables, jnp.asarray(image), jnp.asarray(segments)),
            (jnp.int32(width), jnp.int32(target)),
        )

    def collect(self, handle) -> MaskEvalResult:
        """Block on an ``*_async`` handle and wrap the outcomes."""
        return self._wrap(self._collect_chunked(handle))

    def eval_knockout_masks(
        self, image: Array, segments: Array, knock_ids: np.ndarray, target: int
    ) -> MaskEvalResult:
        """Evaluate K knockout masks (reference MNIST/CIFAR semantics,
        ``generate_gp_training_data_mnist.py:218-223``)."""
        return self.collect(
            self.eval_knockout_masks_async(image, segments, knock_ids, target)
        )

    def eval_knockout_masks_async(
        self, image: Array, segments: Array, knock_ids: np.ndarray, target
    ):
        """Enqueue K knockout-mask evaluations; returns a handle for
        :meth:`collect` — the knockout twin of
        :meth:`eval_window_masks_async` (dispatch never blocks, so a sweep
        segments image i+1 during image i's forwards)."""
        return self._dispatch_chunked(
            self._eval_knockout,
            np.asarray(knock_ids, np.int32),
            -1,
            (self.variables, jnp.asarray(image), jnp.asarray(segments)),
            (jnp.int32(target),),
        )

    @staticmethod
    def _pad_image_axis(images, segments, targets, extras=()):
        """Pow-2 bucket the multi-grid image axis (zero pads — outputs trim
        to the true N·K) so sweep tail batches reuse one compiled
        executable. ``images`` may be a DEVICE array (padded without a
        fetch); ``segments``/``extras`` are per-image host arrays;
        ``targets`` may be host or device (e.g. the argmax of a
        just-dispatched batched predict) and returns as a device int32
        either way. Shared by the window and knockout multi paths."""
        if isinstance(images, jax.Array):
            images = images.astype(jnp.float32)  # device-resident: no fetch
        else:
            images = np.asarray(images, np.float32)
        segments = np.asarray(segments, np.int32)
        n = int(segments.shape[0])
        n_pad = 1
        while n_pad < n:
            n_pad *= 2
        extras = tuple(np.asarray(e) for e in extras)
        if n_pad > n:
            zpad = lambda a: np.concatenate(
                [a, np.zeros((n_pad - n,) + a.shape[1:], a.dtype)]
            )
            if isinstance(images, jax.Array):
                images = jnp.concatenate(
                    [images,
                     jnp.zeros((n_pad - n,) + images.shape[1:], images.dtype)]
                )
            else:
                images = zpad(images)
            segments = zpad(segments)
            extras = tuple(zpad(e) for e in extras)
        if isinstance(targets, jax.Array):
            if n_pad > n:
                targets = jnp.concatenate(
                    [targets, jnp.zeros(n_pad - n, targets.dtype)]
                )
        else:
            targets = np.asarray(targets, np.int32)
            if n_pad > n:
                targets = np.concatenate(
                    [targets, np.zeros(n_pad - n, np.int32)]
                )
            targets = jnp.asarray(targets)
        return (images, segments, targets) + extras

    def eval_knockout_masks_multi_async(
        self, images, segments, knock_ids, targets
    ):
        """Enqueue the N·K knockout grid; returns (handle, n, k) for
        :meth:`collect_multi`.

        Args: images [N,H,W,C] f32, segments [N,H,W] int32, knock_ids
        [N,K,M] int32, targets int32[N] (host or device — the batched sweep
        passes a device argmax so dispatch never blocks on a fetch).
        """
        knock_ids = np.asarray(knock_ids, np.int32)
        n, k, m = knock_ids.shape
        images, segments, targets = self._pad_image_axis(
            images, segments, targets)

        # rows[:, 0] = image index, rows[:, 1:] = M knock ids; chunk padding
        # fills rows with -1 (image -1 wraps to the last padded image; ids
        # -1 knock nothing) — outputs trim to the true N·K anyway.
        rows = np.concatenate(
            [
                np.repeat(np.arange(n, dtype=np.int32), k)[:, None],
                knock_ids.reshape(n * k, m),
            ],
            axis=1,
        )
        handle = self._dispatch_chunked(
            self._eval_knockout_flat,
            rows,
            -1,
            (self.variables, jnp.asarray(images), jnp.asarray(segments)),
            (targets,),
        )
        return handle, n, k

    def eval_knockout_masks_multi(self, images, segments, knock_ids, targets):
        """Evaluate K knockout masks for each of N images through the same
        pow-2-bucketed flat chunks as the window grid; returns a list of N
        MaskEvalResult."""
        handle, n, k = self.eval_knockout_masks_multi_async(
            images, segments, knock_ids, targets
        )
        return self.collect_multi(handle, n, k)

    def eval_window_masks_multi_async(
        self, images, segments, firsts, widths, targets
    ):
        """Enqueue the N·K multi-image grid; returns (handle, n, k) for
        :meth:`collect_multi`.

        ``targets`` may be a DEVICE int32[N] array (e.g. the argmax of a
        just-dispatched batched predict) — the batched sweep path uses that
        so dispatch never blocks on a prediction fetch.
        """
        firsts = np.asarray(firsts, np.int32)
        widths = np.asarray(widths, np.int32)
        n, k = firsts.shape
        images, segments, targets, widths = self._pad_image_axis(
            images, segments, targets, extras=(widths,))

        pairs = np.stack(
            [np.repeat(np.arange(n, dtype=np.int32), k), firsts.reshape(-1)],
            axis=1,
        )
        handle = self._dispatch_chunked(
            self._eval_window_flat,
            pairs,
            0,
            (self.variables, jnp.asarray(images), jnp.asarray(segments)),
            (jnp.asarray(widths), targets),
        )
        return handle, n, k

    def collect_multi(self, handle, n: int, k: int):
        """Block on an :meth:`eval_window_masks_multi_async` handle; returns
        a list of N MaskEvalResult."""
        survived, preds, p_t, p_m = self._collect_chunked(handle)
        return [
            MaskEvalResult(
                survived=survived[i * k : (i + 1) * k].astype(bool),
                preds=preds[i * k : (i + 1) * k].astype(np.int32),
                prob_target=p_t[i * k : (i + 1) * k].astype(np.float32),
                prob_max=p_m[i * k : (i + 1) * k].astype(np.float32),
            )
            for i in range(n)
        ]

    def eval_window_masks_multi(
        self, images, segments, firsts, widths, targets
    ):
        """Evaluate K window masks for each of N images, `mask_batch` at a
        time (the N·K grid flattens into the same pow-2-bucketed chunks as
        the single-image path, so memory stays bounded and the compile cache
        sees a handful of shapes regardless of (N, K)).

        Args: images [N,H,W,C] f32, segments [N,H,W] int32, firsts [N,K]
        int32, widths [N] int32, targets [N] int32.
        Returns a list of N MaskEvalResult.
        """
        handle, n, k = self.eval_window_masks_multi_async(
            images, segments, firsts, widths, targets
        )
        return self.collect_multi(handle, n, k)

    def eval_mask_bank(
        self, image: Array, masks: np.ndarray, target: int
    ) -> MaskEvalResult:
        """Evaluate an explicit bool[K, H, W] mask bank (threshold search)."""
        outs = self._run_chunked(
            self._eval_bank,
            np.asarray(masks, bool),
            False,
            (self.variables, jnp.asarray(image)),
            (jnp.int32(target),),
        )
        return self._wrap(outs)

    @staticmethod
    def _wrap(outs) -> MaskEvalResult:
        survived, preds, p_t, p_m = outs
        return MaskEvalResult(
            survived=survived.astype(bool),
            preds=preds.astype(np.int32),
            prob_target=p_t.astype(np.float32),
            prob_max=p_m.astype(np.float32),
        )
