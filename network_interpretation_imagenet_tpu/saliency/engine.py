"""The masked-forward engine — this framework's hot kernel.

Reference hot loop (``generate_gp_training_data_imagenet.py:221-267``): per
sample, build ONE mask with a Python loop, run ONE CUDA forward, write ONE
PNG, repeat 100-1000×, with host↔device round-trips at every step. The BO
path is worse — it re-iterates the whole val dataset per sample
(``bayesian_active_learning_imagenet.py:126-129``).

TPU redesign: the image and segment map live on device; masks are *fused*
into the forward — each `lax.scan` step builds a [B, H, W] mask chunk from
window starts by pure comparison (never materializing the full [K, H, W]
bank in HBM), multiplies it into the image broadcast, and runs one batched
bf16 forward on the MXU. Per-mask survive labels, predictions, and target
probabilities come back as arrays; aggregation is an einsum downstream.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Optional, Tuple

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


def _pad_to_multiple(x: np.ndarray, b: int, fill) -> Tuple[np.ndarray, int]:
    k = x.shape[0]
    pad = (-k) % b
    if pad:
        x = np.concatenate([x, np.full((pad,) + x.shape[1:], fill, x.dtype)])
    return x, k


class SaliencyEngine:
    """Owns jitted compute for one classifier (params resident on device)."""

    def __init__(
        self,
        bundle: ModelBundle,
        variables: Any,
        mask_batch: int = 128,
        compute_dtype: Any = jnp.bfloat16,
        use_pallas_masking: bool = False,
    ) -> None:
        self.bundle = bundle
        self.mask_batch = int(mask_batch)
        self.compute_dtype = compute_dtype
        self.use_pallas_masking = use_pallas_masking
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

        use_pallas = use_pallas_masking

        @jax.jit
        def _eval_window(variables, image, segments, firsts, width, target):
            def step(_, f_chunk):
                if use_pallas:
                    from network_interpretation_imagenet_tpu.ops.pallas_masking import (
                        masked_batch_pallas,
                    )

                    imgs = masked_batch_pallas(
                        image, segments, f_chunk, width, out_dtype=compute_dtype
                    )
                else:
                    masks = masking.window_masks(segments, f_chunk, width)
                    imgs = masking.apply_masks(image, masks).astype(compute_dtype)
                return None, _outcomes(apply_fn(variables, imgs), target)

            chunks = firsts.reshape(-1, self.mask_batch)
            _, outs = jax.lax.scan(step, None, chunks)
            return tuple(o.reshape(-1) for o in outs)

        self._eval_window = _eval_window

        @jax.jit
        def _eval_knockout(variables, image, segments, knock_ids, target):
            def step(_, ids_chunk):
                masks = masking.knockout_masks(segments, ids_chunk)
                imgs = masking.apply_masks(image, masks).astype(compute_dtype)
                return None, _outcomes(apply_fn(variables, imgs), target)

            chunks = knock_ids.reshape(-1, self.mask_batch, knock_ids.shape[-1])
            _, outs = jax.lax.scan(step, None, chunks)
            return tuple(o.reshape(-1) for o in outs)

        self._eval_knockout = _eval_knockout

        @jax.jit
        def _eval_bank(variables, image, masks, target):
            def step(_, m_chunk):
                imgs = masking.apply_masks(image, m_chunk).astype(compute_dtype)
                return None, _outcomes(apply_fn(variables, imgs), target)

            chunks = masks.reshape(
                -1, self.mask_batch, masks.shape[-2], masks.shape[-1]
            )
            _, outs = jax.lax.scan(step, None, chunks)
            return tuple(o.reshape(-1) for o in outs)

        self._eval_bank = _eval_bank

    # -- public API ---------------------------------------------------------

    def predict(self, images: Array) -> np.ndarray:
        """Batched unmasked forward → f32 logits [B, num_classes]."""
        return np.asarray(self._predict(self.variables, jnp.asarray(images)))

    def predict_one(self, image: Array) -> Tuple[int, np.ndarray]:
        logits = self.predict(jnp.asarray(image)[None])[0]
        return int(logits.argmax()), logits

    def eval_window_masks(
        self, image: Array, segments: Array, firsts: np.ndarray, width: int, target: int
    ) -> MaskEvalResult:
        """Evaluate K contiguous-window masks (reference window semantics,
        ``bayesian_active_learning_imagenet.py:178-185``) in ceil(K/B) batched
        forwards."""
        firsts_p, k = _pad_to_multiple(
            np.asarray(firsts, np.int32), self.mask_batch, 0
        )
        outs = self._eval_window(
            self.variables,
            jnp.asarray(image),
            jnp.asarray(segments),
            jnp.asarray(firsts_p),
            jnp.int32(width),
            jnp.int32(target),
        )
        return self._trim(outs, k)

    def eval_knockout_masks(
        self, image: Array, segments: Array, knock_ids: np.ndarray, target: int
    ) -> MaskEvalResult:
        """Evaluate K knockout masks (reference MNIST/CIFAR semantics,
        ``generate_gp_training_data_mnist.py:218-223``)."""
        ids_p, k = _pad_to_multiple(
            np.asarray(knock_ids, np.int32), self.mask_batch, -1
        )
        outs = self._eval_knockout(
            self.variables,
            jnp.asarray(image),
            jnp.asarray(segments),
            jnp.asarray(ids_p),
            jnp.int32(target),
        )
        return self._trim(outs, k)

    def eval_mask_bank(
        self, image: Array, masks: np.ndarray, target: int
    ) -> MaskEvalResult:
        """Evaluate an explicit bool[K, H, W] mask bank (threshold search)."""
        masks_p, k = _pad_to_multiple(
            np.asarray(masks, bool), self.mask_batch, False
        )
        outs = self._eval_bank(
            self.variables, jnp.asarray(image), jnp.asarray(masks_p), jnp.int32(target)
        )
        return self._trim(outs, k)

    @staticmethod
    def _trim(outs, k: int) -> MaskEvalResult:
        survived, preds, p_t, p_m = (np.asarray(o)[:k] for o in outs)
        return MaskEvalResult(
            survived=survived.astype(bool),
            preds=preds,
            prob_target=p_t.astype(np.float32),
            prob_max=p_m.astype(np.float32),
        )
