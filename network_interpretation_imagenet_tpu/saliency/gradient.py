"""Gradient- and occlusion-based saliency (BASELINE.json config 3:
"ImageNet ResNet-18 occlusion/gradient saliency, 224×224 batched masks").

The reference carries an input-gradient oracle in commented-out form
(``gp_superpixel_data_imagenet.py:235-251``: backward to ``input_var.grad``,
top-k over channel-summed gradients); occlusion saliency is the classic
square-patch sweep — the same masked-forward engine evaluated on a regular
grid of patch masks instead of superpixel windows.

All methods are single-jit batched computations:
  * ``input_gradient`` — ∂ logit_target / ∂ pixels (one backward);
  * ``grad_times_input``, ``integrated_gradients`` (Riemann path, one
    batched forward/backward over all steps);
  * ``occlusion_map`` — P(target) drop for every patch position, evaluated
    as one scan of batched forwards.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def _target_logit_fn(logits_fn: Callable, variables: Any, target: int):
    def f(image: Array) -> Array:
        logits = logits_fn(variables, image[None]).astype(jnp.float32)[0]
        return logits[target]

    return f


def input_gradient(
    logits_fn: Callable, variables: Any, image: Array, target: int
) -> Array:
    """|∂ logit_t / ∂ x| summed over channels → f32[H, W]."""
    g = jax.grad(_target_logit_fn(logits_fn, variables, target))(
        jnp.asarray(image, jnp.float32)
    )
    return jnp.sum(jnp.abs(g), axis=-1)


def grad_times_input(
    logits_fn: Callable, variables: Any, image: Array, target: int
) -> Array:
    """|grad ⊙ input| summed over channels → f32[H, W]."""
    image = jnp.asarray(image, jnp.float32)
    g = jax.grad(_target_logit_fn(logits_fn, variables, target))(image)
    return jnp.sum(jnp.abs(g * image), axis=-1)


def _grad_mean(grad_one, stack: Array, chunk, square: bool = False) -> Array:
    """Mean of ``grad_one`` over the leading axis of ``stack``.

    ``chunk=None`` (or ≥ S) runs one vmapped backward over the whole
    stack; otherwise an exact ``lax.scan`` of ``chunk``-sized vmapped
    backwards accumulates the sum — the gradients combine LINEARLY, so the
    result is identical while live activation memory is bounded at
    ``chunk`` concurrent backwards instead of S (the knob that keeps
    N-image × S-step batched attribution inside a 16 GB chip)."""
    s = int(stack.shape[0])
    if chunk is None or int(chunk) >= s:
        grads = jax.vmap(grad_one)(stack)
        return jnp.mean(grads ** 2 if square else grads, axis=0)
    chunk = int(chunk)
    if s % chunk:
        raise ValueError(f"chunk {chunk} must divide the step/sample "
                         f"count {s}")

    def step(acc, xs):
        g = jax.vmap(grad_one)(xs)
        return acc + jnp.sum(g ** 2 if square else g, axis=0), None

    acc, _ = jax.lax.scan(
        step, jnp.zeros(stack.shape[1:], jnp.float32),
        stack.reshape(s // chunk, chunk, *stack.shape[1:]),
    )
    return acc / s


def integrated_gradients(
    logits_fn: Callable,
    variables: Any,
    image: Array,
    target: int,
    steps: int = 16,
    baseline: Optional[Array] = None,
    step_batch: Optional[int] = None,
) -> Array:
    """Integrated gradients along the straight path from ``baseline``
    (default zeros — the masked-pixel value in this framework's convention,
    see ``ops.masking.apply_masks``). One vmapped backward over all steps;
    ``step_batch`` bounds memory via exact scan accumulation
    (:func:`_grad_mean`).
    """
    image = jnp.asarray(image, jnp.float32)
    base = jnp.zeros_like(image) if baseline is None else baseline
    alphas = (jnp.arange(steps, dtype=jnp.float32) + 0.5) / steps
    path = base[None] + alphas[:, None, None, None] * (image - base)[None]

    grad_one = jax.grad(_target_logit_fn(logits_fn, variables, target))
    avg = _grad_mean(grad_one, path, step_batch)
    return jnp.sum(jnp.abs((image - base) * avg), axis=-1)


def smoothgrad(
    logits_fn: Callable,
    variables: Any,
    image: Array,
    target: int,
    samples: int = 16,
    noise_sigma: float = 0.15,
    seed: int = 0,
    magnitude: bool = False,
    sample_batch: Optional[int] = None,
) -> Array:
    """SmoothGrad (Smilkov et al., 2017): the input gradient averaged over
    Gaussian-noised copies of the image — ``noise_sigma`` is RELATIVE to
    the image's value range, the paper's convention. One vmapped backward
    over all samples (``sample_batch`` bounds memory via exact scan
    accumulation). ``magnitude=True`` averages squared gradients
    (SmoothGrad²) before the channel-sum."""
    image = jnp.asarray(image, jnp.float32)
    span = jnp.maximum(jnp.max(image) - jnp.min(image), 1e-6)
    noise = (
        jax.random.normal(jax.random.PRNGKey(seed), (samples, *image.shape))
        * noise_sigma * span
    )
    grad_one = jax.grad(_target_logit_fn(logits_fn, variables, target))
    g = _grad_mean(grad_one, image[None] + noise, sample_batch,
                   square=magnitude)
    return jnp.sum(jnp.abs(g), axis=-1)


def occlusion_map(
    logits_fn: Callable,
    variables: Any,
    image: Array,
    target: int,
    patch: "int | None" = None,
    stride: "int | None" = None,
    batch: int = 64,
    compute_dtype: Any = jnp.bfloat16,
) -> Array:
    """Classic occlusion saliency: slide a ``patch``² zero-window over the
    image; the map holds the target-probability DROP at each covered pixel
    (averaged over overlapping patches). All patch positions are evaluated
    as batched masked forwards (scan of ``batch``-sized chunks).

    ``patch=None`` → resolution-adaptive: 32 at 224² (the classic
    choice), linearly scaled to the image side with a floor of 4 — a
    fixed patch=32 on a 32×32 input admits exactly ONE position, so the
    map is constant (information-free). ``stride=None`` → ``patch // 2``
    (the classic half-overlap).
    """
    image = jnp.asarray(image, jnp.float32)
    h, w, _ = image.shape
    if patch is None:
        patch = max(4, int(round(32 * min(int(h), int(w)) / 224.0)))
    if stride is None:
        stride = max(1, patch // 2)
    ys = np.arange(0, h - patch + 1, stride, dtype=np.int32)
    xs = np.arange(0, w - patch + 1, stride, dtype=np.int32)
    pos = np.stack(np.meshgrid(ys, xs, indexing="ij"), -1).reshape(-1, 2)
    k = len(pos)
    if k == 0:
        # Zero positions would silently return an all-zero heatmap.
        raise ValueError(
            f"patch {patch} exceeds the {h}x{w} image — no occlusion "
            "positions (lower --patch)")
    pad = (-k) % batch
    pos_p = np.concatenate([pos, np.zeros((pad, 2), np.int32)]) if pad else pos
    valid = (np.arange(len(pos_p)) < k).astype(np.float32)

    base_logits = logits_fn(variables, image[None].astype(compute_dtype))
    base_prob = jax.nn.softmax(base_logits.astype(jnp.float32), -1)[0, target]

    run = _occlusion_core(logits_fn, patch, batch, compute_dtype)
    return run(
        variables, image, base_prob, jnp.int32(target),
        jnp.asarray(pos_p), jnp.asarray(valid),
    )


def _capture_intermediates(bundle, variables, image: Array):
    """One capture-mode forward → the ``intermediates`` collection."""
    _, state = bundle.module.apply(
        variables, image[None], False,
        capture_intermediates=True, mutable=["intermediates"],
    )
    return state["intermediates"]


def gradcam_target_layers(bundle, variables, image: Array) -> list:
    """Every named module whose eval-mode output is a 4D feature map, as
    ``("path/like/this", (B, h, w, c))`` pairs — the menu for
    :func:`gradcam`'s ``layer=`` argument. One capture-mode forward."""
    image = jnp.asarray(image, jnp.float32)
    return _layer_menu(_capture_intermediates(bundle, variables, image))


def _layer_menu(intermediates) -> list:
    out = []
    for path, val in jax.tree_util.tree_flatten_with_path(
            intermediates)[0]:
        names = [p.key for p in path if hasattr(p, "key")]
        if not names or names[-1] != "__call__" or len(names) < 2:
            continue  # root-level sows have no module path to intercept
        if getattr(val, "ndim", 0) == 4:
            out.append(("/".join(names[:-1]), tuple(val.shape)))
    # De-dup (sow tuples flatten to several leaves per module).
    seen, uniq = set(), []
    for name, shape in out:
        if name not in seen:
            seen.add(name)
            uniq.append((name, shape))
    return uniq


def _default_gradcam_layer(layers: list) -> str:
    """The canonical "last conv block": smallest spatial extent, then most
    channels, then the LATEST stage by natural segment order (layer4_1
    beats layer4_0; features_18 beats features_9), then the composite
    block output (shortest path) over its inner convs."""
    import re

    def nat(seg: str):
        return tuple(int(t) if t.isdigit() else t
                     for t in re.split(r"(\d+)", seg))

    min_spatial = min(s[1] * s[2] for _, s in layers)
    cands = [(n, s) for n, s in layers if s[1] * s[2] == min_spatial]
    max_ch = max(s[3] for _, s in cands)
    cands = [(n, s) for n, s in cands if s[3] == max_ch]
    top = max(cands, key=lambda ns: nat(ns[0].split("/")[0]))[0].split("/")[0]
    cands = [(n, s) for n, s in cands if n.split("/")[0] == top]
    return min(cands, key=lambda ns: len(ns[0]))[0]


def _resolve_layer_activation(
    bundle, variables: Any, image: Array, layer: Optional[str],
) -> tuple:
    """Shared CAM-family layer resolution: ONE capture forward serves both
    the layer menu and the activation fetch. ``layer=None`` picks the
    canonical last conv block (:func:`_default_gradcam_layer`); a named
    layer is validated against the menu. Returns ``(layer, act)`` with
    ``act`` the module's first sown output, shape [1, h', w', c]."""
    inter = _capture_intermediates(bundle, variables, image)
    layers = _layer_menu(inter)
    if not layers:
        raise ValueError("model exposes no 4D intermediate feature maps")
    if layer is None:
        layer = _default_gradcam_layer(layers)
    elif layer not in {n for n, _ in layers}:
        raise ValueError(
            f"unknown layer {layer!r}; available: {[n for n, _ in layers]}")
    node = inter
    for k in layer.split("/"):
        node = node[k]
    return layer, node["__call__"][0]


def gradcam(
    bundle,
    variables: Any,
    image: Array,
    target: int,
    layer: Optional[str] = None,
) -> Array:
    """Grad-CAM (Selvaraju et al., 2017), architecture-generic.

    Needs ∂logit_t/∂A for an INTERMEDIATE feature map A — no model
    surgery: the map is found with ``capture_intermediates`` (default
    ``layer=None`` picks the deepest stage — smallest spatial extent,
    then most channels, then shortest module path — the canonical "last
    conv block" across the zoo), and the gradient comes from
    differentiating w.r.t. a zero perturbation ADDED to that module's
    output via ``nn.intercept_methods``. cam = ReLU(Σ_c wᵢ·A_c) with
    w = spatial-mean of the gradient, bilinearly upsampled to the input.
    """
    import flax.linen as nn

    image = jnp.asarray(image, jnp.float32)
    layer, act = _resolve_layer_activation(bundle, variables, image, layer)
    target_path = tuple(layer.split("/"))

    def f(delta: Array) -> Array:
        def interceptor(next_fun, args, kwargs, context):
            out = next_fun(*args, **kwargs)
            if (context.module.path == target_path
                    and isinstance(out, jax.Array) and out.ndim == 4):
                out = out + delta
            return out

        with nn.intercept_methods(interceptor):
            out = bundle.module.apply(variables, image[None], False)
        if isinstance(out, tuple):
            out = out[-1]
        return out.astype(jnp.float32)[0, target]

    grads = jax.grad(f)(jnp.zeros_like(act))  # ∂y_t/∂A, [1, h, w, c]
    weights = jnp.mean(grads, axis=(1, 2))  # [1, c]
    cam = jax.nn.relu(jnp.einsum("bhwc,bc->bhw", act, weights))[0]
    return jax.image.resize(cam, image.shape[:2], method="bilinear")


def scorecam(
    bundle,
    variables: Any,
    image: Array,
    target: int,
    layer: Optional[str] = None,
    channels: int = 64,
    batch: int = 64,
    compute_dtype: Any = jnp.bfloat16,
) -> Array:
    """Score-CAM (Wang et al., 2020): gradient-FREE CAM.

    Each activation channel at the target layer (same menu/default as
    :func:`gradcam`), min-max normalized and bilinearly upsampled, becomes
    a SOFT mask over the input; the masked forward's target logit scores
    that channel, and cam = ReLU(Σ_k softmax(s)_k · A_k). No backward
    pass, so it survives non-differentiable heads, and the per-channel
    scoring is exactly this framework's batched masked-forward shape (one
    ``lax.scan`` of ``batch``-sized chunks, like RISE/occlusion).

    ``channels`` bounds the forward cost: only the top-K channels by
    spatial-max activation are scored (deep stages have 512-2048 channels;
    the rest carry near-zero activation mass). K is jit-static.
    """
    if int(channels) <= 0:
        raise ValueError(f"channels must be positive, got {channels}")
    if int(batch) <= 0:
        raise ValueError(f"batch must be positive, got {batch}")
    image = jnp.asarray(image, jnp.float32)
    _, act = _resolve_layer_activation(bundle, variables, image, layer)
    k = min(int(channels), int(act.shape[-1]))
    h, w, _ = image.shape
    # Clamp the chunk size to k: with CLI defaults (--mask-batch 1024,
    # 64 channels) an unclamped batch would pad one forward to 16x the
    # needed masks.
    run = _scorecam_core(bundle.module, k, min(int(batch), k), h, w,
                         jnp.dtype(compute_dtype).name)
    return run(variables, image, act, jnp.int32(target))


# (module, k, batch, h, w, dtype) → jitted core (see occlusion note).
_SCORECAM_CACHE: dict = {}


def _scorecam_core(module, k: int, batch: int, h: int, w: int, dtype: str):
    key_t = (module, k, batch, h, w, dtype)
    if key_t not in _SCORECAM_CACHE:
        chunks = -(-k // batch)
        pad = chunks * batch - k
        compute_dtype = jnp.dtype(dtype)

        @jax.jit
        def run(variables, image, act, target):
            a = act[0].astype(jnp.float32)  # [h', w', c]
            _, idx = jax.lax.top_k(jnp.max(a, axis=(0, 1)), k)
            sel = jnp.moveaxis(a[:, :, idx], -1, 0)  # [k, h', w']
            up = jax.image.resize(sel, (k, h, w), method="bilinear")
            mn = up.min(axis=(1, 2), keepdims=True)
            mx = up.max(axis=(1, 2), keepdims=True)
            active = (mx > mn)[:, 0, 0]  # constant channels mask to zero
            masks = (up - mn) / jnp.where(mx > mn, mx - mn, 1.0)

            padded = jnp.concatenate(
                [masks, jnp.zeros((pad, h, w), jnp.float32)]) if pad else masks

            def one_chunk(ms):
                imgs = image[None] * ms[:, :, :, None]
                logits = module.apply(
                    variables, imgs.astype(compute_dtype), False)
                if isinstance(logits, tuple):
                    logits = logits[-1]
                return logits.astype(jnp.float32)[:, target]

            scores = jax.lax.scan(
                lambda c, ms: (c, one_chunk(ms)), None,
                padded.reshape(chunks, batch, h, w),
            )[1].reshape(-1)[:k]
            # Dead (constant-activation) channels would each inject
            # exp(f(black)) into the softmax denominator, uniformly
            # diluting the live channels' weights — exclude them. (Their
            # forwards still run: k is jit-static, and top_k already
            # ranks live channels first, so they only appear when fewer
            # than k channels are active at all.)
            scores = jnp.where(active, scores, -jnp.inf)
            weights = jnp.where(
                jnp.any(active), jax.nn.softmax(scores),
                jnp.zeros_like(scores))
            return jax.nn.relu(jnp.einsum("k,khw->hw", weights, up))

        _SCORECAM_CACHE[key_t] = run
    return _SCORECAM_CACHE[key_t]


def rise_map(
    logits_fn: Callable,
    variables: Any,
    image: Array,
    target: int,
    num_masks: int = 1000,
    grid: int = 7,
    keep_prob: float = 0.5,
    batch: int = 250,
    seed: int = 0,
    compute_dtype: Any = jnp.bfloat16,
) -> Array:
    """RISE (Petsiuk et al., 2018): random ``grid``² Bernoulli(keep_prob)
    patterns, bilinearly upsampled with a random sub-cell shift into SOFT
    [0,1] masks; the saliency map is the target-probability-weighted
    average of the masks, ``Σ pᵢ·Mᵢ / (N·keep_prob)``. Everything runs on
    device: mask generation (bernoulli → ``jax.image.resize`` → vmapped
    dynamic crop), batched soft-masked forwards, and the weighted
    accumulation — one ``lax.scan`` of ``batch``-sized chunks.

    ``num_masks`` rounds UP to a multiple of ``batch`` (the actual count
    normalizes the map, so this only adds samples)."""
    image = jnp.asarray(image, jnp.float32)
    h, w, _ = image.shape
    chunks = -(-num_masks // batch)
    run = _rise_core(logits_fn, int(grid), int(batch), int(chunks), h, w,
                     compute_dtype)
    return run(
        variables, image, jnp.int32(target), jax.random.PRNGKey(seed),
        jnp.float32(keep_prob),
    )


# (logits_fn, grid, batch, chunks, h, w, dtype) → jitted core (see
# occlusion note; chunks is the static scan length).
_RISE_CACHE: dict = {}


def _rise_core(logits_fn, grid: int, batch: int, chunks: int, h: int,
               w: int, compute_dtype):
    key_t = (logits_fn, grid, batch, chunks, h, w,
             jnp.dtype(compute_dtype).name)
    if key_t not in _RISE_CACHE:
        # Upsample target: one extra cell so a random sub-cell shift always
        # leaves a full h×w crop (the paper's anti-gridding jitter).
        ch, cw = -(-h // grid), -(-w // grid)
        up_h, up_w = (grid + 1) * ch, (grid + 1) * cw
        n_total = float(chunks * batch)

        @jax.jit
        def run(variables, image, target, key, keep_prob):
            def one_chunk(key):
                kg, ky, kx = jax.random.split(key, 3)
                cells = jax.random.bernoulli(
                    kg, keep_prob, (batch, grid, grid)
                ).astype(jnp.float32)
                big = jax.image.resize(
                    cells, (batch, up_h, up_w), method="bilinear"
                )
                oy = jax.random.randint(ky, (batch,), 0, ch)
                ox = jax.random.randint(kx, (batch,), 0, cw)
                crop = jax.vmap(
                    lambda m, y, x: jax.lax.dynamic_slice(m, (y, x), (h, w))
                )(big, oy, ox)  # [B, h, w] soft masks in [0, 1]
                imgs = image[None] * crop[:, :, :, None]
                logits = logits_fn(variables, imgs.astype(compute_dtype))
                probs = jax.nn.softmax(
                    logits.astype(jnp.float32), -1)[:, target]
                return jnp.einsum("k,khw->hw", probs, crop)

            def step(carry, _):
                key, acc = carry
                key, sub = jax.random.split(key)
                return (key, acc + one_chunk(sub)), None

            (_, heat), _ = jax.lax.scan(
                step, (key, jnp.zeros((h, w), jnp.float32)), None,
                length=chunks,
            )
            return heat / (n_total * keep_prob)

        _RISE_CACHE[key_t] = run
    return _RISE_CACHE[key_t]


# (logits_fn, patch, batch, dtype) → jitted core: image/target/base_prob are
# traced operands, so a sweep of occlusion maps traces and compiles ONCE.
_OCCLUSION_CACHE: dict = {}


def _occlusion_core(logits_fn, patch: int, batch: int, compute_dtype):
    key = (logits_fn, int(patch), int(batch), jnp.dtype(compute_dtype).name)
    if key not in _OCCLUSION_CACHE:

        @jax.jit
        def run(variables, image, base_prob, target, pos_arr, valid_arr):
            h, w = image.shape[0], image.shape[1]
            rows = jnp.arange(h)[:, None]
            cols = jnp.arange(w)[None, :]

            def step(_, chunk):
                py, px = chunk[:, 0], chunk[:, 1]
                inside = (
                    (rows[None] >= py[:, None, None])
                    & (rows[None] < (py + patch)[:, None, None])
                    & (cols[None] >= px[:, None, None])
                    & (cols[None] < (px + patch)[:, None, None])
                )
                imgs = image[None] * (~inside)[:, :, :, None].astype(image.dtype)
                logits = logits_fn(variables, imgs.astype(compute_dtype))
                probs = jax.nn.softmax(logits.astype(jnp.float32), -1)[:, target]
                return None, (probs, inside)

            _, (probs, insides) = jax.lax.scan(
                step, None, pos_arr.reshape(-1, batch, 2)
            )
            probs = probs.reshape(-1)
            insides = (insides.reshape(-1, h, w).astype(jnp.float32)
                       * valid_arr[:, None, None])
            drop = jnp.maximum(base_prob - probs, 0.0)
            heat = jnp.einsum("k,khw->hw", drop, insides)
            count = jnp.maximum(jnp.sum(insides, axis=0), 1.0)
            return heat / count

        _OCCLUSION_CACHE[key] = run
    return _OCCLUSION_CACHE[key]


# ---------------------------------------------------------------------------
# Batched attribution: N images' backward passes as ONE program
# ---------------------------------------------------------------------------

#: Methods `attribute_batch` can vmap (the per-image fn is pure in
#: (variables, image, target, seed); occlusion/rise/scorecam batch
#: internally over masks instead and stay per-image).
BATCHABLE_METHODS = ("gradient", "grad_input", "integrated", "smoothgrad",
                     "gradcam")

#: Per-image methods whose device program batches over MASKS internally.
#: Sweeps run them as ONE program per flush that ``lax.map``s the
#: per-image computation over the image axis — sequential per image, so
#: live activation memory stays at ONE image's mask chunk (an N-way vmap
#: would multiply it by the image bucket with no throughput win: each
#: chunk already fills the chip — same reasoning as serving.py's
#: batched-export exclusion), while the flush still costs one dispatch
#: and one stacked fetch (per-image dispatch pays a tunnel RTT per
#: eager op on remote-attached chips — measured 10× the program cost).
MASK_BATCHED_METHODS = ("occlusion", "rise", "scorecam")

# (method, logits_fn/bundle, hyperparams) → jitted per-image program.
_MASK_ONE_CACHE: dict = {}
# (+ bucket, shape, mesh) → jitted lax.map program for sweeps.
_MASK_BATCH_CACHE: dict = {}


def _mask_one_body(
    logits_fn,
    bundle,
    method: str,
    *,
    # None = occlusion_map's resolution-adaptive defaults (32 at 224²
    # scaled to the image side, stride = patch//2).
    patch: "int | None" = None,
    stride: "int | None" = None,
    rise_masks: int = 1000,
    rise_grid: int = 7,
    rise_keep_prob: float = 0.5,
    mask_batch: Optional[int] = None,
    gradcam_layer: Optional[str] = None,
    scorecam_channels: int = 64,
):
    """Unjitted ``(variables, image, target, seed) -> f32[H, W]`` body for
    a :data:`MASK_BATCHED_METHODS` method, hyperparameters closed over —
    the traceable unit :func:`mask_method_one_fn` jits per image and
    :func:`mask_method_batch` ``lax.map``s per flush. Results match the
    one-shot fns exactly: same ops traced, and rise's masks derive from
    ``PRNGKey(seed)`` with the same chunk structure whenever
    ``mask_batch`` matches the one-shot ``batch``.

    ``mask_batch=None`` keeps each method's one-shot default chunk
    (occlusion/scorecam 64, rise 250). ``scorecam`` needs ``bundle``;
    ``gradcam_layer=None`` resolves the canonical deepest conv stage
    inside the trace (static — same menu logic as :func:`scorecam`).
    NOTE for rise: the sampled masks are a function of (seed, mask_batch,
    rise_masks) — changing the chunk size changes the random masks, so
    sweeps must treat ``mask_batch`` as a method hyperparameter, not a
    tuning knob, if reproducibility matters.
    """
    if method not in MASK_BATCHED_METHODS:
        raise ValueError(f"unknown mask-batched method {method!r}; choose "
                         f"from {MASK_BATCHED_METHODS}")
    if method == "scorecam" and bundle is None:
        raise ValueError("method='scorecam' needs bundle=")
    if method == "occlusion":
        b = 64 if mask_batch is None else int(mask_batch)

        def one(v, img, t, s):
            return occlusion_map(logits_fn, v, img, t, patch=patch,
                                 stride=stride, batch=b)
    elif method == "rise":
        b = 250 if mask_batch is None else int(mask_batch)

        def one(v, img, t, s):
            return rise_map(logits_fn, v, img, t, num_masks=rise_masks,
                            grid=rise_grid, keep_prob=rise_keep_prob,
                            batch=b, seed=s)
    else:  # scorecam
        b = 64 if mask_batch is None else int(mask_batch)

        def one(v, img, t, s):
            return scorecam(bundle, v, img, t, layer=gradcam_layer,
                            channels=scorecam_channels, batch=b)

    return one


def _mask_cfg_key(logits_fn, bundle, method, kw):
    def _i(name, default):
        # patch/stride may be None (= occlusion_map's resolution-adaptive
        # default, resolved at trace time from the static image shape) —
        # a distinct, valid cache key, NOT coercible to int.
        v = kw.get(name, default)
        return None if v is None else int(v)

    return (method, bundle if method == "scorecam" else logits_fn,
            _i("patch", None), _i("stride", None),
            int(kw.get("rise_masks", 1000)), int(kw.get("rise_grid", 7)),
            float(kw.get("rise_keep_prob", 0.5)), kw.get("mask_batch"),
            kw.get("gradcam_layer"), int(kw.get("scorecam_channels", 64)))


def mask_method_one_fn(logits_fn, bundle, method: str, **kw):
    """ONE jitted ``(variables, image, target, seed) -> f32[H, W]`` program
    for a :data:`MASK_BATCHED_METHODS` method — the whole method
    (occlusion's baseline forward, scorecam's capture forward + layer
    resolution, rise's key derivation) lowers into one program instead of
    the one-shot fns' eager preamble. See :func:`_mask_one_body` for the
    hyperparameters and RNG contract."""
    key = _mask_cfg_key(logits_fn, bundle, method, kw)
    if key not in _MASK_ONE_CACHE:
        _MASK_ONE_CACHE[key] = jax.jit(
            _mask_one_body(logits_fn, bundle, method, **kw))
    return _MASK_ONE_CACHE[key]


def mask_method_batch(
    logits_fn,
    variables,
    images,
    targets,
    method: str,
    *,
    bundle=None,
    seeds=None,
    mesh=None,
    data_axis: str = "data",
    **kw,
) -> Array:
    """N images' mask-batched attributions as ONE device program →
    f32[N, H, W]: ``lax.map`` (sequential scan, NOT vmap) of the
    per-image body over the image axis, so live memory stays at one
    image's mask chunk while the flush costs a single dispatch + one
    stacked fetch — the sweep-scale entry for
    :data:`MASK_BATCHED_METHODS`. Shares the pow-2 bucket scaffolding of
    :func:`attribute_batch` (per-image results are bit-identical across
    flush compositions: the scan body is per-image). With ``mesh`` the
    padded image axis shards over ``data_axis`` and each device maps its
    shard sequentially. Hyperparameters as in :func:`_mask_one_body`."""
    images, targets, seeds, n, bucket = _image_batch_scaffold(
        images, targets, seeds, mesh, data_axis)
    if n == 0:
        return jnp.zeros((0,) + images.shape[1:3], jnp.float32)
    key = _mask_cfg_key(logits_fn, bundle, method, kw) + (
        bucket, images.shape[1:], mesh, data_axis)
    if key not in _MASK_BATCH_CACHE:
        one = _mask_one_body(logits_fn, bundle, method, **kw)

        def run(v, imgs, ts, ss):
            return jax.lax.map(lambda a: one(v, *a), (imgs, ts, ss))

        if mesh is None:
            _MASK_BATCH_CACHE[key] = jax.jit(run)
        else:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            _MASK_BATCH_CACHE[key] = jax.jit(shard_map(
                run,
                mesh=mesh,
                in_specs=(P(), P(data_axis), P(data_axis), P(data_axis)),
                out_specs=P(data_axis),
                check_vma=False,
            ))
    return _MASK_BATCH_CACHE[key](variables, images, targets, seeds)[:n]

# (method, fn/bundle, hyperparams, bucket, shape, mesh, axis) → jitted
# vmapped (optionally shard_map'd) core — one compile per pow-2 image
# bucket, shared across sweep flushes (see the occlusion-cache note).
_ATTR_BATCH_CACHE: dict = {}

# (bundle, image shape) → resolved default gradcam layer. The menu is a
# pure function of the architecture and input shape, but resolving it costs
# a full capture forward — cached so per-flush attribute_batch(gradcam)
# calls pay it once per process, not once per flush.
_GRADCAM_LAYER_CACHE: dict = {}


def default_gradcam_layer(bundle, variables, image_shape) -> str:
    """The canonical deepest-conv-stage layer for ``bundle`` at
    ``image_shape`` (H, W, C) — what ``gradcam(layer=None)`` picks —
    resolved once per (bundle, shape) and cached. Raises ``ValueError``
    when the model exposes no 4D intermediate (gradcam can't apply)."""
    key = (bundle, tuple(image_shape))
    if key not in _GRADCAM_LAYER_CACHE:
        menu = gradcam_target_layers(
            bundle, variables, jnp.zeros(image_shape, jnp.float32))
        if not menu:
            raise ValueError(
                f"{bundle.name}: no 4D intermediate feature map — gradcam "
                "needs a conv stage")
        _GRADCAM_LAYER_CACHE[key] = _default_gradcam_layer(menu)
    return _GRADCAM_LAYER_CACHE[key]


def _image_batch_scaffold(images, targets, seeds, mesh, data_axis: str,
                          min_bucket: int = 8):
    """Shared validate/bucket/pad scaffolding for the image-batched
    programs (``attribute_batch``, ``learned_mask_batch_dispatch``):
    f32 [N, H, W, C] images + int32 [N] targets/seeds pad to the next
    power of two ≥ max(N, ``min_bucket``), rounded up to a multiple of
    the mesh's data axis when sharding. ``min_bucket=8`` (default) makes
    every ≤8-image composition share ONE executable — the property that
    keeps per-image results BIT-identical across flush compositions
    (tail flushes, skip patterns); pass ``min_bucket=1`` when a pad lane
    costs a full real lane (learned-mask Adam loops) and low-order float
    drift across compositions is acceptable. Returns
    ``(images, targets, seeds, n, bucket)`` with results to trim
    ``[:n]``."""
    images = jnp.asarray(images, jnp.float32)
    if images.ndim != 4:
        raise ValueError(f"images must be [N, H, W, C], got {images.shape}")
    n = int(images.shape[0])
    targets = jnp.asarray(targets, jnp.int32)
    seeds = (jnp.zeros(n, jnp.int32) if seeds is None
             else jnp.asarray(seeds, jnp.int32))
    if targets.shape != (n,) or seeds.shape != (n,):
        raise ValueError(
            f"targets/seeds must be [N={n}], got {targets.shape} / "
            f"{seeds.shape}")
    if n == 0:
        return images, targets, seeds, 0, 0
    bucket = max(int(min_bucket), 1 << (n - 1).bit_length())
    if mesh is not None:
        d = int(mesh.shape[data_axis])
        bucket = -(-bucket // d) * d  # shard_map needs d | N_padded
    if bucket > n:
        # Pad lanes rerun image 0 (real data keeps every lane numerically
        # boring-free: an all-zero pad image can NaN through normalize-by-
        # range paths like smoothgrad's span guard).
        pad = bucket - n
        images = jnp.concatenate(
            [images, jnp.broadcast_to(images[0], (pad,) + images.shape[1:])])
        targets = jnp.concatenate([targets, jnp.zeros(pad, jnp.int32)])
        seeds = jnp.concatenate([seeds, jnp.zeros(pad, jnp.int32)])
    return images, targets, seeds, n, bucket


def _jit_image_batched(one_fn, mesh, data_axis: str):
    """jit (or shard_map over the mesh's data axis, weights replicated) of
    ``vmap(one_fn)`` with the uniform (variables, images, targets, seeds)
    signature — the other half of the shared scaffolding."""
    batched = jax.vmap(one_fn, in_axes=(None, 0, 0, 0))
    if mesh is None:
        return jax.jit(batched)
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    return jax.jit(shard_map(
        batched,
        mesh=mesh,
        in_specs=(P(), P(data_axis), P(data_axis), P(data_axis)),
        out_specs=P(data_axis),
        check_vma=False,
    ))


def _attr_one_fn(logits_fn, bundle, method: str, steps: int, samples: int,
                 noise_sigma: float, magnitude: bool, gradcam_layer,
                 step_batch=None, sample_batch=None):
    """Per-image ``(variables, image, target, seed) → f32[H, W]`` with the
    hyperparameters closed over (jit-static), uniform across methods so one
    vmap signature serves all of ``BATCHABLE_METHODS``."""
    if method == "gradient":
        return lambda v, img, t, s: input_gradient(logits_fn, v, img, t)
    if method == "grad_input":
        return lambda v, img, t, s: grad_times_input(logits_fn, v, img, t)
    if method == "integrated":
        return lambda v, img, t, s: integrated_gradients(
            logits_fn, v, img, t, steps=steps, step_batch=step_batch)
    if method == "smoothgrad":
        return lambda v, img, t, s: smoothgrad(
            logits_fn, v, img, t, samples=samples, noise_sigma=noise_sigma,
            seed=s, magnitude=magnitude, sample_batch=sample_batch)
    return lambda v, img, t, s: gradcam(bundle, v, img, t,
                                        layer=gradcam_layer)


def attribute_batch(
    logits_fn: Callable,
    variables: Any,
    images: Array,
    targets,
    method: str = "gradient",
    *,
    bundle=None,
    steps: int = 16,
    samples: int = 16,
    noise_sigma: float = 0.15,
    magnitude: bool = False,
    gradcam_layer: Optional[str] = None,
    seeds=None,
    mesh=None,
    data_axis: str = "data",
    step_batch: Optional[int] = None,
    sample_batch: Optional[int] = None,
) -> Array:
    """N images' attribution maps in ONE device program → f32[N, H, W].

    The per-image backward (``input_gradient`` / ``grad_times_input`` /
    ``integrated_gradients`` / ``smoothgrad`` / ``gradcam``) vmaps over the
    image axis, so a val-set sweep runs N backward passes per dispatch
    instead of N dispatches — the attribution twin of the engine's flat
    N·K mask grid (``saliency/engine.py``). N pads to the next power of
    two ≥ N, floor 8 (results trim back) — one executable covers every
    ≤8-image composition, which keeps per-image results BIT-identical
    across flush compositions (different batch shapes may reassociate
    low-order float ops). With ``mesh`` the padded image axis additionally shards over
    ``data_axis`` via ``shard_map`` (variables replicate; no collectives
    — each device runs its slice's vmapped program), the same composition
    as ``kron.fit_posterior_batch``.

    ``seeds`` (int32[N], default zeros) feeds stochastic methods only;
    derive them from dataset indices for flush-invariant sweeps.
    ``step_batch``/``sample_batch`` bound integrated/smoothgrad memory at
    N·chunk concurrent backwards via exact scan accumulation
    (:func:`_grad_mean`) — without them an N×S batched IG holds N·S
    backwards' activations live at once.
    ``gradcam_layer=None`` resolves the canonical deepest conv stage ONCE
    (host-side, on ``images[0]``) — pass ``bundle`` for gradcam.
    """
    if method not in BATCHABLE_METHODS:
        raise ValueError(f"unknown batchable method {method!r}; choose "
                         f"from {BATCHABLE_METHODS}")
    images, targets, seeds, n, bucket = _image_batch_scaffold(
        images, targets, seeds, mesh, data_axis)
    if n == 0:
        return jnp.zeros((0,) + images.shape[1:3], jnp.float32)
    if method == "gradcam":
        if bundle is None:
            raise ValueError("method='gradcam' needs bundle=")
        if gradcam_layer is None:
            # The layer is jit-static: resolve the menu's default once per
            # (bundle, shape), cached — repeat flushes skip the capture
            # forward entirely.
            gradcam_layer = default_gradcam_layer(
                bundle, variables, images.shape[1:])

    key = (method, bundle if method == "gradcam" else logits_fn,
           int(steps), int(samples), float(noise_sigma), bool(magnitude),
           gradcam_layer, bucket, images.shape[1:], mesh, data_axis,
           step_batch, sample_batch)
    if key not in _ATTR_BATCH_CACHE:
        one = _attr_one_fn(logits_fn, bundle, method, int(steps),
                           int(samples), float(noise_sigma), bool(magnitude),
                           gradcam_layer, step_batch, sample_batch)
        _ATTR_BATCH_CACHE[key] = _jit_image_batched(one, mesh, data_axis)
    return _ATTR_BATCH_CACHE[key](variables, images, targets, seeds)[:n]
