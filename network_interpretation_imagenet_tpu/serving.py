"""AOT serving artifacts for the masked-forward engine.

Production deployments shouldn't need the Python model zoo (or its compile
times) on the serving host. ``export_engine`` ahead-of-time lowers the
engine's fused mask-build + batched-classifier forward to serialized
StableHLO (``jax.export``) — one artifact per mask-batch bucket — alongside a
msgpack weight blob and a JSON manifest. ``load_exported`` reconstructs a
server with the same ``eval_window_masks`` contract as
:class:`saliency.engine.SaliencyEngine`, chunking requests over the exported
buckets; no flax/model code runs at load time, and the XLA compile happened
at export time (deserialize+first-call is ~4 s vs 30-170 s cold compiles).

Artifacts are weight-agnostic: parameters are call-time arguments, so one
export serves every fine-tune of the same architecture.

The reference has no serving story — its closest analogue is re-running the
whole script per image (``bayesian_active_learning_imagenet.py:379-498``).
"""

from __future__ import annotations

import functools
import json
import os
from typing import Any, Sequence, Tuple

import numpy as np

MANIFEST = "manifest.json"
WEIGHTS = "variables.msgpack"


def _flatten_batches(total: int, buckets: Sequence[int]) -> Sequence[int]:
    """Cover `total` masks with exported bucket sizes, minimizing dispatches
    first and padding second — per-call latency dominates at serving scale,
    so one padded 256-call beats eight 32-calls for a 255-mask tail."""
    bs = sorted(set(int(b) for b in buckets), reverse=True)

    @functools.lru_cache(maxsize=None)
    def plan(r: int):
        if r == 0:
            return ()
        best = None
        for b in bs:
            cand = (b,) if b >= r else (b,) * (r // b) + plan(r % b)
            key = (len(cand), sum(cand))
            if best is None or key < best[0]:
                best = (key, cand)
        return best[1]

    return list(plan(int(total)))


def export_engine(
    engine,
    out_dir: str,
    batch_sizes: Sequence[int] = (1024, 256, 32),
    include_weights: bool = True,
    host_variables: Any = None,
    input_size: int = None,
    knockout_m: int = 0,
    attribution: Sequence[str] = (),
    attribution_cfg: dict = None,
    attribution_batches: Sequence[int] = (),
) -> dict:
    """Serialize the engine's window-mask forward for serving.

    Writes ``masked_forward_{B}.stablehlo`` per bucket, ``variables.msgpack``
    (unless ``include_weights=False``), and ``manifest.json``. Returns the
    manifest dict.

    ``knockout_m > 0`` additionally exports knockout-mask forwards
    (``knockout_forward_{B}_m{M}.stablehlo`` — the reference's MNIST/CIFAR
    mask family, M segments knocked out per mask; M=1 for MNIST, 5 for
    CIFAR), served by ``logits_for_knockouts``/``eval_knockout_masks``.
    Requests with fewer than M knockouts per mask pad columns with the -1
    sentinel (knocks out nothing), so one exported M covers any m ≤ M.

    Pass ``host_variables`` (the numpy pytree you device_put into the engine,
    e.g. straight from ``convert_checkpoint``) to skip fetching weights back
    off the device — on remote-tunnel TPU setups that readback runs at
    ~1 MB/s and dominates the export.

    ``input_size`` overrides the bundle's native resolution — StableHLO is
    lowered for ONE static shape, so an inception_v3 engine (native 299²)
    serving a 224² data pipeline must export at 224 (every zoo model is
    global-pooled, so any resolution traces). The chosen size is recorded in
    the manifest and enforced by the loader at call time.

    ``attribution`` exports attribution programs
    (``attr_{method}.stablehlo``, uniform signature ``(variables, image,
    target, seed) → f32[H, W]``) from the FULL per-image family: the
    gradient methods {gradient, grad_input, integrated, smoothgrad,
    gradcam} plus the mask-batched ones {scorecam, occlusion, rise} and
    the Fong-Vedaldi learned deletion mask {meaningful} (its entire Adam
    loop ships as one program) — backward passes, intermediate-capture
    interceptors, and optimizer loops all live INSIDE the AOT program, so
    a serving host explains without the model zoo or autodiff setup.
    ``"xrai"`` exports its device half — the signed multi-baseline IG
    program (``attr_xrai_ig.stablehlo``) — plus a manifest entry with the
    ranking parameters; the felzenszwalb ladder + greedy region ranking
    run host-side in :meth:`ExportedSaliencyServer.xrai` (no model zoo or
    autodiff needed there either).
    ``attribution_cfg`` fixes the jit-static hyperparameters
    (``ig_steps``/``sg_samples``/``sg_sigma``/``gradcam_layer``; the layer
    defaults to the menu's deepest conv stage, resolved at export time and
    recorded in the manifest). ``attribution_batches=(N,...)`` additionally
    exports image-BATCHED programs (``attr_{method}_b{N}.stablehlo``, the
    vmapped N-image twin of ``gradient.attribute_batch``) served by
    ``attribute_many``/``POST /attribute_batch`` — N backwards per device
    call instead of N calls.
    """
    import jax
    import jax.numpy as jnp
    from flax import serialization
    from jax import export as jexport

    from network_interpretation_imagenet_tpu.ops import masking

    bundle = engine.bundle
    compute_dtype = engine.compute_dtype
    apply_fn = bundle.logits

    def masked_forward(variables, image, segments, firsts, width):
        masks = masking.window_masks(segments, firsts, width)
        imgs = masking.apply_masks(image, masks).astype(compute_dtype)
        return apply_fn(variables, imgs).astype(jnp.float32)

    os.makedirs(out_dir, exist_ok=True)
    h = w = int(input_size) if input_size else bundle.input_size
    c = bundle.input_channels
    var_spec = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(np.shape(a), a.dtype), engine.variables
    )
    files = {}
    for b in sorted(set(int(b) for b in batch_sizes), reverse=True):
        exp = jexport.export(jax.jit(masked_forward))(
            var_spec,
            jax.ShapeDtypeStruct((h, w, c), jnp.float32),
            jax.ShapeDtypeStruct((h, w), jnp.int32),
            jax.ShapeDtypeStruct((b,), jnp.int32),
            jax.ShapeDtypeStruct((), jnp.int32),
        )
        fname = f"masked_forward_{b}.stablehlo"
        with open(os.path.join(out_dir, fname), "wb") as f:
            f.write(exp.serialize())
        files[str(b)] = fname

    knockout_m = int(knockout_m)
    knockout_files = {}
    if knockout_m > 0:

        def knockout_forward(variables, image, segments, knock_ids):
            masks = masking.knockout_masks(segments, knock_ids)
            imgs = masking.apply_masks(image, masks).astype(compute_dtype)
            return apply_fn(variables, imgs).astype(jnp.float32)

        for b in sorted(set(int(b) for b in batch_sizes), reverse=True):
            exp = jexport.export(jax.jit(knockout_forward))(
                var_spec,
                jax.ShapeDtypeStruct((h, w, c), jnp.float32),
                jax.ShapeDtypeStruct((h, w), jnp.int32),
                jax.ShapeDtypeStruct((b, knockout_m), jnp.int32),
            )
            fname = f"knockout_forward_{b}_m{knockout_m}.stablehlo"
            with open(os.path.join(out_dir, fname), "wb") as f:
                f.write(exp.serialize())
            knockout_files[str(b)] = fname

    attribution = tuple(attribution)
    if attribution_batches and not attribution:
        raise ValueError(
            "attribution_batches needs attribution=[...] methods to export")
    attr_files = {}
    attr_cfg = {}
    attr_batched = {}
    xrai_entry = {}
    if attribution:
        from network_interpretation_imagenet_tpu.saliency import (
            gradient as grad_mod,
        )

        supported = ("gradient", "grad_input", "integrated", "smoothgrad",
                     "gradcam", "scorecam", "occlusion", "rise",
                     "meaningful", "xrai")
        unknown = [m for m in attribution if m not in supported]
        if unknown:
            raise ValueError(f"unsupported attribution methods {unknown}; "
                             f"choose from {supported}")
        attr_cfg = {
            # gradient family
            "ig_steps": 16, "sg_samples": 16, "sg_sigma": 0.15,
            "gradcam_layer": None,
            # mask-batched methods (forward chunk shared via mask_batch)
            # occ None = resolution-adaptive at the artifact input size
            # (occlusion_map: 32 at 224² scaled, stride patch//2).
            "mask_batch": 64, "occ_patch": None, "occ_stride": None,
            "rise_masks": 500, "rise_grid": 7, "rise_keep": 0.5,
            "scorecam_channels": 64,
            # learned deletion mask (Fong-Vedaldi)
            "lm_mask_size": 28, "lm_iters": 150, "lm_lr": 0.1,
            "lm_l1": 0.05, "lm_tv": 0.1, "lm_jitter": 4,
            "lm_baseline": "blur",
            # XRAI: host-side greedy-ranking parameters, recorded in the
            # manifest and applied by the serving host (only the signed-IG
            # half is a device program). None → xrai.adaptive_scales for
            # the artifact's input resolution.
            "xrai_scales": None, "xrai_min_area": 4,
        }
        bad_keys = set(attribution_cfg or {}) - set(attr_cfg)
        if bad_keys:
            # A typo'd/unsupported hyperparameter would be recorded in the
            # manifest as if the exported programs honored it.
            raise ValueError(
                f"unknown attribution_cfg keys {sorted(bad_keys)}; "
                f"supported: {sorted(attr_cfg)}")
        attr_cfg.update(attribution_cfg or {})
        if (attr_cfg["gradcam_layer"] is None
                and {"gradcam", "scorecam"} & set(attribution)):
            # The CAM layer must be jit-static: resolve the menu's default
            # at export time, record it in the manifest.
            attr_cfg["gradcam_layer"] = grad_mod.default_gradcam_layer(
                bundle, engine.variables, (h, w, c))

        def _meaningful_fn(v, img, t, s):
            from network_interpretation_imagenet_tpu.saliency import (
                learned_mask as lm,
            )

            run = lm._learned_mask_core(
                apply_fn, int(attr_cfg["lm_mask_size"]),
                int(attr_cfg["lm_iters"]), float(attr_cfg["lm_lr"]),
                float(attr_cfg["lm_l1"]), float(attr_cfg["lm_tv"]), 3.0,
                max(int(attr_cfg["lm_jitter"]), 1)
                if attr_cfg["lm_jitter"] else 1,
                4 if attr_cfg["lm_jitter"] else 0, h, w,
                np.dtype(compute_dtype).name)
            base = (lm.gaussian_blur(img, 10.0)
                    if attr_cfg["lm_baseline"] == "blur"
                    else jnp.zeros_like(img))
            m, _, _, _ = run(v, img, base, t, jax.random.PRNGKey(s))
            return 1.0 - jax.image.resize(m, (h, w), method="bilinear")

        def _attr_fn(method):
            if method == "gradient":
                return lambda v, img, t, s: grad_mod.input_gradient(
                    apply_fn, v, img, t)
            if method == "grad_input":
                return lambda v, img, t, s: grad_mod.grad_times_input(
                    apply_fn, v, img, t)
            if method == "integrated":
                return lambda v, img, t, s: grad_mod.integrated_gradients(
                    apply_fn, v, img, t, steps=attr_cfg["ig_steps"])
            if method == "smoothgrad":
                return lambda v, img, t, s: grad_mod.smoothgrad(
                    apply_fn, v, img, t, samples=attr_cfg["sg_samples"],
                    noise_sigma=attr_cfg["sg_sigma"], seed=s)
            if method == "gradcam":
                return lambda v, img, t, s: grad_mod.gradcam(
                    bundle, v, img, t, layer=attr_cfg["gradcam_layer"])
            if method == "scorecam":
                return lambda v, img, t, s: grad_mod.scorecam(
                    bundle, v, img, t, layer=attr_cfg["gradcam_layer"],
                    channels=attr_cfg["scorecam_channels"],
                    batch=attr_cfg["mask_batch"],
                    compute_dtype=compute_dtype)
            if method == "occlusion":
                return lambda v, img, t, s: grad_mod.occlusion_map(
                    apply_fn, v, img, t, patch=attr_cfg["occ_patch"],
                    stride=attr_cfg["occ_stride"],
                    batch=attr_cfg["mask_batch"],
                    compute_dtype=compute_dtype)
            if method == "rise":
                return lambda v, img, t, s: grad_mod.rise_map(
                    apply_fn, v, img, t,
                    num_masks=attr_cfg["rise_masks"],
                    grid=attr_cfg["rise_grid"],
                    keep_prob=attr_cfg["rise_keep"],
                    batch=attr_cfg["mask_batch"], seed=s,
                    compute_dtype=compute_dtype)
            return _meaningful_fn

        if "xrai" in attribution:
            # XRAI is two halves by design (r3 exclusion now closed): the
            # expensive half — signed multi-baseline IG, mean over the
            # black/white pair — exports as ONE device program; the
            # felzenszwalb ladder + greedy density ranking are host work
            # the serving host runs around it (serving_http already runs
            # host code, so this keeps the no-model-code contract:
            # ExportedSaliencyServer.xrai needs neither the zoo nor
            # autodiff). Ranking parameters ride the manifest.
            from network_interpretation_imagenet_tpu.saliency import (
                xrai as xrai_mod,
            )

            if attr_cfg["xrai_scales"] is None:
                # Area-adaptive for the artifact's input resolution
                # (DEFAULT_SCALES is a 224² calibration).
                attr_cfg["xrai_scales"] = [
                    float(s) for s in xrai_mod.adaptive_scales(h, w)
                ]

            def _xrai_ig(v, img, t, s):
                return xrai_mod.xrai_attribution(
                    apply_fn, v, img, t, steps=attr_cfg["ig_steps"])

            exp = jexport.export(jax.jit(_xrai_ig))(
                var_spec,
                jax.ShapeDtypeStruct((h, w, c), jnp.float32),
                jax.ShapeDtypeStruct((), jnp.int32),
                jax.ShapeDtypeStruct((), jnp.int32),
            )
            fname = "attr_xrai_ig.stablehlo"
            with open(os.path.join(out_dir, fname), "wb") as f:
                f.write(exp.serialize())
            xrai_entry = {
                "file": fname,
                "scales": [float(s) for s in attr_cfg["xrai_scales"]],
                "min_area": int(attr_cfg["xrai_min_area"]),
                "steps": int(attr_cfg["ig_steps"]),
            }

        for method in dict.fromkeys(m for m in attribution if m != "xrai"):
            exp = jexport.export(jax.jit(_attr_fn(method)))(
                var_spec,
                jax.ShapeDtypeStruct((h, w, c), jnp.float32),
                jax.ShapeDtypeStruct((), jnp.int32),
                jax.ShapeDtypeStruct((), jnp.int32),
            )
            fname = f"attr_{method}.stablehlo"
            with open(os.path.join(out_dir, fname), "wb") as f:
                f.write(exp.serialize())
            attr_files[method] = fname

        # Batched exports cover the gradient family only: the mask-batched
        # methods (occlusion/rise/scorecam) and the learned-mask loop
        # already saturate the chip per image, so vmapping them over N
        # multiplies memory without a throughput win.
        from network_interpretation_imagenet_tpu.saliency.gradient import (
            BATCHABLE_METHODS,
        )

        for nb in sorted(set(int(b) for b in attribution_batches)):
            if nb < 2:
                raise ValueError(
                    f"attribution_batches entries must be >= 2 (got {nb}); "
                    "the per-image program already covers N=1")
            for method in dict.fromkeys(
                    m for m in attribution if m in BATCHABLE_METHODS):
                exp = jexport.export(
                    jax.jit(jax.vmap(_attr_fn(method),
                                     in_axes=(None, 0, 0, 0)))
                )(
                    var_spec,
                    jax.ShapeDtypeStruct((nb, h, w, c), jnp.float32),
                    jax.ShapeDtypeStruct((nb,), jnp.int32),
                    jax.ShapeDtypeStruct((nb,), jnp.int32),
                )
                fname = f"attr_{method}_b{nb}.stablehlo"
                with open(os.path.join(out_dir, fname), "wb") as f:
                    f.write(exp.serialize())
                attr_batched.setdefault(method, {})[str(nb)] = fname

    if include_weights:
        if host_variables is None:
            host_variables = getattr(engine, "host_variables", None)
        host_vars = jax.tree.map(
            np.asarray,
            host_variables if host_variables is not None
            else jax.device_get(engine.variables),
        )
        with open(os.path.join(out_dir, WEIGHTS), "wb") as f:
            f.write(serialization.msgpack_serialize(host_vars))

    manifest = {
        "arch": bundle.name,
        "num_classes": bundle.num_classes,
        # The size the artifact was LOWERED for (may differ from the arch's
        # native resolution when input_size= overrode it at export time).
        "input_size": h,
        "native_input_size": bundle.input_size,
        "input_channels": bundle.input_channels,
        "compute_dtype": np.dtype(compute_dtype).name,
        "batch_sizes": sorted(files, key=int, reverse=True),
        "files": files,
        "knockout_m": knockout_m,
        "knockout_files": knockout_files,
        "attribution": {"files": attr_files, "config": attr_cfg,
                        "batched_files": attr_batched,
                        "xrai": xrai_entry},
        "weights": WEIGHTS if include_weights else None,
        # The artifact is lowered for the exporting platform only; the
        # loader fails fast on a mismatched host instead of erroring deep
        # inside XLA at first call.
        "export_platform": jax.default_backend(),
    }
    with open(os.path.join(out_dir, MANIFEST), "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest


class ExportedSaliencyServer:
    """Serves window-mask evaluations from an exported artifact directory.

    Mirrors the outcome contract of ``SaliencyEngine.eval_window_masks``:
    (survived, preds, prob_target, prob_max) numpy arrays trimmed to K.
    """

    def __init__(self, path: str, variables: Any = None) -> None:
        import jax
        from flax import serialization
        from jax import export as jexport

        from network_interpretation_imagenet_tpu.utils.compile_cache import (
            enable_compilation_cache,
        )

        # The artifact is StableHLO: XLA still compiles it on first call per
        # process. The persistent cache makes that a one-time cost per
        # machine instead of per process.
        enable_compilation_cache()
        with open(os.path.join(path, MANIFEST)) as f:
            self.manifest = json.load(f)
        exported_on = self.manifest.get("export_platform")
        if exported_on and exported_on != jax.default_backend():
            raise ValueError(
                f"artifact was exported for platform {exported_on!r} but "
                f"this host's backend is {jax.default_backend()!r}; "
                "re-export on a matching host"
            )
        self._fns = {}
        for b, fname in self.manifest["files"].items():
            with open(os.path.join(path, fname), "rb") as f:
                self._fns[int(b)] = jexport.deserialize(f.read())
        self.knockout_m = int(self.manifest.get("knockout_m", 0))
        self._ko_fns = {}
        for b, fname in self.manifest.get("knockout_files", {}).items():
            with open(os.path.join(path, fname), "rb") as f:
                self._ko_fns[int(b)] = jexport.deserialize(f.read())
        attr = self.manifest.get("attribution") or {}
        self.attribution_config = attr.get("config", {})
        self._attr_fns = {}
        for method, fname in attr.get("files", {}).items():
            with open(os.path.join(path, fname), "rb") as f:
                self._attr_fns[method] = jexport.deserialize(f.read())
        self._attr_batched = {}
        for method, per_n in attr.get("batched_files", {}).items():
            for nb, fname in per_n.items():
                with open(os.path.join(path, fname), "rb") as f:
                    self._attr_batched.setdefault(method, {})[int(nb)] = (
                        jexport.deserialize(f.read()))
        self.xrai_config = attr.get("xrai") or None
        self._xrai_ig = None
        if self.xrai_config:
            with open(os.path.join(path, self.xrai_config["file"]),
                      "rb") as f:
                self._xrai_ig = jexport.deserialize(f.read())
        if variables is None:
            wpath = self.manifest.get("weights")
            if not wpath:
                raise ValueError(
                    "artifact has no bundled weights; pass variables="
                )
            with open(os.path.join(path, wpath), "rb") as f:
                variables = serialization.msgpack_restore(f.read())
        # Device-resident weights: serving calls must not re-upload the
        # parameter tree (100 MB/call for ResNet-50 — measured 4.9 s/call
        # through a remote tunnel vs 60 ms with resident weights).
        self.variables = jax.device_put(variables)
        self.buckets = sorted(self._fns, reverse=True)
        self.ko_buckets = sorted(self._ko_fns, reverse=True)

    def _chunked_logits(self, fns, buckets, rows, pad_value, call):
        """Cover K mask rows with fewest-dispatch bucket chunks (tails pad
        with ``pad_value`` rows and trim), then ONE batched device→host
        fetch — per-chunk np.asarray readbacks pay a round-trip each
        (engine._collect_chunked measures ~15 ms/fetch through a remote
        tunnel). Shared by the window and knockout paths."""
        import jax

        k = len(rows)
        outs = []
        off = 0
        for b in _flatten_batches(k, buckets):
            chunk = rows[off : off + b]
            off += len(chunk)
            if len(chunk) < b:
                pad = np.full(
                    (b - len(chunk),) + rows.shape[1:], pad_value, np.int32
                )
                chunk = np.concatenate([chunk, pad])
            outs.append(call(fns[b], chunk))
            if off >= k:
                break
        return np.concatenate(jax.device_get(outs))[:k]

    def warmup(self) -> int:
        """Execute every loaded program once on zero inputs so first-request
        latency moves to startup (XLA compiles a StableHLO artifact on first
        call per process; the persistent cache makes repeats cheap). Returns
        the number of programs touched."""
        import jax
        import jax.numpy as jnp

        h = int(self.manifest["input_size"])
        c = int(self.manifest["input_channels"])
        image = jnp.zeros((h, h, c), jnp.float32)
        segments = jnp.zeros((h, h), jnp.int32)
        n = 0
        for b in self.buckets:
            jax.block_until_ready(self._fns[b].call(
                self.variables, image, segments,
                jnp.zeros((b,), jnp.int32), jnp.int32(1),
            ))
            n += 1
        for b in self.ko_buckets:
            jax.block_until_ready(self._ko_fns[b].call(
                self.variables, image, segments,
                jnp.full((b, self.knockout_m), -1, jnp.int32),
            ))
            n += 1
        for fn in self._attr_fns.values():
            jax.block_until_ready(fn.call(
                self.variables, image, jnp.int32(0), jnp.int32(0)
            ))
            n += 1
        for per_n in self._attr_batched.values():
            for nb, fn in per_n.items():
                jax.block_until_ready(fn.call(
                    self.variables,
                    jnp.zeros((nb, h, h, c), jnp.float32),
                    jnp.zeros((nb,), jnp.int32),
                    jnp.zeros((nb,), jnp.int32),
                ))
                n += 1
        if self._xrai_ig is not None:
            jax.block_until_ready(self._xrai_ig.call(
                self.variables, image, jnp.int32(0), jnp.int32(0)
            ))
            n += 1
        return n

    def logits_for_windows(
        self, image, segments, firsts, width: int
    ) -> np.ndarray:
        """f32 [K, num_classes] logits for K window masks."""
        import jax.numpy as jnp

        firsts = np.asarray(firsts, np.int32)
        if len(firsts) == 0:  # engine contract: K=0 → empty typed result
            return np.zeros((0, self.manifest["num_classes"]), np.float32)
        image = jnp.asarray(image, jnp.float32)
        segments = jnp.asarray(segments, jnp.int32)
        width = jnp.int32(width)
        return self._chunked_logits(
            self._fns, self.buckets, firsts, 0,
            lambda fn, chunk: fn.call(
                self.variables, image, segments, jnp.asarray(chunk), width
            ),
        )

    @staticmethod
    def _result_from_logits(logits: np.ndarray, target: int):
        from network_interpretation_imagenet_tpu.saliency.engine import (
            MaskEvalResult,
        )

        z = logits - logits.max(axis=-1, keepdims=True)
        probs = np.exp(z) / np.exp(z).sum(axis=-1, keepdims=True)
        preds = logits.argmax(axis=-1).astype(np.int32)
        return MaskEvalResult(
            survived=preds == target,
            preds=preds,
            prob_target=probs[:, target].astype(np.float32),
            prob_max=probs.max(axis=-1).astype(np.float32),
        )

    def eval_window_masks(self, image, segments, firsts, width: int, target: int):
        """Drop-in substitute for ``SaliencyEngine.eval_window_masks``:
        returns the same :class:`MaskEvalResult` dataclass (attribute access
        — ``.survived``, ``.prob_target`` — works on either object)."""
        logits = self.logits_for_windows(image, segments, firsts, width)
        return self._result_from_logits(logits, target)

    def logits_for_knockouts(self, image, segments, knock_ids) -> np.ndarray:
        """f32 [K, num_classes] logits for K knockout masks
        (``knock_ids`` int32[K, m], m ≤ the exported ``knockout_m``; short
        rows pad with the -1 sentinel, which knocks out nothing)."""
        import jax.numpy as jnp

        if not self._ko_fns:
            raise ValueError(
                "artifact has no knockout forwards; re-export with "
                "knockout_m=M (CLI: --knockout-m)"
            )
        knock_ids = np.asarray(knock_ids, np.int32)
        if knock_ids.ndim != 2:
            raise ValueError(f"knock_ids must be [K, m], got {knock_ids.shape}")
        k, m = knock_ids.shape
        if m > self.knockout_m:
            raise ValueError(
                f"knock_ids has m={m} knockouts per mask but the artifact "
                f"was exported with knockout_m={self.knockout_m}; re-export"
            )
        if k == 0:
            return np.zeros((0, self.manifest["num_classes"]), np.float32)
        if m < self.knockout_m:
            knock_ids = np.concatenate(
                [knock_ids,
                 np.full((k, self.knockout_m - m), -1, np.int32)], axis=1
            )
        image = jnp.asarray(image, jnp.float32)
        segments = jnp.asarray(segments, jnp.int32)
        return self._chunked_logits(
            self._ko_fns, self.ko_buckets, knock_ids, -1,
            lambda fn, chunk: fn.call(
                self.variables, image, segments, jnp.asarray(chunk)
            ),
        )

    def eval_knockout_masks(self, image, segments, knock_ids, target: int):
        """Drop-in substitute for ``SaliencyEngine.eval_knockout_masks``
        (same :class:`MaskEvalResult` contract)."""
        logits = self.logits_for_knockouts(image, segments, knock_ids)
        return self._result_from_logits(logits, target)

    @property
    def attribution_methods(self) -> tuple:
        """Gradient-family attribution programs bundled in this artifact
        (empty unless exported with ``attribution=...``)."""
        return tuple(sorted(self._attr_fns))

    def attribute(self, image, target: int, method: str,
                  seed: int = 0) -> np.ndarray:
        """f32 [H, W] attribution heatmap from the artifact's AOT
        ``attr_{method}.stablehlo`` program — same math as the live
        ``saliency.gradient`` functions (the backward pass is baked into
        the exported program, so no model zoo or autodiff setup is needed
        on this host). ``seed`` only affects stochastic methods
        (smoothgrad); hyperparameters are fixed at export time
        (``self.attribution_config``)."""
        import jax
        import jax.numpy as jnp

        if method not in self._attr_fns:
            raise ValueError(
                f"artifact has no {method!r} attribution program "
                f"(available: {list(self.attribution_methods)}); re-export "
                "with attribution=[...] (CLI: --attribution)"
            )
        nc = int(self.manifest["num_classes"])
        if not 0 <= int(target) < nc:
            # Inside the exported program logits[target] lowers to a
            # CLAMPED gather — an out-of-range target would silently
            # return the last class's heatmap.
            raise ValueError(f"target {target} out of range [0, {nc})")
        out = self._attr_fns[method].call(
            self.variables, jnp.asarray(image, jnp.float32),
            jnp.int32(target), jnp.int32(seed),
        )
        return np.asarray(jax.device_get(out), np.float32)

    def attribute_many(self, images, targets, method: str, seeds=None):
        """N attribution heatmaps with the execution strategy chosen in
        ONE place: the smallest exported image-batched program that fits
        (N > 1, exported via ``attribution_batches``; pads by repeating
        entry 0 and trims back), else N sequential :meth:`attribute`
        calls. Returns ``(f32[N, H, W], device_calls)``."""
        import jax
        import jax.numpy as jnp

        images = np.asarray(images, np.float32)
        if images.ndim != 4:
            raise ValueError(f"images must be [N, H, W, C], got "
                             f"{images.shape}")
        n = int(images.shape[0])
        targets = [int(t) for t in targets]
        seeds = [0] * n if seeds is None else [int(x) for x in seeds]
        if len(targets) != n or len(seeds) != n:
            raise ValueError(
                f"targets/seeds must have length N={n}, got "
                f"{len(targets)}/{len(seeds)}")
        if n == 0:
            h = int(self.manifest["input_size"])
            return np.zeros((0, h, h), np.float32), 0
        usable = [b for b in sorted(self._attr_batched.get(method, {}))
                  if b >= n]
        if n == 1 or not usable:
            heats = np.stack([
                self.attribute(images[i], targets[i], method, seed=seeds[i])
                for i in range(n)
            ])
            return heats, n
        nc = int(self.manifest["num_classes"])
        bad = [t for t in targets if not 0 <= t < nc]
        if bad:
            raise ValueError(f"targets {bad} out of range [0, {nc})")
        if method not in self._attr_fns:  # exported sets always match, but
            raise ValueError(             # hand-built artifacts might not
                f"artifact has no {method!r} attribution program "
                f"(available: {list(self.attribution_methods)})")
        n_pad = usable[0]
        if n_pad > n:
            reps = n_pad - n
            images = np.concatenate(
                [images, np.repeat(images[:1], reps, axis=0)])
            targets = targets + [0] * reps
            seeds = seeds + [0] * reps
        out = self._attr_batched[method][n_pad].call(
            self.variables, jnp.asarray(images),
            jnp.asarray(targets, jnp.int32), jnp.asarray(seeds, jnp.int32),
        )
        return np.asarray(jax.device_get(out), np.float32)[:n], 1

    def xrai(self, image, target: int, display=None, seed: int = 0):
        """Full XRAI from the artifact: the signed multi-baseline IG runs
        as the AOT ``attr_xrai_ig.stablehlo`` program; the felzenszwalb
        ladder + greedy density ranking run host-side with the SAME code
        the live path uses (``saliency.xrai.greedy_region_ranking``), with
        scales/min_area fixed at export time (``self.xrai_config``).
        ``display`` is the uint8 image the ladder segments (the live
        :func:`saliency.xrai.xrai_saliency` convention); when None it is
        derived by min-max scaling ``image`` — segmentation only needs
        relative contrasts. Returns :class:`saliency.xrai.XraiResult`."""
        import jax
        import jax.numpy as jnp

        from network_interpretation_imagenet_tpu.ops import aggregate
        from network_interpretation_imagenet_tpu.saliency import (
            xrai as xrai_mod,
        )
        from network_interpretation_imagenet_tpu.segment import (
            felzenszwalb_ladder,
        )

        if self._xrai_ig is None:
            raise ValueError(
                "artifact has no XRAI program; re-export with "
                "attribution=['xrai', ...] (CLI: --attribution xrai)"
            )
        nc = int(self.manifest["num_classes"])
        if not 0 <= int(target) < nc:
            # Same clamped-gather hazard as :meth:`attribute`.
            raise ValueError(f"target {target} out of range [0, {nc})")
        attr = np.asarray(jax.device_get(self._xrai_ig.call(
            self.variables, jnp.asarray(image, jnp.float32),
            jnp.int32(target), jnp.int32(seed),
        )), np.float32)
        if display is None:
            display = aggregate.normalize_to_uint8_np(np.asarray(image))
        # The same scale→min_size ladder as xrai_saliency (one shared
        # edge build+sort across scales).
        seg_maps = felzenszwalb_ladder(display, self.xrai_config["scales"],
                                       sigma=0.5)
        heat, n = xrai_mod.greedy_region_ranking(
            attr, seg_maps, min_area=int(self.xrai_config["min_area"]))
        return xrai_mod.XraiResult(heatmap=heat, attribution=attr,
                                   num_regions=n)


def load_exported(path: str, variables: Any = None) -> ExportedSaliencyServer:
    return ExportedSaliencyServer(path, variables)


# ---------------------------------------------------------------------------
# Fused-BO artifact: the flagship active-learning loop, AOT
# ---------------------------------------------------------------------------

BO_MANIFEST = "bo_manifest.json"


def export_bo_engine(
    engine,
    out_dir: str,
    bo_cfg=None,
    candidate_buckets: Sequence[int] = (32, 64),
    proposals_per_iter: int = 1,
    include_weights: bool = True,
    host_variables: Any = None,
    image_batches: Sequence[int] = (),
) -> dict:
    """AOT-export the ENTIRE fused BO loop (GP refits + EI argmax + dedup +
    classifier forwards inside one program — the reference's flagship
    ``bayesian_active_learning_imagenet.py:379-498`` flow) as StableHLO, one
    artifact per pow-2 candidate bucket, plus a batch-1 predict for target
    inference. A serving host can then explain images with zero model-zoo /
    flax code and no cold compile.

    ``image_batches`` additionally exports image-BATCHED loop programs
    (``make_fused_window_bo(batch_images=True)`` — N vmapped loops whose
    per-iteration forwards batch N·q masked images on the MXU, the local
    path's measured 5.9× per-image win at N=16) plus an N-image predict
    head per batch size, enabling ``ExportedBOServer.explain_batch``.
    """
    import jax
    import jax.numpy as jnp
    from flax import serialization
    from jax import export as jexport

    from network_interpretation_imagenet_tpu.bo.loop import (
        make_fused_window_bo,
        next_pow2,
    )
    from network_interpretation_imagenet_tpu.config import BOConfig

    bo_cfg = bo_cfg or BOConfig()
    bundle = engine.bundle
    compute_dtype = engine.compute_dtype

    def apply_fn(variables, imgs):
        return bundle.logits(variables, imgs.astype(compute_dtype))

    os.makedirs(out_dir, exist_ok=True)
    h = w = bundle.input_size
    c = bundle.input_channels
    var_spec = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(np.shape(a), a.dtype), engine.variables
    )
    img_spec = jax.ShapeDtypeStruct((h, w, c), jnp.float32)
    seg_spec = jax.ShapeDtypeStruct((h, w), jnp.int32)
    i32 = jax.ShapeDtypeStruct((), jnp.int32)
    key_spec = jax.ShapeDtypeStruct((2,), jnp.uint32)

    files = {}
    for cbucket in sorted({next_pow2(int(cb)) for cb in candidate_buckets}):
        run = make_fused_window_bo(
            apply_fn, cbucket,
            n_pre_samples=bo_cfg.n_pre_samples, n_iters=bo_cfg.n_iters,
            alpha=bo_cfg.alpha, epsilon=bo_cfg.epsilon,
            lengthscale_grid=bo_cfg.lengthscale_grid,
            proposals_per_iter=proposals_per_iter,
        )
        exp = jexport.export(run)(
            var_spec, img_spec, seg_spec, i32, i32, i32, key_spec
        )
        fname = f"fused_bo_{cbucket}.stablehlo"
        with open(os.path.join(out_dir, fname), "wb") as f:
            f.write(exp.serialize())
        files[str(cbucket)] = fname

    # Pure pow-2 ceiling (no min-8 floor — that floor is for candidate
    # buckets); matches bo_window_saliency_multi's image-axis padding.
    n_batches = sorted({
        1 << (int(n) - 1).bit_length() for n in image_batches if int(n) > 0
    })
    batched_files: dict = {}
    batched_predicts: dict = {}
    for n in n_batches:
        imgs_spec = jax.ShapeDtypeStruct((n, h, w, c), jnp.float32)
        segs_spec = jax.ShapeDtypeStruct((n, h, w), jnp.int32)
        vec_i32 = jax.ShapeDtypeStruct((n,), jnp.int32)
        keys_spec = jax.ShapeDtypeStruct((n, 2), jnp.uint32)
        per_bucket = {}
        for cbucket in sorted({next_pow2(int(cb)) for cb in candidate_buckets}):
            run_n = make_fused_window_bo(
                apply_fn, cbucket,
                n_pre_samples=bo_cfg.n_pre_samples, n_iters=bo_cfg.n_iters,
                alpha=bo_cfg.alpha, epsilon=bo_cfg.epsilon,
                lengthscale_grid=bo_cfg.lengthscale_grid,
                proposals_per_iter=proposals_per_iter,
                batch_images=True,
            )
            exp = jexport.export(run_n)(
                var_spec, imgs_spec, segs_spec, vec_i32, vec_i32, vec_i32,
                keys_spec,
            )
            fname = f"fused_bo_{cbucket}_n{n}.stablehlo"
            with open(os.path.join(out_dir, fname), "wb") as f:
                f.write(exp.serialize())
            per_bucket[str(cbucket)] = fname
        batched_files[str(n)] = per_bucket

        def predict_n(variables, images):
            return apply_fn(variables, images).astype(jnp.float32)

        exp_pn = jexport.export(jax.jit(predict_n))(var_spec, imgs_spec)
        pname = f"predict_{n}.stablehlo"
        with open(os.path.join(out_dir, pname), "wb") as f:
            f.write(exp_pn.serialize())
        batched_predicts[str(n)] = pname

    def predict1(variables, image):
        return apply_fn(variables, image[None]).astype(jnp.float32)[0]

    exp_p = jexport.export(jax.jit(predict1))(var_spec, img_spec)
    with open(os.path.join(out_dir, "predict_1.stablehlo"), "wb") as f:
        f.write(exp_p.serialize())

    if include_weights:
        if host_variables is None:
            host_variables = getattr(engine, "host_variables", None)
        host_vars = jax.tree.map(
            np.asarray,
            host_variables if host_variables is not None
            else jax.device_get(engine.variables),
        )
        with open(os.path.join(out_dir, WEIGHTS), "wb") as f:
            f.write(serialization.msgpack_serialize(host_vars))

    manifest = {
        "arch": bundle.name,
        "num_classes": bundle.num_classes,
        "input_size": bundle.input_size,
        "input_channels": bundle.input_channels,
        "compute_dtype": np.dtype(compute_dtype).name,
        "bo": {
            "n_pre_samples": bo_cfg.n_pre_samples,
            "n_iters": bo_cfg.n_iters,
            "proposals_per_iter": proposals_per_iter,
        },
        "candidate_buckets": sorted(files, key=int),
        "files": files,
        "image_batches": [str(n) for n in n_batches],
        "batched_files": batched_files,
        "batched_predicts": batched_predicts,
        "predict": "predict_1.stablehlo",
        # A weights blob already in the directory (e.g. written by a prior
        # export_engine call sharing this artifact dir) is referenced even
        # when this export skipped writing one.
        "weights": WEIGHTS
        if include_weights or os.path.exists(os.path.join(out_dir, WEIGHTS))
        else None,
        "export_platform": jax.default_backend(),
    }
    with open(os.path.join(out_dir, BO_MANIFEST), "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest


class ExportedBOServer:
    """Serves full BO saliency explanations from an exported artifact.

    ``explain(image, segments, ...)`` reproduces
    ``saliency.bo_pipeline.bo_window_saliency`` (fused path): pick the
    smallest exported candidate bucket ≥ upper+1, run the AOT loop, assemble
    the summed heatmap on host.
    """

    def __init__(self, path: str, variables: Any = None) -> None:
        import jax
        from flax import serialization
        from jax import export as jexport

        from network_interpretation_imagenet_tpu.utils.compile_cache import (
            enable_compilation_cache,
        )

        enable_compilation_cache()
        with open(os.path.join(path, BO_MANIFEST)) as f:
            self.manifest = json.load(f)
        exported_on = self.manifest.get("export_platform")
        if exported_on and exported_on != jax.default_backend():
            raise ValueError(
                f"artifact was exported for platform {exported_on!r} but "
                f"this host's backend is {jax.default_backend()!r}; "
                "re-export on a matching host"
            )
        self._fns = {}
        for cb, fname in self.manifest["files"].items():
            with open(os.path.join(path, fname), "rb") as f:
                self._fns[int(cb)] = jexport.deserialize(f.read())
        # Image-batched programs: {n: {cbucket: fn}} + {n: predict_fn}.
        self._batched_fns = {}
        for n, per_bucket in self.manifest.get("batched_files", {}).items():
            fns = {}
            for cb, fname in per_bucket.items():
                with open(os.path.join(path, fname), "rb") as f:
                    fns[int(cb)] = jexport.deserialize(f.read())
            self._batched_fns[int(n)] = fns
        self._batched_predicts = {}
        for n, fname in self.manifest.get("batched_predicts", {}).items():
            with open(os.path.join(path, fname), "rb") as f:
                self._batched_predicts[int(n)] = jexport.deserialize(f.read())
        with open(os.path.join(path, self.manifest["predict"]), "rb") as f:
            self._predict = jexport.deserialize(f.read())
        if variables is None:
            wpath = self.manifest.get("weights")
            if not wpath:
                raise ValueError(
                    "artifact has no bundled weights; pass variables="
                )
            with open(os.path.join(path, wpath), "rb") as f:
                variables = serialization.msgpack_restore(f.read())
        self.variables = jax.device_put(variables)
        self.buckets = sorted(self._fns)

    def warmup(self) -> int:
        """Execute every loaded program (predict heads + single and batched
        BO loops) once on zero inputs — see
        ``ExportedSaliencyServer.warmup``. Returns the program count."""
        import jax
        import jax.numpy as jnp

        h = int(self.manifest["input_size"])
        c = int(self.manifest["input_channels"])
        image = jnp.zeros((h, h, c), jnp.float32)
        segments = jnp.zeros((h, h), jnp.int32)
        key = jax.random.PRNGKey(0)
        one = jnp.int32(1)
        n = 1
        jax.block_until_ready(self._predict.call(self.variables, image))
        for fn in self._fns.values():
            jax.block_until_ready(fn.call(
                self.variables, image, segments, one, jnp.int32(0), one, key
            ))
            n += 1
        for nb, fns in self._batched_fns.items():
            imgs = jnp.zeros((nb, h, h, c), jnp.float32)
            segs = jnp.zeros((nb, h, h), jnp.int32)
            ones = jnp.ones((nb,), jnp.int32)
            keys = jax.random.split(key, nb)
            for fn in fns.values():
                jax.block_until_ready(fn.call(
                    self.variables, imgs, segs, ones,
                    jnp.zeros((nb,), jnp.int32), ones, keys,
                ))
                n += 1
        for nb, fn in self._batched_predicts.items():
            jax.block_until_ready(fn.call(
                self.variables, jnp.zeros((nb, h, h, c), jnp.float32)
            ))
            n += 1
        return n

    def predict_logits(self, image) -> np.ndarray:
        """f32 [num_classes] logits from the bundled batch-1 predict head
        (the artifact's target-inference path, public for callers that need
        the target before/without an explain — e.g. the HTTP service)."""
        import jax.numpy as jnp

        return np.asarray(
            self._predict.call(self.variables, jnp.asarray(image, jnp.float32))
        )

    def predict_logits_batch(self, images) -> np.ndarray:
        """f32 [n, num_classes] logits via the smallest exported N-image
        predict head ≥ n (pads by repeating image 0); falls back to n
        batch-1 calls when the artifact has no batched heads."""
        import jax.numpy as jnp

        images = np.asarray(images, np.float32)
        n = images.shape[0]
        usable = [b for b in sorted(self._batched_predicts) if b >= n]
        if not usable:
            return np.stack([self.predict_logits(img) for img in images])
        n_pad = usable[0]
        if n_pad > n:
            images = np.concatenate(
                [images, np.repeat(images[:1], n_pad - n, axis=0)]
            )
        logits = self._batched_predicts[n_pad].call(
            self.variables, jnp.asarray(images)
        )
        return np.asarray(logits)[:n]

    def explain(
        self,
        image,
        segments,
        window_fraction: float = 0.4,
        seed: int = 0,
        target: Any = None,
    ):
        """→ (SaliencyOutput, BOResult), the bo_window_saliency contract."""
        import jax
        import jax.numpy as jnp

        from network_interpretation_imagenet_tpu.bo.loop import BOResult
        from network_interpretation_imagenet_tpu.saliency.bo_pipeline import (
            _assemble_output,
        )

        segments = np.asarray(segments, np.int32)
        s = int(segments.max()) + 1
        width = int(window_fraction * s)
        upper = int(0.6 * s)
        usable = [b for b in self.buckets if b >= upper + 1]
        if not usable:
            raise ValueError(
                f"image needs a candidate bucket >= {upper + 1}; exported "
                f"buckets: {self.buckets} — re-export with a larger bucket"
            )
        image = jnp.asarray(image, jnp.float32)
        seg_dev = jnp.asarray(segments)
        if target is None:
            target = int(self.predict_logits(image).argmax())
        xs, ys, survived, count = self._fns[usable[0]].call(
            self.variables, image, seg_dev, jnp.int32(width),
            jnp.int32(int(target)), jnp.int32(upper),
            jax.random.PRNGKey(seed),
        )
        (xs, ys, survived, count) = jax.device_get((xs, ys, survived, count))
        n = int(count)
        bo_res = BOResult(
            xp=np.asarray(xs)[:n].astype(int),
            yp=np.asarray(ys)[:n],
            survived=np.asarray(survived)[:n],
        )
        return _assemble_output(segments, s, width, int(target), bo_res), bo_res

    def explain_many(self, images, segments_list,
                     window_fraction: float = 0.4, per_image_seeds=None,
                     targets=None):
        """Explain N images, choosing the execution strategy in ONE place:
        the exported image-batched program when it pays (N > 1 and some
        exported batch ≥ N), else sequential :meth:`explain` calls — with
        ``per_image_seeds`` + explicit ``targets`` the two are
        bit-identical, so callers (``/explain_batch``, the dynamic
        batcher) share this decision instead of probing ``_batched_fns``
        themselves. Returns ``(outs, device_calls)``; ``targets`` and
        ``per_image_seeds`` are required (infer targets first via
        :meth:`predict_logits_batch`)."""
        n = len(segments_list)
        if targets is None or per_image_seeds is None:
            raise ValueError("explain_many needs explicit targets and "
                             "per_image_seeds (infer targets first)")
        if n > 1 and any(b >= n for b in (self._batched_fns or {})):
            outs = self.explain_batch(
                images, segments_list, window_fraction=window_fraction,
                targets=targets, per_image_seeds=per_image_seeds,
            )
            return outs, 1
        outs = [
            self.explain(images[i], segments_list[i],
                         window_fraction=window_fraction,
                         seed=int(per_image_seeds[i]), target=targets[i])
            for i in range(n)
        ]
        return outs, n

    def explain_batch(
        self,
        images,
        segments_list,
        window_fraction: float = 0.4,
        seed: int = 0,
        targets=None,
        per_image_seeds=None,
    ):
        """Explain N images with ONE exported image-batched BO program —
        the serving twin of ``bo_pipeline.bo_window_saliency_multi`` (same
        padding, key-derivation, and assembly semantics; bit-parity tested).
        Requires the artifact to have been exported with ``image_batches``;
        picks the smallest exported batch ≥ len(images) and the smallest
        candidate bucket ≥ max(upper)+1, padding by repeating entry 0.
        Returns a list of N (SaliencyOutput, BOResult) pairs."""
        import jax
        import jax.numpy as jnp

        # The geometry/pad/keys/assembly semantics are IMPORTED from the
        # live path, not re-implemented — the documented bit-parity with
        # bo_window_saliency_multi holds by construction.
        from network_interpretation_imagenet_tpu.saliency.bo_pipeline import (
            _collect_multi_outputs,
            _multi_geometry,
            _multi_keys,
            _pad_multi_operands,
        )

        if not self._batched_fns:
            raise ValueError(
                "artifact has no image-batched BO programs; re-export with "
                "image_batches=(N,...) (CLI: --bo-image-batches)"
            )
        segs, ss, widths, uppers = _multi_geometry(segments_list,
                                                   window_fraction)
        n = len(segs)
        if n == 0:
            return []
        images = np.asarray(np.stack(images), np.float32)

        usable_n = [b for b in sorted(self._batched_fns) if b >= n]
        if not usable_n:
            raise ValueError(
                f"batch of {n} images needs an exported image batch >= {n}; "
                f"exported: {sorted(self._batched_fns)}"
            )
        n_pad = usable_n[0]
        fns = self._batched_fns[n_pad]
        need = int(uppers.max()) + 1
        usable_cb = [b for b in sorted(fns) if b >= need]
        if not usable_cb:
            raise ValueError(
                f"image needs a candidate bucket >= {need}; exported "
                f"buckets: {sorted(fns)} — re-export with a larger bucket"
            )
        images, segs_arr, widths, uppers, targets_pad = _pad_multi_operands(
            n, n_pad, images, segs, widths, uppers, targets)

        images_dev = jnp.asarray(images)
        if targets_pad is None:
            logits = self._batched_predicts[n_pad].call(
                self.variables, images_dev
            )
            targets_pad = np.asarray(
                jax.device_get(jnp.argmax(logits, axis=-1)), np.int32
            )

        keys = _multi_keys(n, n_pad, seed, per_image_seeds)
        xs_d, ys_d, survived_d, counts_d = fns[usable_cb[0]].call(
            self.variables, images_dev, jnp.asarray(segs_arr),
            jnp.asarray(widths), jnp.asarray(targets_pad),
            jnp.asarray(uppers), keys,
        )
        return _collect_multi_outputs(
            xs_d, ys_d, survived_d, counts_d, segs, ss, widths,
            targets_pad, n)


def load_exported_bo(path: str, variables: Any = None) -> ExportedBOServer:
    return ExportedBOServer(path, variables)
