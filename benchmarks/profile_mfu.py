"""MFU evidence for the headline bench numbers (run on a real v5e chip).

Produces the per-stage time/FLOP/MFU table, the HBM/MXU roofline per stage,
and a jax.profiler device trace — the committed proof behind
docs/PERFORMANCE.md's "~60% end-to-end MFU is the roofline ceiling" claim
(recorded output: docs/profiles/resnet101_b4096_stages.txt).

Method notes:
  * every timed call syncs via a host fetch of a scalar — on remote-tunnel
    TPU setups ``block_until_ready`` can return at enqueue time and
    under-reports by 100×;
  * the tunnel dispatch+fetch overhead is measured on a trivial jit and
    subtracted ("-ov" column): ~27 ms/call here, which inflates naive
    per-stage numbers by 5-90%.

Usage: python benchmarks/profile_mfu.py [--trace-dir DIR]
"""

from __future__ import annotations

import argparse
import time

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from network_interpretation_imagenet_tpu.models.common import BatchNorm
from network_interpretation_imagenet_tpu.models.resnet_imagenet import (
    Bottleneck,
    max_pool_same,
)
from network_interpretation_imagenet_tpu.utils.compile_cache import (
    enable_compilation_cache,
)

B = 4096
PEAK = 197e12  # v5e bf16
HBM_BW = 819e9  # v5e HBM bytes/s


class Stem(nn.Module):
    dtype: any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        kw = dict(dtype=self.dtype, param_dtype=jnp.float32)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, name="conv1", **kw)(x)
        x = BatchNorm(use_running_average=True, name="bn1", **kw)(x)
        x = nn.relu(x)
        return max_pool_same(x, 3, 2)


class Stage(nn.Module):
    planes: int
    blocks: int
    stride: int
    in_ch: int
    dtype: any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        kw = dict(dtype=self.dtype, param_dtype=jnp.float32)
        inplanes = self.in_ch
        for b in range(self.blocks):
            s = self.stride if b == 0 else 1
            has_ds = s != 1 or inplanes != self.planes * 4
            x = Bottleneck(planes=self.planes, stride=s,
                           has_downsample=has_ds, name=f"b{b}", **kw)(x, False)
            inplanes = self.planes * 4
        return x


def conv_macs(h, w, cin, cout, k):
    return h * w * cin * cout * k * k


def stage_macs(planes, blocks, h_out, in_ch):
    total, inplanes = 0, in_ch
    for b in range(blocks):
        h_in = h_out * (2 if (b == 0 and in_ch != 64) else 1)
        total += conv_macs(h_in, h_in, inplanes, planes, 1)
        total += conv_macs(h_out, h_out, planes, planes, 3)
        total += conv_macs(h_out, h_out, planes, planes * 4, 1)
        if b == 0:
            total += conv_macs(h_out, h_out, inplanes, planes * 4, 1)
        inplanes = planes * 4
    return total


def t_bytes(h, c):
    return B * h * h * c * 2  # bf16


def stage_traffic(planes, blocks, h, cin):
    """Naive-fusion HBM traffic: each conv reads its input and writes its
    output once; BN/ReLU fuse into the convs (profiler-confirmed: the
    rsqrt_multiply BN fusions run on [C]-sized params, ~0 ms device time)."""
    tot = 0
    for b in range(blocks):
        h_in = h * 2 if (b == 0 and cin != 64) else h
        tot += t_bytes(h_in, cin if b == 0 else planes * 4)
        tot += 2 * t_bytes(h, planes)
        tot += 2 * t_bytes(h, planes)
        tot += t_bytes(h, planes * 4)
        tot += 2 * t_bytes(h, planes * 4)  # residual add: read both, write
        if b == 0:
            tot += t_bytes(h_in, cin) + t_bytes(h, planes * 4)
    return tot


def timeit(fn, *args, n=4):
    np.asarray(fn(*args))  # compile + sync
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace-dir", default=None,
                    help="also capture a jax.profiler device trace here")
    args = ap.parse_args(argv)
    enable_compilation_cache()

    rng = jax.random.PRNGKey(0)
    triv = jax.jit(lambda x: jnp.sum(x))
    overhead = timeit(triv, jnp.ones((8, 8)), n=6)
    print(f"tunnel dispatch+fetch overhead: {overhead*1e3:.1f} ms")

    specs = [
        ("stem", Stem(), (B, 224, 224, 3), jnp.float32,
         conv_macs(112, 112, 3, 64, 7),
         B * 224 * 224 * 3 * 4 + 2 * t_bytes(112, 64) + t_bytes(56, 64)),
        ("stage1", Stage(planes=64, blocks=3, stride=1, in_ch=64),
         (B, 56, 56, 64), jnp.bfloat16, stage_macs(64, 3, 56, 64),
         stage_traffic(64, 3, 56, 64)),
        ("stage2", Stage(planes=128, blocks=4, stride=2, in_ch=256),
         (B, 56, 56, 256), jnp.bfloat16, stage_macs(128, 4, 28, 256),
         stage_traffic(128, 4, 28, 256)),
        ("stage3", Stage(planes=256, blocks=23, stride=2, in_ch=512),
         (B, 28, 28, 512), jnp.bfloat16, stage_macs(256, 23, 14, 512),
         stage_traffic(256, 23, 14, 512)),
        ("stage4", Stage(planes=512, blocks=3, stride=2, in_ch=1024),
         (B, 14, 14, 1024), jnp.bfloat16, stage_macs(512, 3, 7, 1024),
         stage_traffic(512, 3, 7, 1024)),
    ]

    print(f"{'stage':8s} {'t-ov':>8s} {'TFLOP':>7s} {'MFU':>6s} "
          f"{'BW-roof':>8s} {'MXU-roof':>9s} {'bound':>6s}")
    tot_t = tot_f = roof = 0.0
    for name, mod, shape, dt, macs, traffic in specs:
        variables = mod.init(rng, jax.random.normal(rng, (8,) + shape[1:], dt))
        x = jax.random.normal(rng, shape, dt)
        fn = jax.jit(
            lambda v, xx, m=mod: jnp.sum(m.apply(v, xx).astype(jnp.float32))
        )
        t = timeit(fn, variables, x) - overhead
        del x, variables
        flops = 2 * macs * B
        bw_roof, mxu_roof = traffic / HBM_BW, flops / PEAK
        roof += max(bw_roof, mxu_roof)
        tot_t += t
        tot_f += flops
        print(f"{name:8s} {t*1e3:7.1f}ms {flops/1e12:7.2f} "
              f"{flops/t/PEAK*100:5.1f}% {bw_roof*1e3:7.1f}ms "
              f"{mxu_roof*1e3:8.1f}ms {'HBM' if bw_roof > mxu_roof else 'MXU':>6s}")
    print(f"SUM      {tot_t*1e3:7.1f}ms {tot_f/1e12:7.2f} "
          f"{tot_f/tot_t/PEAK*100:5.1f}%  "
          f"(roofline-min {roof*1e3:.0f} ms -> ceiling "
          f"{tot_f/roof/PEAK*100:.1f}% MFU)")

    if args.trace_dir:
        from network_interpretation_imagenet_tpu.models import create_model

        bundle = create_model("resnet101", "imagenet", dtype=jnp.bfloat16)
        variables = jax.device_put(bundle.init(rng))
        x = jax.random.normal(rng, (1024, 224, 224, 3), jnp.bfloat16)
        fn = jax.jit(
            lambda v, xx: jnp.sum(bundle.logits(v, xx).astype(jnp.float32))
        )
        np.asarray(fn(variables, x))
        with jax.profiler.trace(args.trace_dir):
            np.asarray(fn(variables, x))
        print(f"trace written to {args.trace_dir} (B=1024 whole model)")


if __name__ == "__main__":
    main()
