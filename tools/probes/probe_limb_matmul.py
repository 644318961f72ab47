"""Probe: describe-sampler one-hot contraction arithmetic on TPU.

The row-selection matmul in describe/fast_sampler.py runs at
Precision.HIGHEST (6 bf16 MXU passes) to keep the <=2^22 integral
values exact. Alternatives (same exact values):

* bf16_limb: three 8-bit limbs as DEFAULT-precision bf16 matmuls
  (3 passes -> ~2x the MXU rate);
* int8_limb: the limbs as s8 x s8 -> s32 dots (TPU int8 rate).

Times the FULL sampler (bench shapes: 16384 keypoints, 128x128 patch,
60-point pattern) per mode with the honest checksum readback, and
checks bit-equality across modes.

  python tools/probe_limb_matmul.py [n_kpts]
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path[:0] = [_ROOT, os.path.join(_ROOT, 'tools')]


def main():
    import jax
    import jax.numpy as jnp

    from ethzasl_brisk_tpu.describe.fast_sampler import (
        smoothed_intensity_patch,
    )
    from ethzasl_brisk_tpu.kernels.integral import integral_image_i32

    print(f"device: {jax.devices()[0]}", flush=True)
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    p = 60
    h, w = 480, 640
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.integers(0, 256, (h, w)), jnp.uint8)
    integ = integral_image_i32(img)

    key_x = jnp.asarray(rng.uniform(60, w - 60, (k,)), jnp.float32)
    key_y = jnp.asarray(rng.uniform(60, h - 60, (k,)), jnp.float32)
    # Pattern-like tap geometry with a detector-like scale mix:
    # ~85% layer-0 (extent ~13 px), 10% mid (~26), 5% large (~52).
    scale_f = rng.choice([1.0, 2.0, 4.0], size=(k, 1), p=[0.85, 0.10, 0.05])
    ang = rng.uniform(0, 2 * np.pi, (k, p))
    rad = rng.uniform(0, 13, (k, p)) * scale_f
    pat_x = jnp.asarray(rad * np.cos(ang), jnp.float32)
    pat_y = jnp.asarray(rad * np.sin(ang), jnp.float32)
    pat_sigma = jnp.asarray(
        rng.uniform(0.3, 5.0, (k, p)) * scale_f, jnp.float32
    )
    pat_scaling = jnp.asarray(
        rng.integers(1, 4_000_000, (k, p)), jnp.int32
    )
    pat_scaling2 = jnp.asarray(
        rng.integers(1, 4_000_000, (k, p)), jnp.int32
    )

    from ethzasl_brisk_tpu.describe.fast_sampler import (
        smoothed_intensity_patch_ms,
    )

    def make_fn(mode):
        if mode.startswith("ms_"):
            m = mode[3:]
            return jax.jit(
                lambda i_, kx, ky, px, py, ps, s1, s2: (
                    smoothed_intensity_patch_ms(
                        img, i_, kx, ky, px, py, ps, s1, s2,
                        patch_sizes=((32, 128), (64, 128), (128, 128)),
                        chunk=64, matmul=m,
                    )
                )
            )
        return jax.jit(
            lambda i_, kx, ky, px, py, ps, s1, s2: (
                smoothed_intensity_patch(
                    img, i_, kx, ky, px, py, ps, s1, s2,
                    patch_h=128, patch_w=128, chunk=64, matmul=mode,
                )
            )
        )

    outs = {}
    for mode in ("f32", "bf16_limb", "int8_limb",
                 "ms_f32", "ms_bf16_limb", "ms_int8_limb"):
        fn = make_fn(mode)
        args = (integ, key_x, key_y, pat_x, pat_y, pat_sigma,
                pat_scaling, pat_scaling2)
        try:
            out = fn(*args)
            _ = int(np.asarray(jnp.sum(out)))  # warm + force
            for _ in range(3):
                out = fn(*args)
                _ = int(np.asarray(jnp.sum(out)))
            t0 = time.perf_counter()
            acc = jnp.zeros((), jnp.int64 if jax.config.jax_enable_x64
                            else jnp.int32)
            iters = 8
            for _ in range(iters):
                out = fn(*args)
                acc = acc + jnp.sum(out)
            _ = int(np.asarray(acc))
            dt = (time.perf_counter() - t0) / iters
            outs[mode] = np.asarray(out)
            print(f"{mode}: {dt*1e3:8.2f} ms/call ({k} kpts)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{mode}: FAILED {type(e).__name__}: {e}", flush=True)

    ref = outs.get("f32")
    for mode, o in outs.items():
        if ref is not None and mode != "f32":
            eq = np.array_equal(ref, o)
            print(f"{mode} bit-equal vs f32: {eq}")
            if not eq:
                d = np.abs(ref.astype(np.int64) - o.astype(np.int64))
                print(f"  max |diff| {d.max()}, n diff {(d > 0).sum()}")


if __name__ == "__main__":
    main()
