"""Probe: fast_sampler patch-size scaling on the bench slice.

The describe stage costs ~280 ms/batch-16 via XLA gathers; the one-hot
patch contraction (describe/fast_sampler.py) was 317 ms at its default
(128, 192) patch. For the flagship Harris config every keypoint is
scale index 0-1 (pattern extent 13 px), so a 32x32 patch suffices —
FLOPs drop ~20x if XLA/MXU don't eat it in padding. Measures the full
sampler at several patch sizes, checks bit-equality vs the gather
sampler, and times the gather sampler as baseline.
"""
from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp

import sys, os  # noqa: E401

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path[:0] = [_ROOT, os.path.join(_ROOT, 'tools')]

from ethzasl_brisk_tpu.core.pattern import brisk_v2_pattern  # noqa: E402
from ethzasl_brisk_tpu.describe.extractor import (  # noqa: E402
    DevicePattern,
    smoothed_intensity_u8,
)
from ethzasl_brisk_tpu.describe.fast_sampler import (  # noqa: E402
    smoothed_intensity_patch,
)
from ethzasl_brisk_tpu.kernels.integral import integral_image_i32  # noqa: E402


def timed(name, fn, *args, iters=5):
    fn_j = jax.jit(fn)
    out = fn_j(*args)
    np.asarray(out[:2, :2])  # force
    t0 = time.perf_counter()
    acc = jnp.zeros((), jnp.int64 if False else jnp.float32)
    for _ in range(iters):
        acc = acc + jnp.sum(fn_j(*args).astype(jnp.float32))
    float(np.asarray(acc))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:44s} {dt*1e3:9.2f} ms", flush=True)
    return out


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    rng = np.random.default_rng(0)
    H, W = 480, 640
    img = jnp.asarray(rng.integers(0, 255, (H, W), dtype=np.uint8))
    integral = integral_image_i32(img)

    host = brisk_v2_pattern(1.0)
    pat = DevicePattern.from_host(host)

    K = 12096  # ~16 frames x 756 keypoints
    kx = jnp.asarray(
        rng.uniform(40, W - 40, (K,)).astype(np.float32)
    )
    ky = jnp.asarray(rng.uniform(40, H - 40, (K,)).astype(np.float32))
    # Scale index 0, random rotation index.
    ri = rng.integers(0, 1024, (K,))
    P = host.n_points
    px = jnp.asarray(host.lut_x[0, ri])     # (K, P)
    py = jnp.asarray(host.lut_y[0, ri])
    ps = jnp.asarray(np.broadcast_to(host.lut_sigma[0], (K, P)))
    psc = jnp.asarray(np.broadcast_to(host.lut_scaling[0], (K, P)))
    psc2 = jnp.asarray(np.broadcast_to(host.lut_scaling2[0], (K, P)))

    def gather_fn(*a):
        return smoothed_intensity_u8(*a, skip_small=True)

    ref = timed("gather sampler (baseline)", gather_fn,
                img, integral, kx, ky, px, py, ps, psc, psc2)
    ref_np = np.asarray(ref)
    time.sleep(3)

    for ph, pw, chunk in [
        (128, 192, 64), (64, 64, 64), (48, 48, 64), (40, 40, 128),
        (32, 32, 128), (32, 32, 512),
    ]:
        def patch_fn(*a, _ph=ph, _pw=pw, _c=chunk):
            return smoothed_intensity_patch(
                *a, patch_h=_ph, patch_w=_pw, chunk=_c
            )

        out = timed(f"patch sampler ({ph},{pw}) chunk={chunk}", patch_fn,
                    img, integral, kx, ky, px, py, ps, psc, psc2)
        eq = np.array_equal(np.asarray(out), ref_np)
        print(f"    bit-equal vs gather: {eq}", flush=True)
        time.sleep(3)


if __name__ == "__main__":
    main()
