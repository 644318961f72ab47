"""Probe: validate + time the fused Harris+NMS mask Pallas kernel on TPU.

Checks bit-equality of ``harris_score_mask_batch_pallas`` against the
dense pair (pallas harris + jnp maxima2d_mask) on the bench frames at
every pyramid layer shape, then times three formulations of the
score+mask stage with the honest checksum readback:

  A. jnp harris + jnp mask        (round-1 baseline)
  B. pallas harris + jnp mask     (current default)
  C. fused pallas score+mask      (gated candidate)

  python tools/probe_fused_mask.py
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

    from ethzasl_brisk_tpu.kernels.harris import harris_score_i32
    from ethzasl_brisk_tpu.kernels.nms import maxima2d_mask
    from ethzasl_brisk_tpu.kernels.pallas_harris import (
        harris_score_i32_batch_pallas,
        harris_score_mask_batch_pallas,
    )

    print(f"device: {jax.devices()[0]}", flush=True)
    thr = 20
    batch = 16

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bench import bench_frames  # noqa: E402  (repo-root bench.py)

    frames = np.asarray(bench_frames(batch))

    # Pyramid layer shapes of the octaves=2 bench config.
    shapes = [(480, 640), (320, 426), (240, 320), (160, 213)]

    def readback(*arrs):
        acc = jnp.zeros((), jnp.float32)
        for a in arrs:
            acc = acc + jnp.sum(a, dtype=jnp.float32)
        return float(np.asarray(acc))

    for h, w in shapes:
        imgs = jnp.asarray(frames[:, :h, :w])
        sc_f, mask_f = harris_score_mask_batch_pallas(imgs, thr=thr)
        sc_d = harris_score_i32_batch_pallas(imgs)
        mask_d = jax.jit(jax.vmap(lambda s: maxima2d_mask(s, thr)))(sc_d)
        ok_s = bool(jnp.all(sc_f == sc_d))
        ok_m = bool(jnp.all(mask_f == mask_d))
        print(f"  ({h:4d},{w:4d}) score equal: {ok_s}  mask equal: {ok_m}",
              flush=True)
        if not (ok_s and ok_m):
            d = np.asarray(jnp.argwhere(mask_f != mask_d))[:8]
            print(f"    first mask diffs: {d}")
            raise SystemExit("FUSED MASK MISMATCH")

    h, w = shapes[0]
    imgs = jnp.asarray(frames[:, :h, :w])

    jnp_pair = jax.jit(
        jax.vmap(lambda im: (lambda s: (s, maxima2d_mask(s, thr)))(
            harris_score_i32(im)))
    )
    pallas_then_mask = jax.jit(
        lambda b: (lambda s: (s, jax.vmap(
            lambda x: maxima2d_mask(x, thr))(s)))(
            harris_score_i32_batch_pallas(b))
    )
    fused = jax.jit(lambda b: harris_score_mask_batch_pallas(b, thr=thr))

    for name, fn in [("A jnp+jnp", jnp_pair),
                     ("B pallas+jnp", pallas_then_mask),
                     ("C fused", fused)]:
        for _ in range(4):  # warm (first post-compile run can be 50x slow)
            readback(*fn(imgs))
        iters = 10
        t0 = time.perf_counter()
        acc = jnp.zeros((), jnp.float32)
        for _ in range(iters):
            s, m = fn(imgs)
            acc = acc + jnp.sum(s, dtype=jnp.float32) + jnp.sum(m)
        float(np.asarray(acc))
        dt = (time.perf_counter() - t0) / iters
        print(f"  {name:14s} {dt*1e3:8.2f} ms/batch{batch} @480x640",
              flush=True)

    print("FUSED MASK OK", flush=True)


if __name__ == "__main__":
    main()
