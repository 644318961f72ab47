"""Probe: uniformity interaction block size vs detect time on TPU.

The greedy uniformity pass serializes over ceil(candidates/block)
blocks; bigger blocks shorten that sequential chain at quadratic
(B, B) pair-matrix cost (trivial VPU work at these sizes). Times the
FULL batched detect at several block sizes on the bench frames and
checks bitwise output equality.

  python tools/probe_uniformity_block.py
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

    from bench import bench_frames
    from ethzasl_brisk_tpu.pipeline import BriskFeature

    print(f"device: {jax.devices()[0]}", flush=True)
    batch, iters = 16, 10
    frames = jnp.asarray(bench_frames(batch))

    ref = None
    for block in (128, 256, 512, 1024, 2048):
        feature = BriskFeature(
            octaves=2, uniformity_radius=30.0, absolute_threshold=20.0,
            max_candidates=8192, max_keypoints=1024,
            sampler="patch", patch_h=128, patch_w=128,
            uniformity_block=block,
        )
        det = jax.jit(jax.vmap(feature.detect))
        for _ in range(4):
            kps = det(frames)
            float(np.asarray(jnp.sum(kps.x) + jnp.sum(kps.valid)))
        t0 = time.perf_counter()
        acc = jnp.zeros((), jnp.float32)
        for _ in range(iters):
            kps = det(frames)
            acc = acc + jnp.sum(kps.x) + jnp.sum(kps.valid)
        float(np.asarray(acc))
        dt = (time.perf_counter() - t0) / iters
        if ref is None:
            ref, eq = kps, "ref"
        else:
            eq = bool(
                jnp.all(kps.x == ref.x) & jnp.all(kps.y == ref.y)
                & jnp.all(kps.valid == ref.valid)
                & jnp.all(kps.response == ref.response)
            )
        print(f"  block={block:5d}  detect {dt*1e3:8.2f} ms/batch{batch}"
              f"   bit-equal: {eq}", flush=True)


if __name__ == "__main__":
    main()
