"""Reproduce the flaky TPU worker fault: batched (8, 640, 800) detect.

Round-1 NOTES: the batched detect executable at this shape crashes
nondeterministically (same executable, same data: sometimes passes,
sometimes kills the worker). harris/maxima/top_k in isolation always
pass; (16, 480, 640) and single-frame (640, 800) always pass.

Usage: python tools/repro_640800.py [batch] [h] [w] [iters] [stage]
  stage in {full, harris, nouni, detect} — bisect which sub-graph faults.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    h = int(sys.argv[2]) if len(sys.argv) > 2 else 640
    w = int(sys.argv[3]) if len(sys.argv) > 3 else 800
    iters = int(sys.argv[4]) if len(sys.argv) > 4 else 30
    stage = sys.argv[5] if len(sys.argv) > 5 else "detect"

    import jax
    import jax.numpy as jnp

    print(f"devices: {jax.devices()}", flush=True)

    from ethzasl_brisk_tpu.pipeline import BriskFeature

    feature = BriskFeature(
        octaves=2,
        uniformity_radius=0.0,
        absolute_threshold=30.0,
        max_candidates=512,
        max_keypoints=512,
    )

    rng = np.random.default_rng(11)
    frames_np = rng.integers(0, 256, (batch, h, w)).astype(np.uint8)
    # Also try the real reference frames tiled to the batch.
    try:
        from ethzasl_brisk_tpu.core.image_io import read_pgm

        img1 = read_pgm("/root/reference/brisk/src/test/test_data/img1.pgm")
        img2 = read_pgm("/root/reference/brisk/src/test/test_data/img2.pgm")
        if img1.shape == (h, w):
            reals = np.stack([img1, img2] * (batch // 2 + 1))[:batch]
            frames_np = reals
            print("using real reference frames", flush=True)
    except Exception as e:  # pragma: no cover
        print(f"(real frames unavailable: {e})", flush=True)

    frames = jnp.asarray(frames_np)

    if stage == "harris":
        from ethzasl_brisk_tpu.detect.scale_space import build_pyramid
        from ethzasl_brisk_tpu.kernels.harris import harris_score

        def fn(fr):
            def one(img):
                layers = build_pyramid(img, octaves=2)
                return [jnp.sum(harris_score(l).astype(jnp.int64))
                        if False else jnp.sum(harris_score(l))
                        for l in layers][0]

            return jax.vmap(one)(fr)

    elif stage in ("detect", "nouni", "full"):
        def fn(fr):
            def one(img):
                kps = feature.detect(img)
                return kps.x, kps.response, kps.valid

            return jax.vmap(one)(fr)

    fn_j = jax.jit(fn)
    for it in range(iters):
        t0 = time.perf_counter()
        out = fn_j(frames)
        # honest forcing: reduce + readback
        leaves = [x for x in jax.tree_util.tree_leaves(out)
                  if hasattr(x, "dtype")]
        acc = sum(jnp.sum(x.astype(jnp.float32)) for x in leaves)
        val = float(np.asarray(acc))
        dt = (time.perf_counter() - t0) * 1e3
        print(f"iter {it:3d}: ok  checksum={val:.1f}  {dt:.1f} ms",
              flush=True)
    print("ALL ITERS PASSED", flush=True)


if __name__ == "__main__":
    main()
