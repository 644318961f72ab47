"""Quick focused timing: full detect vs detect-without-uniformity on TPU.

Usage: python tools/time_detect.py [batch] [iters] [cands] [block]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    cands = int(sys.argv[3]) if len(sys.argv) > 3 else 8192
    h, w = 480, 640

    import jax
    import jax.numpy as jnp

    from ethzasl_brisk_tpu.detect.scale_space import (
        DetectorConfig,
        detect_keypoints,
    )

    rng = np.random.default_rng(7)
    from scipy import ndimage

    base = rng.integers(0, 256, (batch, h, w)).astype(np.float32)
    sm = ndimage.convolve(base, np.ones((1, 5, 5)) / 25.0, mode="nearest")
    frames = jnp.asarray(np.clip(sm, 0, 255).astype(np.uint8))

    def timed(name, cfg):
        def fn(fr):
            def one(img):
                kps = detect_keypoints(img, cfg)
                return kps.x, kps.response, kps.valid

            return jax.vmap(one)(fr)

        fn_j = jax.jit(fn)
        for _ in range(2):
            out = fn_j(frames)
            float(np.asarray(jnp.sum(out[1])))
        t0 = time.perf_counter()
        acc = jnp.zeros((), jnp.float32)
        for _ in range(iters):
            out = fn_j(frames)
            acc = acc + jnp.sum(out[1])
        float(np.asarray(acc))
        dt = (time.perf_counter() - t0) / iters
        nv = np.asarray(jnp.sum(out[2], axis=1))
        print(f"{name:<40s} {dt * 1e3:9.2f} ms/iter  "
              f"(kpts {nv.min()}-{nv.max()})", flush=True)

    cfg = DetectorConfig(
        octaves=2, uniformity_radius=30.0, absolute_threshold=20.0,
        max_candidates=cands, max_keypoints=1024, max_num_kpt=1024,
    )
    import dataclasses

    timed("detect uradius=30", cfg)
    time.sleep(2)
    timed("detect uradius=0", dataclasses.replace(cfg, uniformity_radius=0.0))


if __name__ == "__main__":
    main()
