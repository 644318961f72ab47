"""Per-stage honest timing of the AST (classic BRISK) pipeline on TPU.

The AST path published no TPU number through round 3 (~4.7 fps at
octaves=3 from a NOTES side-measurement). This splits detect vs
describe vs match at bench config (thr=70, octaves=3, batch 16) so the
optimization targets the right wall.

Run on TPU: python tools/profile_ast.py
"""
from __future__ import annotations

import os
import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
from tpu_timing import burn_in, timed  # noqa: E402


def main():
    print("devices", jax.devices(), flush=True)
    sys.path.insert(0, "/root/repo")
    from bench import bench_frames

    from ethzasl_brisk_tpu.describe.extractor import (
        extract_descriptors_batch,
    )
    from ethzasl_brisk_tpu.pipeline import BriskFeatureDetector

    batch = int(os.environ.get("B", "16"))
    frames = jnp.asarray(bench_frames(batch))

    detector = BriskFeatureDetector(
        threshold=70, octaves=3, max_candidates_per_layer=2048,
        raw_cache_model="emulated",
    )
    det_fn = jax.jit(jax.vmap(detector.detect))
    pat = detector.extractor.pattern

    burn_in(4.0)
    t0 = __import__("time").perf_counter()
    kps = det_fn(frames)
    jax.block_until_ready(kps)
    float(np.asarray(jnp.sum(kps.x)))
    print(f"detect compile+first: "
          f"{__import__('time').perf_counter() - t0:.1f}s", flush=True)
    nv = np.asarray(jnp.sum(kps.valid, axis=1))
    print("keypoints/frame:", nv.min(), nv.max(), flush=True)

    timed("ast detect (emulated)", det_fn, frames, iters=4)

    ext = jax.jit(
        lambda f, k: extract_descriptors_batch(
            pat, f, k,
            rotation_invariant=True, scale_invariant=True,
            sampler="patch_ms", patch_h=256, patch_w=256,
            skip_small=detector.extractor.skip_small,
        )
    )
    timed("ast describe patch_ms 256", ext, frames, kps, iters=4)

    ext_g = jax.jit(
        lambda f, k: extract_descriptors_batch(
            pat, f, k,
            rotation_invariant=True, scale_invariant=True,
            sampler="gather", patch_h=256, patch_w=256,
            skip_small=detector.extractor.skip_small,
        )
    )
    timed("ast describe gather", ext_g, frames, kps, iters=4)


if __name__ == "__main__":
    main()
