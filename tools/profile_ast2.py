"""AST follow-up probe: describe backends + detect sub-splits.

profile_ast r4: detect (emulated) 1385 ms/b16, describe patch_ms@256
2321 ms/b16. This times (a) the single-call Pallas sampler at AST
window sizes (the old chained kernel lost here — 6 bucket passes over
264x384 windows), (b) valid-compacted describe, (c) detect lower
bounds (corner cache model / pyramid only) to size the emulation cost.

Run on TPU: python tools/profile_ast2.py
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
        extract_descriptors_compact,
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
    kps = det_fn(frames)
    float(np.asarray(jnp.sum(kps.x)))
    nv = np.asarray(jnp.sum(kps.valid, axis=1))
    print("keypoints/frame:", nv.min(), nv.max(), flush=True)

    def ext(sampler, compact, cap=640):
        kw = dict(
            rotation_invariant=True, scale_invariant=True,
            sampler=sampler, patch_h=256, patch_w=256,
            skip_small=detector.extractor.skip_small,
        )
        if compact:
            return jax.jit(
                lambda f, k: extract_descriptors_compact(
                    pat, f, k, capacity=cap * batch, **kw
                )
            )
        return jax.jit(
            lambda f, k: extract_descriptors_batch(pat, f, k, **kw)
        )

    # NOTE the AST detector's KeyPoints capacity is n_layers *
    # max_candidates_per_layer = 12288 SLOTS/frame (~450-500 valid):
    # whole-slot describe pays 196k slots at batch 16 — the 2321 ms
    # measured by profile_ast was slot-count overhead, and the Pallas
    # sampler's per-keypoint prefetch scalars overflow SMEM at that
    # count. Valid compaction is mandatory here, not an optimization.
    timed("describe patch_ms compact640", ext("patch_ms", True),
          frames, kps, iters=3)
    timed("describe patch_pallas compact640", ext("patch_pallas", True),
          frames, kps, iters=3)

    # Detect sub-splits.
    det_corner = BriskFeatureDetector(
        threshold=70, octaves=3, max_candidates_per_layer=2048,
        raw_cache_model="corner",
    )
    timed("detect corner-model (no emulation)",
          jax.jit(jax.vmap(det_corner.detect)), frames, iters=3)

    from ethzasl_brisk_tpu.detect.ast_scale_space import (
        build_ast_pyramid,
    )

    def pyr_only(f):
        layers = jax.vmap(
            lambda im: tuple(
                l.cache for l in build_ast_pyramid(im, 3, 70, lower=10)
            )
        )(f)
        return layers

    timed("pyramid+scoremaps only", jax.jit(pyr_only), frames, iters=3)


if __name__ == "__main__":
    main()
