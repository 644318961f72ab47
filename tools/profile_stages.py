"""Honest per-stage TPU profiling (checksum-readback timing).

Each stage is jitted separately and timed with the bench.py recipe: chain a
device-side checksum across iterations and read back ONE scalar at the end
(block_until_ready is a no-op on the tunneled backend — NOTES.md).

Usage:
  python tools/profile_stages.py [batch] [iters]     # default 16 5

Stages mirror the reference's timer taxonomy (scale-space-layer-inl.h:110+):
  0.0 pyramid+scores, 0.1 2d/3d maxima masks, 0.2 top-k extraction,
  0.3 uniformity, 1.x description phases, 2.0 matching.
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def make_frames(batch, h, w, seed=7):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, (batch, h, w)).astype(np.float32)
    from scipy import ndimage

    k = np.ones((1, 5, 5)) / 25.0
    sm = ndimage.convolve(base, k, mode="nearest")
    return np.clip(sm, 0, 255).astype(np.uint8)


def timed(name, fn, *args, iters=5, checksum=None):
    """Compile, warm (2x with readback), then time `iters` chained calls."""
    import jax
    import jax.numpy as jnp

    fn_j = jax.jit(fn)
    for _ in range(4):
        out = fn_j(*args)
        leaves = [
            x for x in jax.tree_util.tree_leaves(out)
            if isinstance(x, jax.Array)
        ]
        acc = sum(jnp.sum(x, dtype=jnp.float32) for x in leaves)
        float(np.asarray(acc))
    t0 = time.perf_counter()
    acc = jnp.zeros((), jnp.float32)
    for _ in range(iters):
        out = fn_j(*args)
        leaves = [
            x for x in jax.tree_util.tree_leaves(out)
            if isinstance(x, jax.Array)
        ]
        acc = acc + sum(jnp.sum(x, dtype=jnp.float32) for x in leaves)
    float(np.asarray(acc))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:<44s} {dt * 1e3:9.2f} ms/iter", flush=True)
    return dt


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    h, w = 480, 640

    import jax
    import jax.numpy as jnp

    print(f"devices: {jax.devices()}", flush=True)

    from ethzasl_brisk_tpu.describe.extractor import extract_descriptors
    from ethzasl_brisk_tpu.detect.scale_space import (
        DetectorConfig,
        build_pyramid,
        detect_keypoints,
    )
    from ethzasl_brisk_tpu.kernels.harris import harris_score_i32
    from ethzasl_brisk_tpu.match.matcher import hamming_distance_matrix
    from ethzasl_brisk_tpu.pipeline import BriskFeature

    cands_env = os.environ.get("PROF_CANDS", "8192,4096,2048,1024")
    cands = (
        tuple(int(c) for c in cands_env.split(","))
        if "," in cands_env else int(cands_env)
    )
    feature = BriskFeature(
        octaves=int(os.environ.get("PROF_OCTAVES", "2")),
        uniformity_radius=float(os.environ.get("PROF_URADIUS", "30")),
        absolute_threshold=float(os.environ.get("PROF_THRESHOLD", "20")),
        max_candidates=cands,
        max_keypoints=int(os.environ.get("PROF_KPTS", "1024")),
        topk_impl=os.environ.get("PROF_TOPK", "sort"),
    )
    cfg = feature.config
    print(
        f"config: octaves={feature.octaves} uradius="
        f"{feature.uniformity_radius} thr={feature.absolute_threshold} "
        f"cands={feature.max_candidates} kpts={feature.max_keypoints} "
        f"batch={batch}",
        flush=True,
    )

    frames = jnp.asarray(make_frames(batch, h, w))

    # --- stage: pyramid + scores
    def scores_fn(fr):
        def one(img):
            pyr = build_pyramid(img, cfg.n_layers)
            return [harris_score_i32(p) for p in pyr]

        return jax.vmap(one)(fr)

    timed("0.0 pyramid+harris scores", scores_fn, frames, iters=iters)
    time.sleep(2)

    # --- stage: full detection (scores + maxima + 3d + topk + uniformity)
    def detect_fn(fr):
        def one(img):
            kps = detect_keypoints(img, cfg)
            return kps.x, kps.y, kps.response, kps.valid

        return jax.vmap(one)(fr)

    timed("0.x full detect (incl uniformity)", detect_fn, frames, iters=iters)
    time.sleep(2)

    # --- stage: detection without uniformity (isolates the greedy loop)
    import dataclasses

    cfg_nou = dataclasses.replace(cfg, uniformity_radius=0.0)

    def detect_nou_fn(fr):
        def one(img):
            kps = detect_keypoints(img, cfg_nou)
            return kps.x, kps.y, kps.response, kps.valid

        return jax.vmap(one)(fr)

    timed("0.x detect (no uniformity)", detect_nou_fn, frames, iters=iters)
    time.sleep(2)

    # --- detection output for the describe stage (capped like the real
    # pipeline: BriskFeature.detect top_k's to max_keypoints).
    def detect_capped_fn(fr):
        def one(img):
            kps = feature.detect(img)
            return kps.x, kps.y, kps.response, kps.valid

        return jax.vmap(one)(fr)

    kx, ky, kresp, kvalid = jax.jit(detect_capped_fn)(frames)
    n_valid = np.asarray(jnp.sum(kvalid, axis=1))
    print(f"valid keypoints/frame: min {n_valid.min()} max {n_valid.max()} "
          f"mean {n_valid.mean():.0f}", flush=True)

    from ethzasl_brisk_tpu.core.keypoints import KeyPoints

    def mk_kps(x, y, resp, valid):
        k = x.shape[0]
        return KeyPoints(
            x=x, y=y,
            size=jnp.full((k,), 12.0, jnp.float32),
            angle=jnp.full((k,), -1.0, jnp.float32),
            response=resp,
            octave=jnp.zeros((k,), jnp.int32),
            valid=valid,
        )

    pattern = feature.extractor.pattern

    from ethzasl_brisk_tpu.describe.extractor import (
        extract_descriptors_batch,
    )

    def describe_fn(pat, fr, x, y, resp, valid):
        kps = jax.vmap(mk_kps)(x, y, resp, valid)
        _, desc = extract_descriptors_batch(
            pat, fr, kps, sampler="patch", patch_h=128, patch_w=128,
        )
        return desc

    # NOTE: the pattern pytree must be a runtime ARGUMENT of the jitted
    # callee — closing over it makes it a constant (~2000x slower).
    timed(
        "1.x describe (flat batch, patch sampler)",
        describe_fn, pattern, frames, kx, ky, kresp, kvalid, iters=iters,
    )
    time.sleep(2)

    # --- matching
    desc = jax.jit(describe_fn)(pattern, frames, kx, ky, kresp, kvalid)

    def match_fn(d, valid):
        q, t = d[1:], d[:-1]

        def pair(qd, td, tv):
            dm = hamming_distance_matrix(qd, td)
            dm = jnp.where(tv[None, :], dm, 385)
            return jnp.argmin(dm, axis=1), jnp.min(dm, axis=1)

        return jax.vmap(pair)(q, t, valid[:-1])

    timed("2.0 match (batch pairs)", match_fn, desc, kvalid, iters=iters)

    print("done", flush=True)


if __name__ == "__main__":
    main()
