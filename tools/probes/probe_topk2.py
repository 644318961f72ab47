"""Probe: two-stage (per-row cap -> global) top-k vs full-map lax.top_k.

Detection spends ~half its time in per-layer lax.top_k over the full
H*W masked score map (NOTES: ~70 ms/batch16). NMS maxima are sparse and
no two maxima are horizontally adjacent, so a per-row top-R prefilter
(R=row_cap) shrinks the global sort domain W/R-fold while preserving
EXACT top-k semantics (value desc, flat-index-asc ties) whenever no row
holds more than R candidates that belong in the global top-k.

Usage: python tools/probe_topk2.py [batch] [iters]
Prints per-variant ms/iter + bit-equality of (values, indices).
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path[:0] = [_ROOT, os.path.join(_ROOT, 'tools')]


def timed(name, fn, *args, iters=8):
    import jax
    import jax.numpy as jnp

    fn_j = jax.jit(fn)
    for _ in range(4):
        out = fn_j(*args)
        leaves = jax.tree_util.tree_leaves(out)
        acc = sum(jnp.sum(x.astype(jnp.float32)) for x in leaves)
        float(np.asarray(acc))
    t0 = time.perf_counter()
    acc = jnp.zeros((), jnp.float32)
    for _ in range(iters):
        out = fn_j(*args)
        leaves = jax.tree_util.tree_leaves(out)
        acc = acc + sum(jnp.sum(x.astype(jnp.float32)) for x in leaves)
    float(np.asarray(acc))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:<44s} {dt * 1e3:9.2f} ms/iter", flush=True)
    return dt


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    import jax
    import jax.numpy as jnp

    from ethzasl_brisk_tpu.detect.scale_space import (
        DetectorConfig,
        build_pyramid,
        layer_geometry,
        maxima2d_mask,
        warp_scores_split,
        center_ge_warped,
        _shift2d,
    )
    from ethzasl_brisk_tpu.kernels.pallas_harris import (
        harris_score_i32_fused,
    )
    from tools.profile_stages import make_frames

    print(f"devices: {jax.devices()}", flush=True)
    cfg = DetectorConfig(
        octaves=2, uniformity_radius=30.0, absolute_threshold=20.0,
        max_candidates=8192, max_keypoints=1024,
    )
    frames = jnp.asarray(make_frames(batch, 480, 640))
    n_layers = cfg.n_layers
    K = cfg.max_candidates
    INT32_MIN = -(2**31)

    def masks_fn(fr):
        def one(img):
            pyr = build_pyramid(img, n_layers)
            scores = [harris_score_i32_fused(p) for p in pyr]
            geoms = [layer_geometry(i) for i in range(n_layers)]
            out = []
            for i in range(n_layers):
                sc = scores[i]
                h, w = sc.shape
                mask = maxima2d_mask(sc, int(cfg.absolute_threshold))
                if i + 1 < n_layers:
                    a, b, d = geoms[i].above_map
                    w_hi, w_lo = warp_scores_split(
                        scores[i + 1], (a, b, d), (h, w))
                    for dy in (-1, 0, 1):
                        for dx in (-1, 0, 1):
                            mask &= center_ge_warped(
                                sc, _shift2d(w_hi, dy, dx, 0),
                                _shift2d(w_lo, dy, dx, 0), d)
                if i > 0:
                    a, b, d = geoms[i].below_map
                    w_hi, w_lo = warp_scores_split(
                        scores[i - 1], (a, b, d), (h, w))
                    mask &= center_ge_warped(sc, w_hi, w_lo, d)
                out.append((sc, mask))
            return out

        return jax.vmap(one)(fr)

    pairs = jax.jit(masks_fn)(frames)
    pairs = jax.block_until_ready(pairs)
    timed("masks only (scores+maxima+warps)", masks_fn, frames,
          iters=iters)

    def topk_sort(sc, mask):
        h, w = sc.shape[-2:]
        masked = jnp.where(mask, sc, INT32_MIN)
        v, i = jax.lax.top_k(masked.reshape(*sc.shape[:-2], h * w), K)
        return v, i

    def sort_all(prs):
        return [jax.vmap(topk_sort)(sc, m) for sc, m in prs]

    def topk_2stage(sc, mask, row_cap):
        h, w = sc.shape[-2:]
        masked = jnp.where(mask, sc, INT32_MIN)
        rv, ri = jax.lax.top_k(masked, row_cap)       # (.., h, R)
        rows = jnp.arange(h, dtype=jnp.int32)[:, None]
        flat_idx = rows * w + ri                      # original flat idx
        rv2 = rv.reshape(*sc.shape[:-2], h * row_cap)
        fi2 = flat_idx.reshape(*sc.shape[:-2], h * row_cap)
        k2 = min(K, h * row_cap)
        v, j = jax.lax.top_k(rv2, k2)
        idx = jnp.take_along_axis(fi2, j, axis=-1)
        if k2 < K:
            pad = K - k2
            v = jnp.concatenate(
                [v, jnp.full((*v.shape[:-1], pad), INT32_MIN, v.dtype)],
                axis=-1)
            idx = jnp.concatenate(
                [idx, jnp.zeros((*idx.shape[:-1], pad), idx.dtype)],
                axis=-1)
        return v, idx

    def stage2_all(prs, row_cap):
        return [
            jax.vmap(lambda s, m: topk_2stage(s, m, row_cap))(sc, m)
            for sc, m in prs
        ]

    ref = jax.jit(sort_all)(pairs)
    ref = jax.block_until_ready(ref)
    for row_cap in (32, 64):
        got = jax.jit(lambda p: stage2_all(p, row_cap))(pairs)
        got = jax.block_until_ready(got)
        ok = all(
            bool(jnp.array_equal(r[0], g[0]))
            and bool(
                jnp.array_equal(
                    jnp.where(r[0] > INT32_MIN, r[1], 0),
                    jnp.where(g[0] > INT32_MIN, g[1], 0),
                )
            )
            for r, g in zip(ref, got)
        )
        print(f"row_cap={row_cap}: exact-equal={ok}", flush=True)

    timed("topk full-map sort (4 layers)", sort_all, pairs, iters=iters)
    timed("topk 2-stage row_cap=32", lambda p: stage2_all(p, 32), pairs,
          iters=iters)
    timed("topk 2-stage row_cap=64", lambda p: stage2_all(p, 64), pairs,
          iters=iters)
    print("done", flush=True)


if __name__ == "__main__":
    main()
