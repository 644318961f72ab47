"""Probe: fine detect-stage split at the CURRENT bench config (TPU).

Times nested prefixes of the detect pipeline on the real bench frames
(batch 64, per-layer caps, block top-k) — the difference between
successive rows isolates each stage:

  A scores+masks   (layer_score_masks: pyramid, Pallas Harris, NMS+warp)
  B + candidates   (top-k extraction per layer)
  C + accepts      (uniformity)
  D full detect    (+ compact + subpixel refine + packing)

Run: python tools/probes/probe_detect_split.py [sort|block]
"""
from __future__ import annotations

import os
import sys

import numpy as np

_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
sys.path[:0] = [_ROOT, os.path.join(_ROOT, "tools")]


def main():
    topk = sys.argv[1] if len(sys.argv) > 1 else "block"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    refine_cap = (768, 384, 256, 128) if "--caps" in sys.argv else None

    import jax
    import jax.numpy as jnp

    import bench
    from ethzasl_brisk_tpu.detect.scale_space import (
        _layer_accept,
        _layer_candidates,
        detect_keypoints,
        layer_score_masks,
    )
    from ethzasl_brisk_tpu.pipeline import BriskFeature
    from tpu_timing import burn_in, timed

    feature = BriskFeature(
        octaves=2, uniformity_radius=30.0, absolute_threshold=20.0,
        max_candidates=(8192, 4096, 2048, 1024), max_keypoints=1024,
        topk_impl=topk, refine_capacity=refine_cap,
    )
    cfg = feature.config
    frames = jnp.asarray(bench.bench_frames(batch))
    print("devices", jax.devices(), "topk", topk, "batch", batch,
          "caps", refine_cap, flush=True)
    burn_in(4.0)

    def a_masks(fr):
        def one(img):
            scores, masks = layer_score_masks(img, cfg)
            return masks

        return jax.vmap(one)(fr)

    def a0_scores(fr):
        from ethzasl_brisk_tpu.detect.scale_space import build_pyramid
        from ethzasl_brisk_tpu.kernels.pallas_harris import (
            harris_score_i32_fused,
        )

        def one(img):
            pyr = build_pyramid(img, cfg.n_layers)
            return [harris_score_i32_fused(p) for p in pyr]

        return jax.vmap(one)(fr)

    def a1_nms(fr):
        from ethzasl_brisk_tpu.detect.scale_space import build_pyramid
        from ethzasl_brisk_tpu.kernels.nms import maxima2d_mask
        from ethzasl_brisk_tpu.kernels.pallas_harris import (
            harris_score_i32_fused,
        )

        def one(img):
            pyr = build_pyramid(img, cfg.n_layers)
            scores = [harris_score_i32_fused(p) for p in pyr]
            return [
                maxima2d_mask(s, int(cfg.absolute_threshold))
                for s in scores
            ]

        return jax.vmap(one)(fr)

    def b_cands(fr):
        def one(img):
            scores, masks = layer_score_masks(img, cfg)
            return [
                _layer_candidates(s, m, cfg, cfg.layer_cap(i))
                for i, (s, m) in enumerate(zip(scores, masks))
            ]

        return jax.vmap(one)(fr)

    def c_accepts(fr):
        def one(img):
            scores, masks = layer_score_masks(img, cfg)
            cands = [
                _layer_candidates(s, m, cfg, cfg.layer_cap(i))
                for i, (s, m) in enumerate(zip(scores, masks))
            ]
            return [
                _layer_accept(c, s.shape, cfg)
                for c, s in zip(cands, scores)
            ]

        return jax.vmap(one)(fr)

    def e_compact(fr):
        from ethzasl_brisk_tpu.detect.scale_space import compact_accepted

        def one(img):
            scores, masks = layer_score_masks(img, cfg)
            cands = [
                _layer_candidates(s, m, cfg, cfg.layer_cap(i))
                for i, (s, m) in enumerate(zip(scores, masks))
            ]
            accepts = [
                _layer_accept(c, s.shape, cfg)
                for c, s in zip(cands, scores)
            ]
            return [
                compact_accepted(*c[:4], a, cfg)
                for c, a in zip(cands, accepts)
            ]

        return jax.vmap(one)(fr)

    def f_gather(fr):
        from ethzasl_brisk_tpu.detect.scale_space import compact_accepted

        def one(img):
            scores, masks = layer_score_masks(img, cfg)
            cands = [
                _layer_candidates(s, m, cfg, cfg.layer_cap(i))
                for i, (s, m) in enumerate(zip(scores, masks))
            ]
            accepts = [
                _layer_accept(c, s.shape, cfg)
                for c, s in zip(cands, scores)
            ]
            out = []
            for sc, c, a in zip(scores, cands, accepts):
                xs, ys, tsc, valid, acc = compact_accepted(*c[:4], a, cfg)
                h, w = sc.shape
                flat = sc.reshape(-1)
                rows = []
                for dy in (-1, 0, 1):
                    taps = []
                    for dx in (-1, 0, 1):
                        yy = jnp.clip(ys + dy, 0, h - 1)
                        xx = jnp.clip(xs + dx, 0, w - 1)
                        taps.append(jnp.take(flat, yy * w + xx))
                    rows.append(jnp.stack(taps, axis=-1))
                out.append(jnp.stack(rows, axis=-2))
            return out

        return jax.vmap(one)(fr)

    def d_full(fr):
        def one(img):
            kp = detect_keypoints(img, cfg)
            return kp.x, kp.y, kp.response, kp.valid

        return jax.vmap(one)(fr)

    import jax.numpy as jnp  # noqa: F811 (used by f_gather closures)

    if "--masks" in sys.argv:
        t0 = timed("A0 pyramid+scores", a0_scores, frames)
        t1 = timed("A1 +nms mask", a1_nms, frames)
        t2 = timed("A2 +warp compares", a_masks, frames)
        print(f"masks split: scores {t0*1e3:.1f}  nms "
              f"{(t1-t0)*1e3:.1f}  warps {(t2-t1)*1e3:.1f}", flush=True)
        return

    ta = timed("A scores+masks", a_masks, frames)
    tb = timed("B +candidates (topk)", b_cands, frames)
    tc = timed("C +accepts (uniformity)", c_accepts, frames)
    te = timed("E +compact_accepted", e_compact, frames)
    tf = timed("F +patch gather", f_gather, frames)
    td = timed("D full detect", d_full, frames)
    print(f"split: masks {ta*1e3:.1f}  topk {(tb-ta)*1e3:.1f}  "
          f"uniformity {(tc-tb)*1e3:.1f}  compact {(te-tc)*1e3:.1f}  "
          f"gather {(tf-te)*1e3:.1f}  refine+pack {(td-tf)*1e3:.1f}  "
          f"total {td*1e3:.1f} ms/batch{batch}", flush=True)


if __name__ == "__main__":
    main()
