"""Probe: break down the detect mask pass (scores / maxima / warps).

probe_topk2 showed masks (scores+maxima+warp-compares) at ~78 ms/batch16
vs top_k 13 ms and uniformity 13 ms — the warp-compare chain is the
detect wall. This isolates each component to target the fusion.

Usage: python tools/probe_masks.py [batch] [iters]
"""
from __future__ import annotations

import os
import sys

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path[:0] = [_ROOT, os.path.join(_ROOT, 'tools'), os.path.dirname(os.path.abspath(__file__))]

from probe_topk2 import timed  # noqa: E402
from tools.profile_stages import make_frames  # noqa: E402


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    import jax
    import jax.numpy as jnp

    from ethzasl_brisk_tpu.detect.scale_space import (
        build_pyramid,
        layer_geometry,
        maxima2d_mask,
        warp_scores_split,
        center_ge_warped,
        _shift2d,
    )
    from ethzasl_brisk_tpu.kernels.nms import maxima2d_mask as nms_mask
    from ethzasl_brisk_tpu.kernels.pallas_harris import (
        harris_score_i32_fused,
    )

    print(f"devices: {jax.devices()}", flush=True)
    frames = jnp.asarray(make_frames(batch, 480, 640))
    n_layers = 4
    geoms = [layer_geometry(i) for i in range(n_layers)]

    def scores_fn(fr):
        def one(img):
            return [
                harris_score_i32_fused(p)
                for p in build_pyramid(img, n_layers)
            ]

        return jax.vmap(one)(fr)

    scores = jax.block_until_ready(jax.jit(scores_fn)(frames))
    timed("scores only (pyramid+pallas harris)", scores_fn, frames,
          iters=iters)

    def maxima_fn(scs):
        return [
            jax.vmap(lambda s: nms_mask(s, 20))(sc) for sc in scs
        ]

    timed("maxima2d only (from scores)", maxima_fn, scores, iters=iters)

    def warps_fn(scs):
        out = []
        for i in range(n_layers):
            h, w = scs[i].shape[-2:]

            def one(args):
                sc, nb_above, nb_below = args
                mask = jnp.ones(sc.shape, bool)
                if nb_above is not None:
                    a, b, d = geoms[i].above_map
                    w_hi, w_lo = warp_scores_split(
                        nb_above, (a, b, d), (h, w))
                    for dy in (-1, 0, 1):
                        for dx in (-1, 0, 1):
                            mask &= center_ge_warped(
                                sc, _shift2d(w_hi, dy, dx, 0),
                                _shift2d(w_lo, dy, dx, 0), d)
                if nb_below is not None:
                    a, b, d = geoms[i].below_map
                    w_hi, w_lo = warp_scores_split(
                        nb_below, (a, b, d), (h, w))
                    mask &= center_ge_warped(sc, w_hi, w_lo, d)
                return mask

            above = scs[i + 1] if i + 1 < n_layers else None
            below = scs[i - 1] if i > 0 else None

            def mk(sc, ab=above, bl=below):
                return one((sc, ab, bl))

            out.append(
                jax.vmap(
                    lambda s, A=above, B=below, i=i: one(
                        (s,
                         A[0] if A is not None else None,
                         B[0] if B is not None else None)
                    )
                )(scs[i])
                if False
                else jax.vmap(one)(
                    (scs[i],
                     scs[i + 1] if i + 1 < n_layers else None,
                     scs[i - 1] if i > 0 else None)
                )
            )
        return out

    timed("warp compares only (from scores)", warps_fn, scores,
          iters=iters)

    def warps_above_only(scs):
        out = []
        for i in range(n_layers - 1):
            h, w = scs[i].shape[-2:]

            def one(args):
                sc, nb = args
                a, b, d = geoms[i].above_map
                w_hi, w_lo = warp_scores_split(nb, (a, b, d), (h, w))
                mask = jnp.ones(sc.shape, bool)
                for dy in (-1, 0, 1):
                    for dx in (-1, 0, 1):
                        mask &= center_ge_warped(
                            sc, _shift2d(w_hi, dy, dx, 0),
                            _shift2d(w_lo, dy, dx, 0), d)
                return mask

            out.append(jax.vmap(one)((scs[i], scs[i + 1])))
        return out

    timed("above 9-probe compares only", warps_above_only, scores,
          iters=iters)

    def warp_maps_only(scs):
        out = []
        for i in range(n_layers - 1):
            h, w = scs[i].shape[-2:]

            def one(nb):
                a, b, d = geoms[i].above_map
                return warp_scores_split(nb, (a, b, d), (h, w))

            out.append(jax.vmap(one)(scs[i + 1]))
        return out

    timed("warp map construction only (above)", warp_maps_only, scores,
          iters=iters)
    print("done", flush=True)


if __name__ == "__main__":
    main()
