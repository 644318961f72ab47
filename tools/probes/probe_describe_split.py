"""Probe: where does describe's ~208 ms/batch64 go? (TPU)

The Pallas sampler is wrapped in substantial host-XLA work per phase:
tap geometry, bucket assignment (argsort over K), index packing
(gather/repeat/pad to (n_groups, group, 8, pl8)), and tap weighting +
unsort afterwards. This times nested prefixes of ONE sampler phase on
the real bench keypoint mix (detect -> valid-compact to 640/frame),
plus the full two-phase describe, to split kernel vs glue:

  prep   host-XLA bucket/sort/index packing only (debug_stop="prep")
  taps   + the pallas_call itself            (debug_stop="taps")
  phase  + unsort + _values_from_taps        (full sampler call)
  full   the whole two-phase describe (extract_descriptors_compact)

Run: python tools/probes/probe_describe_split.py
"""
from __future__ import annotations

import functools
import os
import sys

import numpy as np

_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
sys.path[:0] = [_ROOT, os.path.join(_ROOT, "tools")]


def main():
    import jax
    import jax.numpy as jnp

    import bench
    from ethzasl_brisk_tpu.describe.extractor import (
        _stack_frames,
        extract_descriptors_compact,
        scale_index,
    )
    from ethzasl_brisk_tpu.describe.pallas_sampler import (
        smoothed_intensity_patch_pallas,
    )
    from ethzasl_brisk_tpu.pipeline import BriskFeature
    from tpu_timing import burn_in, timed

    feature = BriskFeature(
        octaves=2, uniformity_radius=30.0, absolute_threshold=20.0,
        max_candidates=(8192, 4096, 2048, 1024), max_keypoints=1024,
        topk_impl="block",
    )
    frames = jnp.asarray(bench.bench_frames(64))
    b, h, w = frames.shape
    print("devices", jax.devices(), flush=True)

    kps = jax.jit(jax.vmap(feature.detect))(frames)
    n_valid = np.asarray(kps.valid.sum(axis=1))
    print(f"kpts/frame min {n_valid.min()} max {n_valid.max()}")

    pat = feature.extractor.pattern
    capacity = 640 * b

    # The compacted keypoint set + stacked frames the pipeline's
    # describe sees (mirrors extract_descriptors_compact's prologue).
    k = kps.x.shape[-1]
    n = b * k
    flat_kp = jax.tree_util.tree_map(
        lambda a: a.reshape((n,) + a.shape[2:]), kps
    )

    def compact(fr, fkp):
        img_pad, int_flat = _stack_frames(fr)
        order = jnp.argsort(~fkp.valid, stable=True)
        sel = order[:capacity]
        ckp = jax.tree_util.tree_map(
            lambda a: jnp.take(a, sel, axis=0), fkp
        )
        row_base = (sel // k).astype(jnp.int32) * (h + 1)
        return img_pad, int_flat, ckp, row_base

    img_pad, int_flat, ckp, row_base = jax.jit(compact)(frames, flat_kp)

    scale_idx = scale_index(ckp.size, True)
    sigma = pat.lut_sigma[scale_idx]
    scaling = pat.lut_scaling[scale_idx]
    scaling2 = pat.lut_scaling2[scale_idx]
    pat_x0 = pat.lut_x[scale_idx, 0]
    pat_y0 = pat.lut_y[scale_idx, 0]
    sizes = ((32, 128), (64, 128), (128, 128))
    if "--ladder" in sys.argv:
        # Span-tuned bucket ladder: bench keypoint row spans are
        # scale-quantized at {40, 56, 72, 80, 111} (54/12/11/15/8%),
        # so the default 32-bucket is EMPTY and 22% pay the catch-all.
        sizes = ((48, 128), (64, 128), (88, 128), (128, 128))

    burn_in(4.0)

    group = 8
    for a in sys.argv:
        if a.startswith("--g"):
            group = int(a[3:])

    def one_phase(int_f, kx, ky, px, py, sg, sc, sc2, rb, stop):
        return smoothed_intensity_patch_pallas(
            None, int_f, kx, ky, px, py, sg, sc, sc2,
            patch_sizes=sizes, row_base=rb, frame_rows=h,
            group=group, debug_stop=stop,
        )

    args = (int_flat, ckp.x, ckp.y, pat_x0, pat_y0, sigma, scaling,
            scaling2, row_base)
    t_geom = timed(
        "geom (tap geometry + buckets)",
        functools.partial(one_phase, stop="geom"), *args,
    )
    t_prep = timed(
        "prep (host-XLA packing)",
        functools.partial(one_phase, stop="prep"), *args,
    )
    print(f"  -> index packing {1e3*(t_prep-t_geom):.1f} ms", flush=True)
    t_taps = timed(
        "prep+kernel (taps)",
        functools.partial(one_phase, stop="taps"), *args,
    )
    t_phase = timed(
        "one full phase", functools.partial(one_phase, stop=None), *args,
    )
    print(f"  -> kernel {1e3*(t_taps-t_prep):.1f} ms, "
          f"weighting+unsort {1e3*(t_phase-t_taps):.1f} ms", flush=True)

    def full(fr, fkp, p):
        okp, desc = extract_descriptors_compact(
            p, fr,
            jax.tree_util.tree_map(
                lambda a: a.reshape((b, k) + a.shape[1:]), fkp
            ),
            capacity=capacity, sampler="patch_pallas",
            patch_h=128, patch_w=128,
        )
        return desc

    timed("full 2-phase describe", full, frames, flat_kp, pat)


if __name__ == "__main__":
    main()
