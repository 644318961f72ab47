"""TPU validation + timing of the single-call Pallas patch sampler.

Checks bit-equality vs patch_ms on real Mosaic (not interpret mode) at
bench-like shapes, then times both (honest checksum timing).

Run on TPU: python tools/probe_sampler_v2.py
"""
from __future__ import annotations

import os
import sys

import numpy as np

import jax
import jax.numpy as jnp

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path[:0] = [_ROOT, os.path.join(_ROOT, 'tools')]
sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
from tpu_timing import burn_in, timed  # noqa: E402


def main():
    print("devices", jax.devices(), flush=True)
    from scipy import ndimage

    from ethzasl_brisk_tpu.core.pattern import brisk_v2_pattern
    from ethzasl_brisk_tpu.describe.extractor import (
        DevicePattern,
        _stack_frames,
        scale_index,
    )
    from ethzasl_brisk_tpu.describe.fast_sampler import (
        smoothed_intensity_patch_ms,
    )
    from ethzasl_brisk_tpu.describe.pallas_sampler import (
        smoothed_intensity_patch_pallas,
    )

    rng = np.random.default_rng(3)
    B, H, W = 16, 480, 640
    K = 640  # per frame (bench describe capacity)
    base = rng.integers(0, 256, (B, H, W)).astype(np.float32)
    imgs = jnp.asarray(
        np.clip(
            ndimage.convolve(base, np.ones((1, 5, 5)) / 25.0,
                             mode="nearest"), 0, 255
        ).astype(np.uint8)
    )
    img_pad, int_flat = _stack_frames(imgs)
    kx = jnp.asarray(rng.uniform(40, W - 40, (B * K,)).astype(np.float32))
    ky = jnp.asarray(rng.uniform(40, H - 40, (B * K,)).astype(np.float32))
    sizes = jnp.asarray(
        rng.choice(
            [12.0, 14.0, 18.0, 24.0, 40.0, 54.0], (B * K,),
            p=[0.4, 0.25, 0.15, 0.1, 0.07, 0.03],
        ).astype(np.float32)
    )
    row_base = jnp.repeat(jnp.arange(B, dtype=jnp.int32) * (H + 1), K)
    pat = DevicePattern.from_host(brisk_v2_pattern(1.0))
    sidx = scale_index(sizes, True)
    args = (
        img_pad, int_flat, kx, ky,
        pat.lut_x[sidx, 0], pat.lut_y[sidx, 0], pat.lut_sigma[sidx],
        pat.lut_scaling[sidx], pat.lut_scaling2[sidx],
    )
    cfg = ((32, 128), (64, 128), (128, 128))

    burn_in(4.0)

    ref = np.asarray(smoothed_intensity_patch_ms(
        *args, patch_sizes=cfg, row_base=row_base, frame_rows=H
    ))
    got = np.asarray(smoothed_intensity_patch_pallas(
        *args, patch_sizes=cfg, row_base=row_base, frame_rows=H
    ))
    eq = (ref == got).all()
    print("bit-equal on TPU:", bool(eq), flush=True)
    if not eq:
        bad = np.argwhere(ref != got)
        print("mismatches:", bad.shape[0], "first:", bad[:5],
              ref[tuple(bad[0])], got[tuple(bad[0])])
        sys.exit(1)

    timed(
        "patch_ms 10240 kpts",
        lambda: smoothed_intensity_patch_ms(
            *args, patch_sizes=cfg, row_base=row_base, frame_rows=H
        ),
        iters=4,
    )
    timed(
        "patch_pallas single-call 10240 kpts",
        lambda: smoothed_intensity_patch_pallas(
            *args, patch_sizes=cfg, row_base=row_base, frame_rows=H
        ),
        iters=4,
    )
    for grp in (8, 16, 32):
        timed(
            f"patch_pallas group={grp}",
            lambda grp=grp: smoothed_intensity_patch_pallas(
                *args, patch_sizes=cfg, row_base=row_base, frame_rows=H,
                group=grp,
            ),
            iters=4,
        )


if __name__ == "__main__":
    main()
