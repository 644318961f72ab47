"""Probe: pyramid downsampling vs Pallas harris cost split.

probe_masks showed scores (pyramid+harris) at ~59 ms/batch16 while all
mask logic is <10 ms — isolate the pyramid construction (jnp resamplers)
from the per-layer Pallas harris calls.
"""
from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from tools.probe_topk2 import timed  # noqa: E402
from tools.profile_stages import make_frames  # noqa: E402


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    import jax
    import jax.numpy as jnp

    from ethzasl_brisk_tpu.detect.scale_space import build_pyramid
    from ethzasl_brisk_tpu.kernels.downsample import (
        halfsample8,
        twothirdsample8,
    )
    from ethzasl_brisk_tpu.kernels.harris import harris_score_i32
    from ethzasl_brisk_tpu.kernels.pallas_harris import (
        harris_score_i32_batch_pallas,
        harris_score_i32_fused,
    )

    print(f"devices: {jax.devices()}", flush=True)
    frames = jnp.asarray(make_frames(batch, 480, 640))
    n_layers = 4

    def pyr_fn(fr):
        return jax.vmap(lambda im: build_pyramid(im, n_layers))(fr)

    pyr = jax.block_until_ready(jax.jit(pyr_fn)(frames))
    timed("pyramid only (jnp resamplers)", pyr_fn, frames, iters=iters)

    def tt_fn(fr):
        return jax.vmap(twothirdsample8)(fr)

    timed("twothirdsample8 only (layer1)", tt_fn, frames, iters=iters)

    def hh_fn(fr):
        return jax.vmap(halfsample8)(fr)

    timed("halfsample8 only (layer2)", hh_fn, frames, iters=iters)

    def harris_fn(layers):
        return [harris_score_i32_batch_pallas(p) for p in layers]

    timed("pallas harris x4 (from pyramid)", harris_fn, pyr, iters=iters)

    def harris_vmap_fn(layers):
        return [jax.vmap(harris_score_i32_fused)(p) for p in layers]

    timed("pallas harris x4 via custom_vmap", harris_vmap_fn, pyr,
          iters=iters)

    def harris_jnp_fn(layers):
        return [jax.vmap(harris_score_i32)(p) for p in layers]

    timed("jnp harris x4 (from pyramid)", harris_jnp_fn, pyr, iters=iters)
    print("done", flush=True)


if __name__ == "__main__":
    main()
