"""Probe: exact two-stage BLOCK top-k vs lax.top_k at bench shapes.

Round-3 measured a per-ROW-cap two-stage top_k 44% faster but rejected
it as inexact (bench rows hold up to 50 maxima — any practical per-row
cap can overflow). This probes the BLOCK variant: per-block top-r over
flat blocks of the row-major map, then a global top-k over the reduced
(nb*r) set. Tie order is preserved exactly (block-major (block, rank)
order == ascending flat index among kept elements), and overflow that
COULD have changed the result is detectable on device:

    unsafe = any(block_valid_count > r  AND  block_rth_value >= kth)

so exactness is verifiable per call instead of assumed.

Modes:
  --stats  (CPU)  per-layer per-block maxima-count distributions on the
                  real bench crops, for block sizes 512..4096 -> how
                  much headroom a given (block, r) has.
  default  (TPU)  stage timings + bitwise equality vs lax.top_k on the
                  real masked layer-0 score maps at batch 64.
"""
from __future__ import annotations

import os
import sys

import numpy as np

_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
sys.path[:0] = [_ROOT, os.path.join(_ROOT, "tools")]

INT32_MIN = -(2 ** 31)


def real_masked_maps():
    """(scores, masks) per layer for the 4 unique bench crops (CPU)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import bench
    from ethzasl_brisk_tpu.detect.scale_space import (
        DetectorConfig,
        layer_score_masks,
    )
    from ethzasl_brisk_tpu.kernels.harris import harris_score_i32

    frames = bench.bench_frames(4)
    config = DetectorConfig(
        octaves=2, absolute_threshold=20.0, max_candidates=8192,
        max_num_kpt=1024, uniformity_radius=30.0,
    )
    fn = jax.jit(
        lambda im: layer_score_masks(im, config, harris_score_i32)
    )
    per_frame = [fn(jnp.asarray(f)) for f in frames]
    n_layers = len(per_frame[0][0])
    scores = [
        np.stack([np.asarray(pf[0][i]) for pf in per_frame])
        for i in range(n_layers)
    ]
    masks = [
        np.stack([np.asarray(pf[1][i]) for pf in per_frame])
        for i in range(n_layers)
    ]
    return scores, masks


def stats():
    scores, masks = real_masked_maps()
    for li, m in enumerate(masks):
        b, h, w = m.shape
        n = h * w
        flat = m.reshape(b, n)
        print(f"layer {li}: {h}x{w}={n}  maxima/frame "
              f"{flat.sum(1).min()}..{flat.sum(1).max()}")
        for block in (512, 1024, 2048, 4096):
            nb = (n + block - 1) // block
            pad = np.zeros((b, nb * block), bool)
            pad[:, :n] = flat
            counts = pad.reshape(b, nb, block).sum(2)
            q = np.percentile(counts, [50, 99, 100], axis=None)
            print(f"  block {block:5d}: nb={nb:4d} count "
                  f"p50={q[0]:.0f} p99={q[1]:.0f} max={q[2]:.0f}")


def topk_block_np_check():
    """CPU bitwise check of the two-stage scheme on the real maps."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    scores, masks = real_masked_maps()
    from ethzasl_brisk_tpu.kernels.topk import topk_block

    caps = (8192, 4096, 2048, 1024)
    for li, (sc, m) in enumerate(zip(scores, masks)):
        b, h, w = m.shape
        n = h * w
        k = min(caps[li], n)
        x = np.where(m, sc, INT32_MIN).reshape(b, n).astype(np.int32)
        xs = jnp.asarray(x)
        vr, ir = jax.jit(jax.vmap(lambda a: jax.lax.top_k(a, k)))(xs)
        f = jax.jit(jax.vmap(
            lambda a: topk_block(a, k, block=2048, r=256)
        ))
        vb, ib, ex = f(xs)
        vr, ir = np.asarray(vr), np.asarray(ir)
        vb, ib, ex = np.asarray(vb), np.asarray(ib), np.asarray(ex)
        valid = vr > INT32_MIN
        ok_v = (vb == vr).all()
        ok_i = (ib[valid] == ir[valid]).all()
        print(f"layer {li}: k={k} exact_flag={ex.all()} "
              f"values_equal={ok_v} valid_idx_equal={ok_i} "
              f"valid={valid.sum()}")


def prep(path="/tmp/blocktopk_maps.npz"):
    """CPU mask prep in a SUBPROCESS (forcing cpu is process-wide)."""
    scores, masks = real_masked_maps()
    np.savez(path, score0=scores[0], mask0=masks[0])
    print("wrote", path)


def tpu_timing():
    import subprocess

    path = "/tmp/blocktopk_maps.npz"
    if not os.path.exists(path):
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--prep"],
            check=True,
        )

    import jax
    import jax.numpy as jnp

    from tpu_timing import burn_in, timed

    z = np.load(path)
    sc, m = z["score0"], z["mask0"]
    b4, h, w = m.shape
    n = h * w
    B = 64
    reps = B // b4
    x_np = np.where(m, sc, INT32_MIN).reshape(b4, n).astype(np.int32)
    x_np = np.tile(x_np, (reps, 1))
    print("devices", jax.devices(), flush=True)
    x = jnp.asarray(x_np)
    burn_in(4.0)

    K = 8192
    timed("lax.top_k (64,307k) k=8192",
          lambda a: jax.vmap(lambda r: jax.lax.top_k(r, K))(a), x)

    from ethzasl_brisk_tpu.kernels.topk import topk_block

    for block, r in ((1024, 128), (2048, 192), (2048, 256),
                     (4096, 384), (4096, 512)):
        timed(
            f"topk_block B={block} r={r}",
            lambda a, blk=block, rr=r: jax.vmap(
                lambda row: topk_block(row, K, block=blk, r=rr)
            )(a),
            x,
        )

    # Stage-1 alone (per-block top-r) to split the cost.
    def stage1(a, block=2048, r=256):
        nb = n // block
        xb = a[:, : nb * block].reshape(B * nb, block)
        return jax.lax.top_k(xb, r)

    timed("stage1 only (2048/256)", stage1, x)


if __name__ == "__main__":
    if "--stats" in sys.argv:
        stats()
    elif "--check" in sys.argv:
        topk_block_np_check()
    elif "--prep" in sys.argv:
        prep()
    else:
        tpu_timing()
