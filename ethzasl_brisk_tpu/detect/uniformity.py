"""Greedy keypoint uniformity enforcement and bucketing.

Reference: ``EnforceKeyPointUniformity``
(``brisk/include/brisk/internal/uniformity-enforcement-inl.h:44-194``):
score-sorted greedy pass over candidates, painting a saturating-add
occupancy grid with a 31x31 radial LUT and rejecting candidates whose cell
exceeds ``sqrt(sqrt(score/maxScore))*255``; and ``KeyPointBucketing``
(``key-point-bucketing-inl.h:45-112``): per-grid-cell caps.

The greedy pass is inherently sequential over accepted points, so it runs as
a bounded ``lax.fori_loop`` over the score-sorted candidate list (candidates
arrive pre-sorted from top-k) with dynamic-slice occupancy updates — cheap
relative to the dense stages, and fully jit-compatible.
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def radial_lut() -> np.ndarray:
    """The 31x31 radial falloff LUT (scale-space-layer-inl.h:89-97)."""
    xs = np.arange(31, dtype=np.float64)
    d2 = (15.0 - xs[None, :]) ** 2 + (15.0 - xs[:, None]) ** 2
    return np.maximum(1.0 - d2 / 225.0, 0.0).astype(np.float32)


@partial(jax.jit, static_argnames=("rows", "cols", "radius", "max_num_kpt"))
def enforce_uniformity(
    xs: jnp.ndarray,
    ys: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    *,
    rows: int,
    cols: int,
    radius: float,
    max_num_kpt: int,
) -> jnp.ndarray:
    """Greedy uniformity mask over score-descending candidates.

    Args:
      xs, ys: (K,) int32 candidate coords (score-sorted, descending).
      scores: (K,) candidate scores (any numeric dtype).
      valid: (K,) bool.
      rows, cols: layer image size.
      radius: uniformity radius (> 0).
      max_num_kpt: acceptance cap.

    Returns:
      (K,) bool acceptance mask (in the same candidate order).
    """
    k = xs.shape[0]
    scaling = np.float32(15.0 / radius)
    occ_rows = rows * int(math.ceil(scaling)) + 32
    occ_cols = cols * int(math.ceil(scaling)) + 32
    lut = jnp.asarray(radial_lut())

    scores_f = scores.astype(jnp.float32)
    max_score = scores_f[0]  # candidates arrive sorted descending

    # nsc1 = sqrt(sqrt(score/max))*255 (uniformity-enforcement-inl.h:77).
    nsc1 = jnp.sqrt(jnp.sqrt(scores_f / max_score)) * 255.0
    cx = (xs.astype(jnp.float32) * scaling + 16.0).astype(jnp.int32)
    cy = (ys.astype(jnp.float32) * scaling + 16.0).astype(jnp.int32)
    # Pre-computed paint patches: ceil(LUT * 0.99 * nsc1), saturating uint8.
    # (Computed lazily per accepted point inside the loop to save memory.)

    def body(i, state):
        occupancy, accept, n_acc = state
        s0 = occupancy[cy[i], cx[i]].astype(jnp.float32)
        ok = (
            valid[i]
            & (n_acc < max_num_kpt)
            & ~(nsc1[i] < s0)
        )

        patch = jax.lax.dynamic_slice(
            occupancy, (cy[i] - 15, cx[i] - 15), (31, 31)
        )
        paint = jnp.ceil(lut * (0.99 * nsc1[i])).astype(jnp.int32)
        new_patch = jnp.minimum(patch.astype(jnp.int32) + paint, 255).astype(
            jnp.uint8
        )
        occupancy = jax.lax.cond(
            ok,
            lambda o: jax.lax.dynamic_update_slice(
                o, new_patch, (cy[i] - 15, cx[i] - 15)
            ),
            lambda o: o,
            occupancy,
        )
        accept = accept.at[i].set(ok)
        return occupancy, accept, n_acc + ok.astype(jnp.int32)

    occupancy0 = jnp.zeros((occ_rows, occ_cols), jnp.uint8)
    accept0 = jnp.zeros((k,), bool)
    _, accept, _ = jax.lax.fori_loop(
        0, k, body, (occupancy0, accept0, jnp.int32(0))
    )
    return accept


def bucket_keypoints(
    xs: jnp.ndarray,
    ys: jnp.ndarray,
    valid: jnp.ndarray,
    *,
    rows: int,
    cols: int,
    max_num_kpt: int,
    num_buckets_u: int,
    num_buckets_v: int,
) -> jnp.ndarray:
    """KeyPointBucketing mask (key-point-bucketing-inl.h:45-112).

    Candidates must be score-sorted descending. Single-bucket mode keeps the
    top max_num_kpt; otherwise each UxV cell keeps its first
    ceil(max/(U*V)) arrivals.
    """
    k = xs.shape[0]
    order_rank = jnp.cumsum(valid.astype(jnp.int32)) - 1  # rank among valid
    if num_buckets_u == 1 or num_buckets_v == 1:
        return valid & (order_rank < max_num_kpt)

    # Reference: cap = max/(U*V) (floor); step = 1 + (dim-1)/buckets
    # (key-point-bucketing.h:64-66).
    per_bucket = max_num_kpt // (num_buckets_u * num_buckets_v)
    step_u = 1 + (cols - 1) // num_buckets_u
    step_v = 1 + (rows - 1) // num_buckets_v
    bu = xs // step_u
    bv = ys // step_v
    bucket_id = bu * num_buckets_v + bv

    # Rank within bucket among valid candidates (score order preserved).
    one_hot = (
        bucket_id[:, None]
        == jnp.arange(num_buckets_u * num_buckets_v)[None, :]
    ) & valid[:, None]
    rank_in_bucket = jnp.cumsum(one_hot.astype(jnp.int32), axis=0) - 1
    my_rank = jnp.take_along_axis(
        rank_in_bucket, bucket_id[:, None], axis=1
    )[:, 0]
    return valid & (my_rank < per_bucket)
