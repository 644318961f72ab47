"""Greedy keypoint uniformity enforcement and bucketing.

Reference: ``EnforceKeyPointUniformity``
(``brisk/include/brisk/internal/uniformity-enforcement-inl.h:44-194``):
score-sorted greedy pass over candidates, painting a saturating-add
occupancy grid with a 31x31 radial LUT and rejecting candidates whose cell
exceeds ``sqrt(sqrt(score/maxScore))*255``; and ``KeyPointBucketing``
(``key-point-bucketing-inl.h:45-112``): per-grid-cell caps.

TPU-native design (exact): the greedy pass is sequential, but each
candidate only ever READS the occupancy value at its own cell, and the
uint8 saturating adds commute into ``min(255, sum of paints)`` (paints are
non-negative, so per-step clipping equals clipping the raw running sum).
That turns the reference's grid-walk into a *blocked interaction* scheme:

* process candidates in blocks of B (score order preserved);
* cross-block influence goes through an int32 scatter-ADD occupancy
  accumulator, updated once per block (clip applied at read time);
* within-block influence is a (B, B) pairwise paint matrix gathered from
  the same 31x31 LUT (entry [j, i] = paint of accepted candidate j at
  candidate i's cell);
* the only sequential part left is a B-step ``fori_loop`` per block over
  tiny (B,) vectors — O(K) scalar-ish steps instead of O(K) full 31x31
  patch scatters;
* blocks whose candidates are all invalid are skipped entirely
  (``while_loop``; candidates arrive sorted valid-first from top-k).

Bit-exact vs the sequential reference semantics: same paint values (the
LUT table itself is gathered, not recomputed), same read/clip points, same
acceptance condition and cap counting, same order.
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


@partial(
    jax.jit,
    static_argnames=("rows", "cols", "radius", "max_num_kpt", "block"),
)
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
    block: int = 128,
) -> jnp.ndarray:
    """Greedy uniformity mask over score-descending candidates.

    Args:
      xs, ys: (K,) int32 candidate coords (score-sorted, descending).
      scores: (K,) candidate scores (any numeric dtype).
      valid: (K,) bool.
      rows, cols: layer image size.
      radius: uniformity radius (> 0).
      max_num_kpt: acceptance cap.
      block: candidates per interaction block (power of two).

    Returns:
      (K,) bool acceptance mask (in the same candidate order).
    """
    k = xs.shape[0]
    scaling = np.float32(15.0 / radius)
    occ_rows = rows * int(math.ceil(scaling)) + 32
    occ_cols = cols * int(math.ceil(scaling)) + 32
    lut = jnp.asarray(radial_lut())          # (31, 31) f32
    lut_flat = lut.reshape(-1)

    scores_f = scores.astype(jnp.float32)
    max_score = scores_f[0]  # candidates arrive sorted descending

    # nsc1 = sqrt(sqrt(score/max))*255 (uniformity-enforcement-inl.h:77).
    # Invalid candidates never paint or accept; zero their (possibly NaN
    # from INT32_MIN scores) nsc1 so masked arithmetic stays finite.
    nsc1 = jnp.sqrt(jnp.sqrt(scores_f / max_score)) * 255.0
    nsc1 = jnp.where(valid, nsc1, 0.0)
    cx = (xs.astype(jnp.float32) * scaling + 16.0).astype(jnp.int32)
    cy = (ys.astype(jnp.float32) * scaling + 16.0).astype(jnp.int32)

    b = min(block, k)
    n_blocks = -(-k // b)
    kp = n_blocks * b
    pad = kp - k

    def padded(a, fill):
        return jnp.pad(a, (0, pad), constant_values=fill).reshape(
            n_blocks, b
        )

    cx_b = padded(cx, 16)
    cy_b = padded(cy, 16)
    nsc1_b = padded(nsc1, 0.0)
    valid_b = padded(valid, False)
    block_live = jnp.any(valid_b, axis=1)  # skip all-invalid blocks

    # Paint patch per candidate: ceil(LUT * 0.99 * nsc1) (inl.h:112 class).
    ar = jnp.arange(31)

    def run_block(bi, occ, n_acc):
        bcx, bcy = cx_b[bi], cy_b[bi]
        bnsc, bval = nsc1_b[bi], valid_b[bi]

        # Pre-block occupancy at each candidate's cell (raw int32 sums).
        base = occ[bcy, bcx]

        # Within-block pairwise paint: M[j, i] = ceil(lut[dyi, dxi] *
        # (0.99*nsc1[j])) where (dyi, dxi) = candidate i's offset inside
        # candidate j's 31x31 patch; zero outside the patch.
        dy = bcy[None, :] - bcy[:, None] + 15   # (j, i)
        dx = bcx[None, :] - bcx[:, None] + 15
        inside = (dy >= 0) & (dy < 31) & (dx >= 0) & (dx < 31)
        idx = jnp.clip(dy, 0, 30) * 31 + jnp.clip(dx, 0, 30)
        lutv = jnp.take(lut_flat, idx.reshape(-1)).reshape(b, b)
        m = jnp.ceil(lutv * (0.99 * bnsc[:, None])).astype(jnp.int32)
        m = jnp.where(inside, m, 0)

        def body(t, st):
            acc, accept, n = st
            s0 = jnp.minimum(base[t] + acc[t], 255).astype(jnp.float32)
            ok = bval[t] & (n < max_num_kpt) & ~(bnsc[t] < s0)
            acc = acc + m[t] * ok.astype(jnp.int32)
            accept = accept.at[t].set(ok)
            return acc, accept, n + ok.astype(jnp.int32)

        acc0 = jnp.zeros((b,), jnp.int32)
        accept0 = jnp.zeros((b,), bool)
        _, accept_blk, n_acc = jax.lax.fori_loop(
            0, b, body, (acc0, accept0, n_acc)
        )

        # Commit accepted paints to the occupancy accumulator (scatter-ADD
        # of raw sums; clip happens at read).
        paint = jnp.ceil(
            lut[None] * (0.99 * bnsc[:, None, None])
        ).astype(jnp.int32) * accept_blk[:, None, None].astype(jnp.int32)
        ridx = bcy[:, None, None] - 15 + ar[None, :, None]
        cidx = bcx[:, None, None] - 15 + ar[None, None, :]
        occ = occ.at[ridx, cidx].add(paint)
        return occ, n_acc, accept_blk

    def cond(state):
        bi, occ, n_acc, accept = state
        return (bi < n_blocks) & block_live[jnp.minimum(bi, n_blocks - 1)]

    def step(state):
        bi, occ, n_acc, accept = state
        occ, n_acc, accept_blk = run_block(bi, occ, n_acc)
        accept = jax.lax.dynamic_update_slice(accept, accept_blk, (bi * b,))
        return bi + 1, occ, n_acc, accept

    occ0 = jnp.zeros((occ_rows, occ_cols), jnp.int32)
    accept0 = jnp.zeros((kp,), bool)
    _, _, _, accept = jax.lax.while_loop(
        cond, step, (jnp.int32(0), occ0, jnp.int32(0), accept0)
    )
    return accept[:k]


@partial(
    jax.jit, static_argnames=("rows", "cols", "radius", "max_num_kpt")
)
def enforce_uniformity_sequential(
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
    """Direct per-candidate transcription of the reference's greedy loop
    (uint8 occupancy grid, one 31x31 patch update per accepted candidate).

    Kept as the semantics oracle for `enforce_uniformity` (the blocked
    production path); ~20x slower on TPU.
    """
    k = xs.shape[0]
    scaling = np.float32(15.0 / radius)
    occ_rows = rows * int(math.ceil(scaling)) + 32
    occ_cols = cols * int(math.ceil(scaling)) + 32
    lut = jnp.asarray(radial_lut())

    scores_f = scores.astype(jnp.float32)
    max_score = scores_f[0]
    nsc1 = jnp.sqrt(jnp.sqrt(scores_f / max_score)) * 255.0
    cx = (xs.astype(jnp.float32) * scaling + 16.0).astype(jnp.int32)
    cy = (ys.astype(jnp.float32) * scaling + 16.0).astype(jnp.int32)

    def body(i, state):
        occupancy, accept, n_acc = state
        s0 = occupancy[cy[i], cx[i]].astype(jnp.float32)
        ok = valid[i] & (n_acc < max_num_kpt) & ~(nsc1[i] < s0)

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
