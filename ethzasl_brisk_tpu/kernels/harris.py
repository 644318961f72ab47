"""Harris corner scores with the reference's exact integer fixed-point math.

Reference: ``brisk/src/harris-scores.cc:53-279`` (``HarrisScoresSSE``):
  1. Scharr gradients x8:  dx = (10*(L-R) + 3*(UL-UR) + 3*(LL-LR)) << 3
     (int16; max |dx| = 32640, no overflow).
  2. Products via ``_mm_mulhi_epi16``: dxdx = (dx*dx) >> 16 (int16).
  3. 3x3 binomial smoothing:  (4c + 2*edge + corner) >> 4.
  4. score = dxdx*dydy - dxdy^2 - ((trace/2)^2 >> 2), int32.
Gradients live on rows/cols [1, n-2]; scores on [2, n-3]; zero elsewhere.

All intermediates fit int32, and C arithmetic shifts equal jnp's, so this
dense jnp formulation is bit-identical. XLA fuses the whole thing into one
VPU pass over the image — the TPU replacement for the reference's multi-pass
SSE pipeline.

Also provides the float variant mirroring ``HarrisScoreCalculatorFloat``
(``brisk/src/harris-score-calculator-float.cc:53-57``).
"""
from __future__ import annotations

import jax.numpy as jnp


def _shift(p: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """p shifted so out[i,j] = p[i+dy, j+dx], zero-padded."""
    h, w = p.shape
    out = jnp.zeros_like(p)
    ys = slice(max(dy, 0), h + min(dy, 0))
    yd = slice(max(-dy, 0), h + min(-dy, 0))
    xs = slice(max(dx, 0), w + min(dx, 0))
    xd = slice(max(-dx, 0), w + min(-dx, 0))
    return out.at[yd, xd].set(p[ys, xs])


def _scharr_x8(p: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Scharr gradients x8 on the interior [1, n-2]; zero on the border."""
    h, w = p.shape
    n = {
        (dy, dx): _shift(p, dy, dx)
        for dy in (-1, 0, 1)
        for dx in (-1, 0, 1)
    }
    dx = (
        10 * (n[(0, -1)] - n[(0, 1)])
        + 3 * (n[(-1, -1)] - n[(-1, 1)])
        + 3 * (n[(1, -1)] - n[(1, 1)])
    ) << 3
    dy = (
        10 * (n[(-1, 0)] - n[(1, 0)])
        + 3 * (n[(-1, -1)] - n[(1, -1)])
        + 3 * (n[(-1, 1)] - n[(1, 1)])
    ) << 3
    interior = jnp.zeros((h, w), bool).at[1 : h - 1, 1 : w - 1].set(True)
    return jnp.where(interior, dx, 0), jnp.where(interior, dy, 0)


def _smooth3x3_shift4(v: jnp.ndarray) -> jnp.ndarray:
    """(4c + 2*(N,S,E,W) + diag) >> 4 binomial smoothing."""
    s = (
        4 * v
        + 2
        * (
            _shift(v, -1, 0)
            + _shift(v, 1, 0)
            + _shift(v, 0, -1)
            + _shift(v, 0, 1)
        )
        + _shift(v, -1, -1)
        + _shift(v, -1, 1)
        + _shift(v, 1, -1)
        + _shift(v, 1, 1)
    )
    return s >> 4


def harris_score_i32(img: jnp.ndarray) -> jnp.ndarray:
    """uint8 (H, W) -> int32 (H, W) Harris scores, reference-exact."""
    h, w = img.shape
    p = img.astype(jnp.int32)
    dx, dy = _scharr_x8(p)

    # mulhi_epi16: high 16 bits of the exact 32-bit product.
    dxdx = (dx * dx) >> 16
    dydy = (dy * dy) >> 16
    dxdy = (dx * dy) >> 16

    sxx = _smooth3x3_shift4(dxdx)
    syy = _smooth3x3_shift4(dydy)
    sxy = _smooth3x3_shift4(dxdy)

    trace_half = (sxx + syy) >> 1
    score = sxx * syy - sxy * sxy - ((trace_half * trace_half) >> 2)

    valid = jnp.zeros((h, w), bool).at[2 : h - 2, 2 : w - 2].set(True)
    return jnp.where(valid, score, 0)


def harris_score_f32(img: jnp.ndarray) -> jnp.ndarray:
    """Float Harris variant (HarrisScoreCalculatorFloat semantics).

    Scharr/16 kernel, float 3x3 Gaussian [[1,2,1],[2,4,2],[1,2,1]]/16
    applied to gradient products, score = det - trace^2/16
    (harris-score-calculator-float.cc:53-57 + vectorized-filters 32F).
    """
    h, w = img.shape
    p = img.astype(jnp.float32)
    n = {
        (dy, dx): _shift(p, dy, dx)
        for dy in (-1, 0, 1)
        for dx in (-1, 0, 1)
    }
    gx = (
        10.0 * (n[(0, -1)] - n[(0, 1)])
        + 3.0 * (n[(-1, -1)] - n[(-1, 1)])
        + 3.0 * (n[(1, -1)] - n[(1, 1)])
    ) / 16.0
    gy = (
        10.0 * (n[(-1, 0)] - n[(1, 0)])
        + 3.0 * (n[(-1, -1)] - n[(1, -1)])
        + 3.0 * (n[(-1, 1)] - n[(1, 1)])
    ) / 16.0
    interior = jnp.zeros((h, w), bool).at[1 : h - 1, 1 : w - 1].set(True)
    gx = jnp.where(interior, gx, 0.0)
    gy = jnp.where(interior, gy, 0.0)

    def smooth(v):
        s = (
            4.0 * v
            + 2.0
            * (
                _shift(v, -1, 0)
                + _shift(v, 1, 0)
                + _shift(v, 0, -1)
                + _shift(v, 0, 1)
            )
            + _shift(v, -1, -1)
            + _shift(v, -1, 1)
            + _shift(v, 1, -1)
            + _shift(v, 1, 1)
        )
        return s / 16.0

    sxx, syy, sxy = smooth(gx * gx), smooth(gy * gy), smooth(gx * gy)
    trace = sxx + syy
    score = sxx * syy - sxy * sxy - trace * trace / 16.0
    valid = jnp.zeros((h, w), bool).at[2 : h - 2, 2 : w - 2].set(True)
    return jnp.where(valid, score, 0.0)
