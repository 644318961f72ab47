"""Dense 2-D non-maximum suppression.

Reference: ``HarrisScoreCalculator::Get2dMaxima``
(``brisk/src/harris-score-calculator.cc:57-106``): a pixel on
rows/cols [2, n-3] is a maximum if score >= absoluteThreshold and no
8-neighbor exceeds it (ties survive). The reference's sparse row scan
becomes a dense 3x3 max-pool comparison — one fused VPU pass.
"""
from __future__ import annotations

import jax.numpy as jnp


def _neighbor_max(score: jnp.ndarray, pad_val) -> jnp.ndarray:
    p = jnp.pad(score, 1, constant_values=pad_val)
    h, w = score.shape
    shifts = [
        p[dy : dy + h, dx : dx + w]
        for dy in (0, 1, 2)
        for dx in (0, 1, 2)
        if not (dy == 1 and dx == 1)
    ]
    return jnp.max(jnp.stack(shifts), axis=0)


def maxima2d_mask(
    score: jnp.ndarray, absolute_threshold, border: int = 2
) -> jnp.ndarray:
    """Bool mask of 2-D maxima (>= all 8 neighbors, >= threshold)."""
    h, w = score.shape
    neigh = _neighbor_max(score, jnp.iinfo(score.dtype).min
                          if jnp.issubdtype(score.dtype, jnp.integer)
                          else -jnp.inf)
    mask = (score >= absolute_threshold) & (neigh <= score)
    inb = jnp.zeros((h, w), bool)
    inb = inb.at[border : h - border, border : w - border].set(True)
    return mask & inb
