"""Pyramid down-sampling with the reference's exact integer rounding.

Reference: ``brisk/src/image-down-sampling.cc`` — SIMD half-sampling
(2x2 average, round-up-by-one at each pairwise step, ``Halfsample8``
:142) and two-thirds sampling (3x3 -> 2x2 weighted average,
``Twothirdsample8`` :550). The scalar rounding spec is the reference's own
unit test (``test-downsampling.cc:67-140``): every pairwise average is
``(a + b + 1) / 2`` in integer arithmetic.

On TPU these are fixed-weight strided window reductions — implemented as
reshapes + integer averages so XLA fuses them into a single pass; rounding
is reproduced exactly.
"""
from __future__ import annotations

import jax.numpy as jnp


def _avg_round_up(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return (a + b + 1) >> 1


def halfsample8(img: jnp.ndarray) -> jnp.ndarray:
    """uint8 (H, W) -> uint8 (H//2, W//2), reference rounding.

    dst = min(((v11+1+v21)/2 + (v12+1+v22)/2 + 1)/2, 255)
    (test-downsampling.cc:83-85).
    """
    h2, w2 = img.shape[0] // 2, img.shape[1] // 2
    v = img[: 2 * h2, : 2 * w2].astype(jnp.int32)
    blocks = v.reshape(h2, 2, w2, 2)
    col0 = _avg_round_up(blocks[:, 0, :, 0], blocks[:, 1, :, 0])
    col1 = _avg_round_up(blocks[:, 0, :, 1], blocks[:, 1, :, 1])
    out = _avg_round_up(col0, col1)
    return jnp.minimum(out, 255).astype(jnp.uint8)


def twothirdsample8(img: jnp.ndarray) -> jnp.ndarray:
    """uint8 (H, W) -> uint8 (H//3*2, W//3*2), reference rounding.

    Each 3x3 source block {A1..C3} produces a 2x2 output:
      D = ((A + B + 1)/2 + A + 1)/2 per column (rows A,B -> upper; C,B ->
      lower), then the same two-thirds blend horizontally
    (test-downsampling.cc:118-140).
    """
    h3, w3 = img.shape[0] // 3, img.shape[1] // 3
    v = img[: 3 * h3, : 3 * w3].astype(jnp.int32)
    b = v.reshape(h3, 3, w3, 3)  # (bh, 3, bw, 3)

    a_row, b_row, c_row = b[:, 0], b[:, 1], b[:, 2]  # (bh, bw, 3)
    upper = _avg_round_up(_avg_round_up(a_row, b_row), a_row)  # (bh, bw, 3)
    lower = _avg_round_up(_avg_round_up(c_row, b_row), c_row)

    def blend_h(row):  # (bh, bw, 3) -> (bh, bw, 2)
        left = _avg_round_up(_avg_round_up(row[..., 0], row[..., 1]),
                             row[..., 0])
        right = _avg_round_up(_avg_round_up(row[..., 2], row[..., 1]),
                              row[..., 2])
        return jnp.stack([left, right], axis=-1)

    up2 = blend_h(upper)   # (bh, bw, 2)
    lo2 = blend_h(lower)
    out = jnp.stack([up2, lo2], axis=1)  # (bh, 2, bw, 2)
    out = out.reshape(2 * h3, 2 * w3)
    return (out & 0xFF).astype(jnp.uint8)


def halfsample16(img: jnp.ndarray) -> jnp.ndarray:
    """uint16 variant (Halfsample16, image-down-sampling.cc:56)."""
    h2, w2 = img.shape[0] // 2, img.shape[1] // 2
    v = img[: 2 * h2, : 2 * w2].astype(jnp.int32)
    blocks = v.reshape(h2, 2, w2, 2)
    col0 = _avg_round_up(blocks[:, 0, :, 0], blocks[:, 1, :, 0])
    col1 = _avg_round_up(blocks[:, 0, :, 1], blocks[:, 1, :, 1])
    out = _avg_round_up(col0, col1)
    return jnp.minimum(out, 65535).astype(jnp.uint16)


def twothirdsample16(img: jnp.ndarray) -> jnp.ndarray:
    """uint16 variant (Twothirdsample16, image-down-sampling.cc:394)."""
    h3, w3 = img.shape[0] // 3, img.shape[1] // 3
    v = img[: 3 * h3, : 3 * w3].astype(jnp.int32)
    b = v.reshape(h3, 3, w3, 3)
    a_row, b_row, c_row = b[:, 0], b[:, 1], b[:, 2]
    upper = _avg_round_up(_avg_round_up(a_row, b_row), a_row)
    lower = _avg_round_up(_avg_round_up(c_row, b_row), c_row)

    def blend_h(row):
        left = _avg_round_up(_avg_round_up(row[..., 0], row[..., 1]),
                             row[..., 0])
        right = _avg_round_up(_avg_round_up(row[..., 2], row[..., 1]),
                              row[..., 2])
        return jnp.stack([left, right], axis=-1)

    out = jnp.stack([blend_h(upper), blend_h(lower)], axis=1)
    out = out.reshape(2 * h3, 2 * w3)
    return (out & 0xFFFF).astype(jnp.uint16)
