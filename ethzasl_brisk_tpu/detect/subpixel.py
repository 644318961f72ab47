"""Sub-pixel 2-D quadratic refinement.

Reference: ``ScaleSpaceLayer::Subpixel2D``
(``brisk/include/brisk/internal/scale-space-layer-inl.h:560-693``): a
least-squares 2-D quadratic fit over the 3x3 score patch, with a Hessian
test, corner fallback and boundary clamping (including the reference's
``delta_y = delta_x1/delta_x2`` assignment in the boundary branch, which we
reproduce faithfully for parity).

Implemented with jnp ops over batches of 3x3 patches — works under jit
(float32) and with NumPy float64 inputs for reference-exact host tests.
"""
from __future__ import annotations

import jax.numpy as jnp


def subpixel2d(s, xp=jnp):
    """Refine a batch of 3x3 score patches.

    Args:
      s: (..., 3, 3) float array; s[..., i, j] = score(x + j - 1, y + i - 1)
        i.e. row index i is y, col index j is x. (The reference passes
        s_row_col with row = "x index"; the mapping here follows its call
        site at scale-space-layer-inl.h:394-402: first index varies x.)
      xp: array namespace (jnp or numpy).

    Returns:
      (delta_x, delta_y, refined_max): each (...,).
    """
    # Match the reference naming: s_a_b = Score(u - 1 + a, v - 1 + b).
    s_0_0 = s[..., 0, 0]
    s_0_1 = s[..., 0, 1]
    s_0_2 = s[..., 0, 2]
    s_1_0 = s[..., 1, 0]
    s_1_1 = s[..., 1, 1]
    s_1_2 = s[..., 1, 2]
    s_2_0 = s[..., 2, 0]
    s_2_1 = s[..., 2, 1]
    s_2_2 = s[..., 2, 2]

    tmp1 = s_0_0 + s_0_2 - 2 * s_1_1 + s_2_0 + s_2_2
    coeff1 = 3 * (tmp1 + s_0_1 - ((s_1_0 + s_1_2) / 2.0) + s_2_1)
    coeff2 = 3 * (tmp1 - ((s_0_1 + s_2_1) / 2.0) + s_1_0 + s_1_2)
    tmp2 = s_0_2 - s_2_0
    tmp3 = s_0_0 + tmp2 - s_2_2
    tmp4 = tmp3 - 2 * tmp2
    coeff3 = -3 * (tmp3 + s_0_1 - s_2_1)
    coeff4 = -3 * (tmp4 + s_1_0 - s_1_2)
    coeff5 = (s_0_0 - s_0_2 - s_2_0 + s_2_2) / 4.0
    coeff6 = (
        -(
            s_0_0
            + s_0_2
            - ((s_1_0 + s_0_1 + s_1_2 + s_2_1) / 2.0)
            - 5 * s_1_1
            + s_2_0
            + s_2_2
        )
        / 2.01
    )

    h_det = 4 * coeff1 * coeff2 - coeff5 * coeff5

    # --- Branch A: H_det == 0 -> deltas 0.
    # --- Branch B: not (H_det > 0 and coeff1 < 0) -> corner max.
    corner_vals = xp.stack(
        [
            coeff3 + coeff4 + coeff5,    # (+1, +1)
            -coeff3 + coeff4 - coeff5,   # (-1, +1)
            coeff3 - coeff4 - coeff5,    # (+1, -1)
            -coeff3 - coeff4 + coeff5,   # (-1, -1)
        ],
        axis=-1,
    )
    # The reference truncates corner values to int before comparing
    # (int tmp_max = coeff3 + ...; scale-space-layer-inl.h:590-611) and keeps
    # the first maximum in its check order (later corners only win with '>').
    corner_vals_i = xp.trunc(corner_vals)
    corner_idx = xp.argmax(
        xp.concatenate(
            [
                corner_vals_i[..., :1],
                # Strict '>' for later candidates: subtract a half so ties
                # keep the earlier index under argmax.
                corner_vals_i[..., 1:] - 0.5,
            ],
            axis=-1,
        ),
        axis=-1,
    )
    corner_dx = xp.stack(
        [xp.ones_like(coeff1), -xp.ones_like(coeff1),
         xp.ones_like(coeff1), -xp.ones_like(coeff1)], axis=-1
    )
    corner_dy = xp.stack(
        [xp.ones_like(coeff1), xp.ones_like(coeff1),
         -xp.ones_like(coeff1), -xp.ones_like(coeff1)], axis=-1
    )
    corner_tmp_max = xp.take_along_axis(
        corner_vals_i, corner_idx[..., None], axis=-1
    )[..., 0]
    b_dx = xp.take_along_axis(corner_dx, corner_idx[..., None], axis=-1)[
        ..., 0
    ]
    b_dy = xp.take_along_axis(corner_dy, corner_idx[..., None], axis=-1)[
        ..., 0
    ]
    b_max = (corner_tmp_max + coeff1 + coeff2 + coeff6) / 18.0

    # --- Branch C: interior solution with boundary correction.
    # The reference divides FLOAT casts of the double numerator and
    # denominator in float (scale-space-layer-inl.h:616-620), and every
    # boundary delta is likewise a float division of float casts
    # (:640-670) — under refine_dtype=float64 the pre-division rounding
    # is observable in the last ULP of x/y (1/454 golden keypoints).
    def f32c(v):
        return xp.asarray(v).astype(xp.float32)

    safe_det = xp.where(h_det == 0, 1.0, h_det)
    dx0 = f32c(2 * coeff2 * coeff3 - coeff4 * coeff5) / f32c(-safe_det)
    dy0 = f32c(2 * coeff1 * coeff4 - coeff3 * coeff5) / f32c(-safe_det)

    tx = dx0 > 1.0
    tx_ = dx0 < -1.0
    ty = dy0 > 1.0
    ty_ = dy0 < -1.0
    out_of_bounds = tx | tx_ | ty | ty_

    # The reference divides by float(2*coeff) directly (:641-670); this
    # branch is only SELECTED when h_det > 0 and coeff1 < 0, which
    # forces coeff2 < 0 too — so on every lane whose result survives
    # the final where-select both divisors are strictly nonzero and the
    # guard below never changes a selected value. It exists purely to
    # keep discarded lanes finite (no divide-by-zero RuntimeWarnings on
    # the NumPy host-test path, no NaNs under jax_debug_nans).
    div_c1 = f32c(xp.where(coeff1 == 0, 1.0, 2 * coeff1))
    div_c2 = f32c(xp.where(coeff2 == 0, 1.0, 2 * coeff2))

    delta_x1 = xp.where(tx, 1.0, xp.where(tx_, -1.0, 0.0)).astype(
        xp.float32
    )
    delta_y1 = xp.where(
        tx,
        -f32c(coeff4 + coeff5) / div_c2,
        xp.where(tx_, -f32c(coeff4 - coeff5) / div_c2, 0.0),
    ).astype(xp.float32)
    delta_y1 = xp.clip(delta_y1, -1.0, 1.0)

    delta_y2 = xp.where(ty, 1.0, xp.where(ty_, -1.0, 0.0)).astype(
        xp.float32
    )
    delta_x2 = xp.where(
        ty,
        -f32c(coeff3 + coeff5) / div_c1,
        xp.where(ty_, -f32c(coeff3 - coeff5) / div_c1, 0.0),
    ).astype(xp.float32)
    delta_x2 = xp.clip(delta_x2, -1.0, 1.0)

    def quad(dx, dy):
        # Double chain over float deltas, rounded to float at the
        # max1/max2 assignment (:672-679).
        return (
            coeff1 * dx * dx
            + coeff2 * dy * dy
            + coeff3 * dx
            + coeff4 * dy
            + coeff5 * dx * dy
            + coeff6
        ) / 18.0

    max1 = f32c(quad(delta_x1, delta_y1))
    max2 = f32c(quad(delta_x2, delta_y2))
    pick1 = max1 > max2
    # Faithful to the reference: both deltas get delta_x{1,2}
    # (scale-space-layer-inl.h:679-687).
    bnd_dx = xp.where(pick1, delta_x1, delta_x2)
    bnd_dy = xp.where(pick1, delta_x1, delta_x2)
    bnd_max = xp.where(pick1, max1, max2)

    c_dx = xp.where(out_of_bounds, bnd_dx, dx0)
    c_dy = xp.where(out_of_bounds, bnd_dy, dy0)
    c_max = xp.where(out_of_bounds, bnd_max, quad(dx0, dy0))

    # Select branches.
    is_zero = h_det == 0
    is_corner = ~(h_det > 0) | ~(coeff1 < 0)

    delta_x = xp.where(is_zero, 0.0, xp.where(is_corner, b_dx, c_dx))
    delta_y = xp.where(is_zero, 0.0, xp.where(is_corner, b_dy, c_dy))
    refined = xp.where(
        is_zero, coeff6 / 18.0, xp.where(is_corner, b_max, c_max)
    )
    return delta_x, delta_y, refined
