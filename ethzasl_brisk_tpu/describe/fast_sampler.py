"""Alternative smoothed-intensity sampling: one-hot patch contraction.

NOTE: with the pattern tables threaded as jit arguments (DevicePattern
docs), the plain gather sampler is the fastest exact path on TPU for
single images; the batched pipeline uses the patch path below (the flat
stacked-frame gather path measured ~2.8x slower on the tunnel slice).

It computes the *same values bit-exactly* with a patch-based pattern:

1. one dynamic-slice integral patch per keypoint (PH x PW, int32),
   base-subtracted so every value fits float32 exactly
   (PH*PW*255 < 2^24);
2. per (keypoint, point), the 6 row coords x 6 col coords needed by the
   box/bilinear taps become one-hot vectors; the 36 taps are two
   separable contractions: rows = onehot_r @ patch (MXU), taps =
   rows * onehot_c reduced over columns (VPU);
3. raw image pixels are reconstructed from integral taps
   (img[y,x] = I[y+1,x+1] - I[y,x+1] - I[y+1,x] + I[y,x] — exact),
   so ONE patch serves the corner taps, the 12 box taps and the
   small-sigma bilinear path;
4. the exact fixed-point weight arithmetic of the reference
   (brisk-descriptor-extractor.cc:370-530, including the dx+dy>2
   corner-walk quirk) is then applied elementwise, identical to the
   gather path.

Zero-sum exactness: all tap groups combine integral values with
coefficients summing to zero (differences), so the per-patch base
subtraction cancels; the base is added back only where a lone absolute
integral value would be needed (it never is).

Supported pattern extent is (PW//2 - 2, PH//2 - 2) pixels around the
keypoint — large enough for the scales BRISK reaches on VGA-class
imagery; taps are clamped into the patch beyond that (set
``assert_extent`` in tests to validate a config).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _trunc_i32(x):
    return jnp.trunc(x).astype(jnp.int32)


def _trunc_div(val, d):
    return jnp.where(val >= 0, val // d, -((-val) // d))


def _tap_geometry(key_x, key_y, pat_x, pat_y, pat_sigma):
    """Per-(keypoint, point) tap coordinates + box weight precursors.

    Returns a dict with the 6-wide row/col integral coordinate grids and
    every quantity the value reconstruction needs (exact reference
    arithmetic, brisk-descriptor-extractor.cc:412-433).
    """
    xf = pat_x + key_x[..., None]
    yf = pat_y + key_y[..., None]
    sigma_half = pat_sigma
    small = sigma_half < 0.5

    x_1 = xf - sigma_half
    x1 = xf + sigma_half
    y_1 = yf - sigma_half
    y1 = yf + sigma_half
    x_left = _trunc_i32(x_1 + 0.5)
    y_top = _trunc_i32(y_1 + 0.5)
    x_right = _trunc_i32(x1 + 0.5)
    y_bottom = _trunc_i32(y1 + 0.5)

    x_i = _trunc_i32(xf)
    y_i = _trunc_i32(yf)

    dx_i = x_right - x_left - 1
    dy_i = y_bottom - y_top - 1
    big = dx_i + dy_i > 2
    cd_y = jnp.where(big, y_bottom - 1, y_bottom)
    c_x = jnp.where(big, x_right + 1, x_right)
    d_x = jnp.where(big, x_left + 1, x_left)

    # 6-wide integral-space tap grids (see reconstruction indices below).
    rows_box6 = jnp.stack(
        [y_top, y_top + 1, cd_y, cd_y + 1, y_bottom, y_bottom + 1], -1
    )
    rows_small6 = jnp.stack([y_i, y_i + 1, y_i + 2, y_i, y_i, y_i], -1)
    row_coords = jnp.where(small[..., None], rows_small6, rows_box6)

    cols_box6 = jnp.stack(
        [x_left, x_left + 1, d_x + 1, x_right, x_right + 1, c_x + 1], -1
    )
    cols_small6 = jnp.stack([x_i, x_i + 1, x_i + 2, x_i, x_i, x_i], -1)
    col_coords = jnp.where(small[..., None], cols_small6, cols_box6)

    return dict(
        xf=xf, yf=yf, small=small, big=big,
        x_1=x_1, x1=x1, y_1=y_1, y1=y1,
        x_left=x_left, y_top=y_top, x_right=x_right, y_bottom=y_bottom,
        x_i=x_i, y_i=y_i,
        row_coords=row_coords, col_coords=col_coords,
    )


def _contract_taps(patches, rel_rows, rel_cols, patch_h, patch_w,
                   matmul="f32"):
    """One-hot separable contraction: (c, PH, PW) patches x (c, p, 6)
    relative coords -> (c, p, 6, 6) int32 tap grid.

    ``matmul`` selects the row-selection matmul arithmetic — all three
    are bit-exact (anchored patch values are < PH*PW*255 <= 2^22):

    * ``"f32"``: one f32 matmul at Precision.HIGHEST (6 bf16 MXU
      passes — TPU matmuls otherwise cast inputs to bfloat16 and
      truncate the integral values to 8 mantissa bits).
    * ``"bf16_limb"``: split the patch into three 8-bit limbs; each
      limb (< 256) and the one-hot are bf16-exact, each dot output is
      a single patch value limb (one 1 per one-hot row), so three
      DEFAULT-precision matmuls recombine exactly in f32 (3 passes).
    * ``"int8_limb"``: same limbs as s8 x s8 -> s32 dots (TPU int8
      MXU rate, where available).
    """
    c, p = rel_rows.shape[0], rel_rows.shape[1]
    iota_h = jnp.arange(patch_h, dtype=jnp.int32)
    iota_w = jnp.arange(patch_w, dtype=jnp.int32)

    if matmul == "f32_colfirst":
        # Column-select FIRST: patches (c, PH, PW) @ col-one-hot
        # (c, PW, p*6) -> (c, PH, p*6), then the row pick reduces over
        # PH. The (c, p*6, PW) row-major intermediate of the row-first
        # order is the sampler's largest tensor (25 MB/chunk at
        # PW=128); col-first shrinks the intermediate by PW/PH (4x for
        # the 32x128 bucket) — bit-exact either way (values < 2^24,
        # HIGHEST precision).
        oh_c = (rel_cols[..., None] == iota_w).astype(jnp.float32)
        sel_c = jax.lax.dot_general(
            patches,
            oh_c.reshape(c, p * 6, patch_w),
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (c, PH, p*6)
        sel_c = sel_c.reshape(c, patch_h, p, 6)
        oh_r = (rel_rows[..., None] == iota_h).astype(jnp.float32)
        # Explicit broadcast-multiply-reduce for the row pick: an einsum
        # here lowers to c*p TINY batched dots (6x32 @ 32x6) — one MXU
        # tile-op each, ~1M tile-ops per phase, which was the sampler's
        # real bound. The mul+sum form stays on the VPU (fused, no
        # materialization of the (c,p,6,6,PH) product).
        sel_t = jnp.transpose(sel_c, (0, 2, 3, 1))  # (c, p, 6j, PH)
        taps = jnp.sum(
            oh_r[:, :, :, None, :] * sel_t[:, :, None, :, :], axis=-1
        )  # (c, p, 6i, 6j)
        return taps.astype(jnp.int32)

    oh_c = (rel_cols[..., None] == iota_w).astype(jnp.float32)

    def rowsel(oh_dtype, limb, prec):
        oh = (rel_rows[..., None] == iota_h).astype(oh_dtype)
        return jax.lax.dot_general(
            oh.reshape(c, p * 6, patch_h),
            limb,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=(
                jnp.int32 if oh_dtype == jnp.int8 else jnp.float32
            ),
            precision=prec,
        )

    if matmul == "f32":
        rows = rowsel(jnp.float32, patches, jax.lax.Precision.HIGHEST)
    else:
        pi = patches.astype(jnp.int32)
        limbs = [(pi >> s) & 0xFF for s in (0, 8, 16)]
        if matmul == "bf16_limb":
            parts = [
                rowsel(
                    jnp.bfloat16,
                    l.astype(jnp.bfloat16),
                    jax.lax.Precision.DEFAULT,
                )
                for l in limbs
            ]
            rows = parts[0] + parts[1] * 256.0 + parts[2] * 65536.0
        elif matmul == "int8_limb":
            # int8 is signed: bias each limb by -128 (exact in s8) and
            # add back 128 * (one-hot row sum == 1) after the dot.
            parts = [
                rowsel(
                    jnp.int8,
                    (l - 128).astype(jnp.int8),
                    jax.lax.Precision.DEFAULT,
                )
                for l in limbs
            ]
            rows = (
                (parts[0] + 128)
                + (parts[1] + 128) * 256
                + (parts[2] + 128) * 65536
            ).astype(jnp.float32)
        else:
            raise ValueError(f"unknown matmul mode {matmul!r}")
    rows = rows.reshape(c, p, 6, patch_w)
    taps = jnp.einsum(
        "cpiw,cpjw->cpij", rows, oh_c,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return taps.astype(jnp.int32)  # exact ints < 2^24


def _values_from_taps(taps, g, pat_scaling, pat_scaling2,
                      v1_rounding=False):
    """Reconstruct smoothed intensities from the (.., p, 6, 6) tap grid.

    Grid indices: rows 0=y_top 1=y_top+1 2=cd_y 3=cd_y+1 4=y_bottom
    5=y_bottom+1; cols 0=x_left 1=x_left+1 2=d_x+1 3=x_right 4=x_right+1
    5=c_x+1 (small path uses rows/cols 0..2).
    """
    big = g["big"]

    def it(ri, ci):
        return taps[..., ri, ci]

    # Image pixels img[y, x] = I[y+1,x+1] - I[y,x+1] - I[y+1,x] + I[y,x].
    img_a = it(1, 1) - it(0, 1) - it(1, 0) + it(0, 0)     # (y_top, x_left)
    img_b = it(1, 4) - it(0, 4) - it(1, 3) + it(0, 3)     # (y_top, x_right)
    c_col0 = jnp.where(big, it(3, 4), it(3, 3))
    c_col0_top = jnp.where(big, it(2, 4), it(2, 3))
    img_c = it(3, 5) - it(2, 5) - c_col0 + c_col0_top     # (cd_y, c_x)
    d_col0 = jnp.where(big, it(3, 1), it(3, 0))
    d_col0_top = jnp.where(big, it(2, 1), it(2, 0))
    img_d = it(3, 2) - it(2, 2) - d_col0 + d_col0_top     # (cd_y, d_x)

    r_x_1f = g["x_left"].astype(jnp.float32) - g["x_1"] + 0.5
    r_y_1f = g["y_top"].astype(jnp.float32) - g["y_1"] + 0.5
    r_x1f = g["x1"] - g["x_right"].astype(jnp.float32) + 0.5
    r_y1f = g["y1"] - g["y_bottom"].astype(jnp.float32) + 0.5
    scf = pat_scaling.astype(jnp.float32)
    w_a = _trunc_i32(r_x_1f * r_y_1f * scf)
    w_b = _trunc_i32(r_x1f * r_y_1f * scf)
    w_c = _trunc_i32(r_x1f * r_y1f * scf)
    w_d = _trunc_i32(r_x_1f * r_y1f * scf)
    r_x_1_i = _trunc_i32(r_x_1f * scf)
    r_y_1_i = _trunc_i32(r_y_1f * scf)
    r_x1_i = _trunc_i32(r_x1f * scf)
    r_y1_i = _trunc_i32(r_y1f * scf)

    corners = w_a * img_a + w_b * img_b + w_c * img_c + w_d * img_d

    t1 = it(0, 1)
    t2 = it(0, 3)
    t3 = it(1, 3)
    t4 = it(1, 4)
    t5 = it(4, 4)
    t6 = it(4, 3)
    t7 = it(5, 3)
    t8 = it(5, 1)
    t9 = it(4, 1)
    t10 = it(4, 0)
    t11 = it(1, 0)
    t12 = it(1, 1)

    upper = (t3 - t2 + t1 - t12) * r_y_1_i
    middle = (t6 - t3 + t12 - t9) * pat_scaling
    left = (t9 - t12 + t11 - t10) * r_x_1_i
    right = (t5 - t4 + t3 - t6) * r_x1_i
    bottom = (t7 - t6 + t9 - t8) * r_y1_i
    total = corners + upper + middle + left + right + bottom
    scaling2 = jnp.maximum(pat_scaling2, 1)
    if v1_rounding:  # legacy v1 half-divisor rounding (brisk-v1.cc:331)
        total = total + scaling2 // 2
    box = total // scaling2

    # Small-sigma bilinear: grid rows/cols 0..2.
    s00 = it(1, 1) - it(0, 1) - it(1, 0) + it(0, 0)
    s01 = it(1, 2) - it(0, 2) - it(1, 1) + it(0, 1)
    s10 = it(2, 1) - it(1, 1) - it(2, 0) + it(1, 0)
    s11 = it(2, 2) - it(1, 2) - it(2, 1) + it(1, 1)
    r_x = _trunc_i32((g["xf"] - g["x_i"].astype(jnp.float32)) * 1024)
    r_y = _trunc_i32((g["yf"] - g["y_i"].astype(jnp.float32)) * 1024)
    small_val = (
        (1024 - r_x) * (1024 - r_y) * s00 + r_x * (1024 - r_y) * s01
        + r_x * r_y * s11 + (1024 - r_x) * r_y * s10
        + (512 if v1_rounding else 0)
    ) // 1024

    return jnp.where(g["small"], small_val, box)


def _patch_anchors(key_x, key_y, rows_i, cols_i, patch_h, patch_w,
                   row_base):
    """Frame-local patch anchors (+ absolute slice anchor)."""
    ax = jnp.clip(
        _trunc_i32(key_x) - patch_w // 2, 0, max(cols_i - patch_w, 0)
    )
    ay = jnp.clip(
        _trunc_i32(key_y) - patch_h // 2, 0, max(rows_i - patch_h, 0)
    )
    ay_abs = ay if row_base is None else ay + row_base
    return ax, ay, ay_abs


def _slice_patches(integral, axk, ayk, patch_h, patch_w):
    """(chunk,) anchors -> (chunk, PH, PW) f32 base-subtracted patches.

    Subtract the separable field I[ay, x] + I[y, ax] - I[ay, ax]: every
    tap group is a second difference (invariant), and the anchored
    values become patch-local rectangle sums < PH*PW*255 < 2^24, hence
    float32-exact. (vmapped dynamic_slice; an advanced-index gather
    variant measured ~30x SLOWER on TPU.)
    """

    def get_patch(a_x, a_y):
        pat = jax.lax.dynamic_slice(
            integral, (a_y, a_x), (patch_h, patch_w)
        )
        anchored = pat - pat[0:1, :] - pat[:, 0:1] + pat[0, 0]
        return anchored.astype(jnp.float32)

    return jax.vmap(get_patch)(axk, ayk)


def _rel(coords, anchor, limit):
    return jnp.clip(coords - anchor[:, None, None], 0, limit - 1)


def smoothed_intensity_patch(
    img: jnp.ndarray,          # (H, W) uint8 (unused; kept for API parity)
    integral: jnp.ndarray,     # (H+1, W+1) int32
    key_x: jnp.ndarray,        # (K,) f32
    key_y: jnp.ndarray,        # (K,) f32
    pat_x: jnp.ndarray,        # (K, P) f32
    pat_y: jnp.ndarray,        # (K, P) f32
    pat_sigma: jnp.ndarray,    # (K, P) f32
    pat_scaling: jnp.ndarray,  # (K, P) i32
    pat_scaling2: jnp.ndarray,  # (K, P) i32
    patch_h: int = 128,
    patch_w: int = 192,
    chunk: int = 128,
    v1_rounding: bool = False,
    row_base: jnp.ndarray | None = None,  # (K,) i32 stacked-frame row shift
    frame_rows: int | None = None,        # frame-local image height
    matmul: str = "f32_colfirst",                  # see _contract_taps
) -> jnp.ndarray:
    """Reference-exact smoothed intensities, (K, P) int32.

    ``row_base``/``frame_rows`` support the stacked-frame batch layout
    (extractor.extract_descriptors_batch): key_y and ALL tap coordinates
    stay frame-local; only the patch's dynamic-slice row anchor is
    shifted by ``row_base``. The anchor is clamped inside the frame's
    (frame_rows+1)-row integral block, so each patch is one frame's
    rectangle (base-subtracted values stay < 2^24, hence float32-exact),
    and fractional weights are bit-identical to the per-frame path.
    """
    rows_i, cols_i = integral.shape
    if frame_rows is not None:
        rows_i = frame_rows + 1  # frame-local integral rows
    k, p = pat_x.shape

    g = _tap_geometry(key_x, key_y, pat_x, pat_y, pat_sigma)
    ax, ay, ay_abs = _patch_anchors(
        key_x, key_y, rows_i, cols_i, patch_h, patch_w, row_base
    )
    rel_rows = _rel(g["row_coords"], ay, patch_h)
    rel_cols = _rel(g["col_coords"], ax, patch_w)

    # ---- Chunked one-hot contraction.
    pad_k = (-k) % chunk
    n_chunks = (k + pad_k) // chunk

    def pad0(a):
        return jnp.pad(a, [(0, pad_k)] + [(0, 0)] * (a.ndim - 1))

    ax_c = pad0(ax).reshape(n_chunks, chunk)
    ay_c = pad0(ay_abs).reshape(n_chunks, chunk)
    rr = pad0(rel_rows).reshape(n_chunks, chunk, p, 6)
    rc = pad0(rel_cols).reshape(n_chunks, chunk, p, 6)

    def do_chunk(args):
        axk, ayk, rrk, rck = args
        patches = _slice_patches(integral, axk, ayk, patch_h, patch_w)
        return _contract_taps(
            patches, rrk, rck, patch_h, patch_w, matmul=matmul
        )

    taps = jax.lax.map(do_chunk, (ax_c, ay_c, rr, rc))
    taps = taps.reshape(n_chunks * chunk, p, 6, 6)[:k]

    return _values_from_taps(taps, g, pat_scaling, pat_scaling2,
                          v1_rounding=v1_rounding)


def smoothed_intensity_patch_ms(
    img: jnp.ndarray,
    integral: jnp.ndarray,
    key_x: jnp.ndarray,
    key_y: jnp.ndarray,
    pat_x: jnp.ndarray,
    pat_y: jnp.ndarray,
    pat_sigma: jnp.ndarray,
    pat_scaling: jnp.ndarray,
    pat_scaling2: jnp.ndarray,
    patch_sizes: tuple = ((32, 128), (64, 128), (128, 128)),
    chunk: int = 128,
    v1_rounding: bool = False,
    row_base: jnp.ndarray | None = None,
    frame_rows: int | None = None,
    matmul: str = "f32_colfirst",
) -> jnp.ndarray:
    """Multi-size patch sampler: per-keypoint patch dims by actual tap
    extent, bit-identical to the single-size path.

    The one-hot contraction's MXU cost scales with PH*PW, but only the
    largest-scale keypoints need the full patch — most sit on pyramid
    layer 0 with ~13 px pattern extent. Keypoints are bucketed by the
    smallest ``patch_sizes`` entry whose anchor window contains every
    integral tap, stably sorted by bucket, and processed in chunks where
    a ``lax.switch`` picks the bucket's statically-shaped kernel (sorted
    order makes chunks bucket-homogeneous, so nearly all chunks run the
    cheap branch). Tap values are independent of the patch framing (the
    base subtraction cancels in every tap group), so results are
    bit-identical for any bucket assignment; the LAST size must cover
    the maximum supported extent exactly like the single-size path.
    """
    rows_i, cols_i = integral.shape
    if frame_rows is not None:
        rows_i = frame_rows + 1
    k, p = pat_x.shape
    n_b = len(patch_sizes)

    g = _tap_geometry(key_x, key_y, pat_x, pat_y, pat_sigma)
    rows_q = g["row_coords"]  # (K, p, 6) absolute frame-local coords
    cols_q = g["col_coords"]
    tx = _trunc_i32(key_x)
    ty = _trunc_i32(key_y)
    rmin = rows_q.reshape(k, -1).min(axis=1)
    rmax = rows_q.reshape(k, -1).max(axis=1)
    cmin = cols_q.reshape(k, -1).min(axis=1)
    cmax = cols_q.reshape(k, -1).max(axis=1)

    branch = jnp.full((k,), n_b - 1, jnp.int32)
    for b in range(n_b - 2, -1, -1):
        ph, pw = patch_sizes[b]
        ay = jnp.clip(ty - ph // 2, 0, max(rows_i - ph, 0))
        ax = jnp.clip(tx - pw // 2, 0, max(cols_i - pw, 0))
        fits = (
            (rmin >= ay) & (rmax <= ay + ph - 1)
            & (cmin >= ax) & (cmax <= ax + pw - 1)
        )
        branch = jnp.where(fits, jnp.int32(b), branch)

    order = jnp.argsort(branch, stable=True)
    inv = jnp.argsort(order, stable=True)

    def take(a):
        return jnp.take(a, order, axis=0)

    tx_s, ty_s = take(tx), take(ty)
    rows_s, cols_s = take(rows_q), take(cols_q)
    br_s = jnp.take(branch, order)
    rb_s = None if row_base is None else jnp.take(row_base, order)

    pad_k = (-k) % chunk
    n_chunks = (k + pad_k) // chunk

    def pad0(a):
        return jnp.pad(a, [(0, pad_k)] + [(0, 0)] * (a.ndim - 1))

    tx_c = pad0(tx_s).reshape(n_chunks, chunk)
    ty_c = pad0(ty_s).reshape(n_chunks, chunk)
    rr_c = pad0(rows_s).reshape(n_chunks, chunk, p, 6)
    cc_c = pad0(cols_s).reshape(n_chunks, chunk, p, 6)
    br_c = pad0(br_s).reshape(n_chunks, chunk)
    rb_c = (
        jnp.zeros((n_chunks, chunk), jnp.int32)
        if rb_s is None
        else pad0(rb_s).reshape(n_chunks, chunk)
    )

    def make_branch(ph, pw):
        def fn(txk, tyk, rrk, cck, rbk):
            ayk = jnp.clip(tyk - ph // 2, 0, max(rows_i - ph, 0))
            axk = jnp.clip(txk - pw // 2, 0, max(cols_i - pw, 0))
            patches = _slice_patches(
                integral, axk, ayk + rbk, ph, pw
            )
            rr = _rel(rrk, ayk, ph)
            rc = _rel(cck, axk, pw)
            return _contract_taps(patches, rr, rc, ph, pw, matmul=matmul)

        return fn

    branches = [make_branch(ph, pw) for ph, pw in patch_sizes]

    def do_chunk(args):
        txk, tyk, rrk, cck, brk, rbk = args
        # Sorted order: the chunk's max bucket covers every element.
        return jax.lax.switch(
            jnp.max(brk), branches, txk, tyk, rrk, cck, rbk
        )

    taps = jax.lax.map(do_chunk, (tx_c, ty_c, rr_c, cc_c, br_c, rb_c))
    taps = taps.reshape(n_chunks * chunk, p, 6, 6)[:k]
    taps = jnp.take(taps, inv, axis=0)

    return _values_from_taps(taps, g, pat_scaling, pat_scaling2,
                          v1_rounding=v1_rounding)
