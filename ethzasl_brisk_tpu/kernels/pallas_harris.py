"""Fused Harris corner scores as a Pallas TPU kernel.

One VMEM pass per row tile: uint8 halo tile in (manual DMA), int32 score
tile out — the Scharr gradients, the mulhi products, the 3x3 binomial
smoothing and the response never touch HBM (the jnp formulation
materializes ~30 shifted int32 intermediates, which is HBM-bandwidth-
bound on TPU). Bit-exact vs ``kernels.harris.harris_score_i32`` (the
reference-exact integer math of ``brisk/src/harris-scores.cc:53-279``):

* shifts become circular rolls, exactly equivalent to zero-padded shifts
  because (a) global interior masks zero every row/col a wrapped COLUMN
  value could originate from, and (b) along rows, every valid output row
  only consumes taps strictly inside the halo tile (+-2 rows), so row
  wraps never reach it;
* tiles carry a 2-row halo on each side; the input is zero-padded by 2
  rows on the host so halo DMAs stay in bounds (padding rows are masked
  by the global interior test anyway).

Falls back to the jnp path on non-TPU backends (Mosaic is TPU-only;
tests run the kernel in interpreter mode to pin bit-equality).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ethzasl_brisk_tpu.kernels.harris import harris_score_i32
from ethzasl_brisk_tpu.kernels.nms import maxima2d_mask


def _roll2(x, dy, dx):
    """out[y, x] = x[y+dy, x+dx] with circular wrap (masked by callers)."""
    if dy:
        x = pltpu.roll(x, -dy % x.shape[0], axis=0)
    if dx:
        x = pltpu.roll(x, -dx % x.shape[1], axis=1)
    return x


def _pick_tile(h: int, target: int = 128) -> int | None:
    """Largest divisor of h that is a multiple of 8 and <= target (the
    DMA row offsets t*th must stay 8-row aligned). None if degenerate."""
    best = None
    for th in range(8, min(h, target) + 1, 8):
        if h % th == 0:
            best = th
    return best


def _harris_tile_kernel(
    th: int, h: int, w_real: int, img_ref, out_ref, tile_ref, sem
):
    t = pl.program_id(1)
    b = pl.program_id(0)
    # 4-row halo on each side keeps the DMA slice 8-row aligned (Mosaic
    # rejects sublane-misaligned VMEM slices); rows [t*th, t*th + th+8)
    # of the 4+4-padded input = original rows [t*th - 4, ...].
    cp = pltpu.make_async_copy(
        img_ref.at[b, pl.ds(t * th, th + 8), :], tile_ref, sem
    )
    cp.start()
    cp.wait()

    p = tile_ref[...].astype(jnp.int32)  # (th+8, W)
    rows_l = jax.lax.broadcasted_iota(jnp.int32, p.shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, p.shape, 1)
    # Global row in the ORIGINAL image (tile row 0 = global t*th - 4).
    grow = rows_l + t * th - 4
    w = w_real  # mask with the REAL width (lane dim padded to 128x)
    interior = (
        (grow >= 1) & (grow < h - 1) & (cols >= 1) & (cols < w - 1)
    )

    n = {
        (dy, dx): _roll2(p, dy, dx)
        for dy in (-1, 0, 1)
        for dx in (-1, 0, 1)
        if (dy, dx) != (0, 0)
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
    dx = jnp.where(interior, dx, 0)
    dy = jnp.where(interior, dy, 0)

    dxdx = (dx * dx) >> 16
    dydy = (dy * dy) >> 16
    dxdy = (dx * dy) >> 16

    def smooth(v):
        s = (
            4 * v
            + 2 * (_roll2(v, -1, 0) + _roll2(v, 1, 0)
                   + _roll2(v, 0, -1) + _roll2(v, 0, 1))
            + _roll2(v, -1, -1) + _roll2(v, -1, 1)
            + _roll2(v, 1, -1) + _roll2(v, 1, 1)
        )
        return s >> 4

    sxx = smooth(dxdx)
    syy = smooth(dydy)
    sxy = smooth(dxdy)

    trace_half = (sxx + syy) >> 1
    score = sxx * syy - sxy * sxy - ((trace_half * trace_half) >> 2)

    valid = (grow >= 2) & (grow < h - 2) & (cols >= 2) & (cols < w - 2)
    out_ref[0] = jnp.where(valid, score, 0)[4 : th + 4, :]


@functools.partial(jax.jit, static_argnames=("interpret",))
def harris_score_i32_batch_pallas(
    imgs: jnp.ndarray, *, interpret: bool = False
) -> jnp.ndarray:
    """(B, H, W) uint8 -> (B, H, W) int32 fused Harris scores."""
    b, h, w = imgs.shape
    th = _pick_tile(h)
    if th is None:  # degenerate height: fall back to the jnp path
        return jax.vmap(harris_score_i32)(imgs)
    # Lane dim of the manual HBM->VMEM DMA must be whole 128-tiles
    # (Mosaic rejects partial-lane memref slices); pad and mask.
    w_pad = -(-w // 128) * 128
    padded = jnp.pad(imgs, ((0, 0), (4, 4), (0, w_pad - w)))
    kernel = functools.partial(_harris_tile_kernel, th, h, w)
    out = pl.pallas_call(
        kernel,
        grid=(b, h // th),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(
            (1, th, w_pad), lambda i, t: (i, t, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, w_pad), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((th + 8, w_pad), jnp.uint8),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(padded)
    return out if w_pad == w else out[:, :, :w]


@jax.custom_batching.custom_vmap
def _fused_single(img: jnp.ndarray) -> jnp.ndarray:
    return harris_score_i32_batch_pallas(img[None])[0]


@_fused_single.def_vmap
def _fused_single_vmap(axis_size, in_batched, imgs):
    # vmap cannot lift the manual-DMA (HBM-space) input block spec; route
    # the batch straight into the kernel's own (B, tiles) grid instead.
    del axis_size
    assert in_batched[0]
    return harris_score_i32_batch_pallas(imgs), True


def harris_score_i32_fused(img: jnp.ndarray) -> jnp.ndarray:
    """Drop-in for harris_score_i32: Pallas on TPU, jnp elsewhere."""
    if jax.default_backend() != "tpu" or _pick_tile(img.shape[0]) is None:
        return harris_score_i32(img)
    return _fused_single(img)


# ---------------------------------------------------------------------------
# Harris + 2-D maxima mask in ONE VMEM pass.
# ---------------------------------------------------------------------------
def _harris_mask_tile_kernel(
    th, h, w_real, thr, img_ref, out_ref, mask_ref, tile_ref, sem
):
    """Score tile + NMS/threshold mask tile, fused.

    The separate ``maxima2d_mask`` pass re-reads the 1.2 MB score map
    from HBM and writes a mask map per layer; computing both in the
    tile's VMEM saves those round trips. Semantics are bit-equal to
    ``kernels.nms.maxima2d_mask``: for every in-border output cell the
    8 neighbor taps are real cells (rolled halo rows are computed, and
    border zeroing matches the dense kernel), so the padded-with-min
    construction of the dense path is never observable.
    """
    t = pl.program_id(1)
    b = pl.program_id(0)
    cp = pltpu.make_async_copy(
        img_ref.at[b, pl.ds(t * th, th + 8), :], tile_ref, sem
    )
    cp.start()
    cp.wait()

    p = tile_ref[...].astype(jnp.int32)
    rows_l = jax.lax.broadcasted_iota(jnp.int32, p.shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, p.shape, 1)
    grow = rows_l + t * th - 4
    w = w_real
    interior = (
        (grow >= 1) & (grow < h - 1) & (cols >= 1) & (cols < w - 1)
    )

    n = {
        (dy, dx): _roll2(p, dy, dx)
        for dy in (-1, 0, 1)
        for dx in (-1, 0, 1)
        if (dy, dx) != (0, 0)
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
    dx = jnp.where(interior, dx, 0)
    dy = jnp.where(interior, dy, 0)

    dxdx = (dx * dx) >> 16
    dydy = (dy * dy) >> 16
    dxdy = (dx * dy) >> 16

    def smooth(v):
        s = (
            4 * v
            + 2 * (_roll2(v, -1, 0) + _roll2(v, 1, 0)
                   + _roll2(v, 0, -1) + _roll2(v, 0, 1))
            + _roll2(v, -1, -1) + _roll2(v, -1, 1)
            + _roll2(v, 1, -1) + _roll2(v, 1, 1)
        )
        return s >> 4

    sxx = smooth(dxdx)
    syy = smooth(dydy)
    sxy = smooth(dxdy)

    trace_half = (sxx + syy) >> 1
    raw = sxx * syy - sxy * sxy - ((trace_half * trace_half) >> 2)

    valid = (grow >= 2) & (grow < h - 2) & (cols >= 2) & (cols < w - 2)
    score = jnp.where(valid, raw, 0)

    # 8-neighbor max over the zeroed ext score tile: output rows
    # [4, th+4) read rolled rows 3..th+4 (computed) and the in-border
    # column taps are all real cells — identical to maxima2d_mask.
    neigh = score
    first = True
    for ddy in (-1, 0, 1):
        for ddx in (-1, 0, 1):
            if (ddy, ddx) == (0, 0):
                continue
            v = _roll2(score, ddy, ddx)
            neigh = v if first else jnp.maximum(neigh, v)
            first = False
    mask = valid & (score >= thr) & (neigh <= score)

    out_ref[0] = score[4 : th + 4, :]
    mask_ref[0] = mask[4 : th + 4, :]


@functools.partial(jax.jit, static_argnames=("thr", "interpret"))
def harris_score_mask_batch_pallas(
    imgs: jnp.ndarray, *, thr: int, interpret: bool = False
):
    """(B, H, W) uint8 -> (scores int32, maxima mask bool), fused."""
    b, h, w = imgs.shape
    th = _pick_tile(h)
    if th is None:
        sc = jax.vmap(harris_score_i32)(imgs)
        return sc, jax.vmap(lambda s: maxima2d_mask(s, thr))(sc)
    w_pad = -(-w // 128) * 128
    padded = jnp.pad(imgs, ((0, 0), (4, 4), (0, w_pad - w)))
    kernel = functools.partial(_harris_mask_tile_kernel, th, h, w, thr)
    out, mask = pl.pallas_call(
        kernel,
        grid=(b, h // th),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=[
            pl.BlockSpec(
                (1, th, w_pad), lambda i, t: (i, t, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, th, w_pad), lambda i, t: (i, t, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, w_pad), jnp.int32),
            jax.ShapeDtypeStruct((b, h, w_pad), jnp.bool_),
        ],
        scratch_shapes=[
            pltpu.VMEM((th + 8, w_pad), jnp.uint8),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(padded)
    if w_pad != w:
        out = out[:, :, :w]
        mask = mask[:, :, :w]
    return out, mask


@functools.lru_cache(maxsize=None)
def _fused_mask_single(thr: int):
    """Per-threshold custom-vmap wrapper: vmap cannot lift the manual-DMA
    (HBM-space) input block spec, so batched calls route into the
    kernel's own (B, tiles) grid (same trick as ``_fused_single``)."""

    @jax.custom_batching.custom_vmap
    def fn(img: jnp.ndarray):
        sc, mask = harris_score_mask_batch_pallas(img[None], thr=thr)
        return sc[0], mask[0]

    @fn.def_vmap
    def _vmap(axis_size, in_batched, imgs):
        del axis_size
        assert in_batched[0]
        sc, mask = harris_score_mask_batch_pallas(imgs, thr=thr)
        return (sc, mask), (True, True)

    return fn


def harris_score_mask_fused(img: jnp.ndarray, thr: int):
    """(score, maxima mask) — fused Pallas on TPU, jnp elsewhere."""
    if jax.default_backend() != "tpu" or _pick_tile(img.shape[0]) is None:
        sc = harris_score_i32(img)
        return sc, maxima2d_mask(sc, thr)
    return _fused_mask_single(int(thr))(img)
