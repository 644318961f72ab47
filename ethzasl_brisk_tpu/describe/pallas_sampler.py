"""Pallas fused patch sampler: DMA-pipelined smoothed-intensity taps.

The XLA patch sampler (fast_sampler.py) costs ~3 us per keypoint SLOT:
its per-chunk `vmap(dynamic_slice)` serializes patch extraction and its
one-hot contraction dispatches through generic fusions. This kernel
fuses, per keypoint:

    HBM window DMA  ->  base-subtract  ->  col-select matmul (MXU)
                    ->  row pick (VPU sublane mask-reduce)  ->  taps

with the window DMAs double-buffered across a group of G keypoints per
grid step, so extraction overlaps compute. Values are BIT-IDENTICAL to
fast_sampler._contract_taps: the anchored window values stay < 2^24
(f32-exact), every tap group is a second difference (the window-corner
base cancels), and the matmul runs f32 at Precision.HIGHEST.

Bucketing mirrors smoothed_intensity_patch_ms: keypoints are sorted by
the smallest patch bucket that contains their taps; ONE pallas_call
processes every group, each grid step branching (@pl.when) into its
group's bucket — per-bucket statically-shaped window scratch and DMA
geometry — so the taps output is written exactly once (the earlier
bucket-chained design re-copied the whole taps array per bucket).

Alignment rules (Mosaic DMA): row offsets 8-aligned (int32 sublane),
col offsets 128-aligned (lane tile) — windows are (ph + 8) x (pw + 128)
with the keypoint anchor's misalignment folded into the relative
coordinates.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ethzasl_brisk_tpu.describe.fast_sampler import (
    _tap_geometry,
    _trunc_i32,
    _values_from_taps,
)


def _kernel(
    g: int, buckets: tuple, pl8: int, n_rows: int,
    # prefetch scalars
    ay_ref, ax_ref, br_ref,
    # array inputs
    int_hbm, relr_ref, relc_ref,
    # outputs
    taps_ref,
    # scratch: one double-buffered window per bucket + one DMA sem array
    *scratch,
):
    """One grid step = one keypoint group. The group's bucket id selects
    one statically-shaped branch (its own VMEM window scratch + DMA
    geometry) via @pl.when — every group is processed EXACTLY once, in
    ONE kernel launch, instead of the earlier chain of one pallas_call
    per bucket whose non-owned groups paid a full taps block copy
    (6x the taps HBM traffic plus per-call launch latency)."""
    win_refs = scratch[:-1]
    sem = scratch[-1]  # (n_buckets, 2) DMA semaphores
    gi = pl.program_id(0)

    for b, (ph, pw, aligned) in enumerate(buckets):
        _bucket_branch(
            g, ph + 8, pw if aligned else pw + 128, pl8, b,
            ay_ref, ax_ref, br_ref, int_hbm, relr_ref, relc_ref,
            taps_ref, win_refs[b], sem, gi,
        )


def _bucket_branch(
    g, ph_win, pw_win, pl8, bucket_id,
    ay_ref, ax_ref, br_ref, int_hbm, relr_ref, relc_ref,
    taps_ref, win_ref, sem, gi,
):
    # 4 bf16 limbs (two exact f32 accumulators) once the window's max
    # anchored value can exceed 2^24; 3 limbs otherwise.
    n_limbs = 3 if ph_win * pw_win * 255 < 2**24 else 4

    def dma(slot, j):
        ay = pl.multiple_of(ay_ref[gi * g + j], 8)
        ax = pl.multiple_of(ax_ref[gi * g + j], 128)
        return pltpu.make_async_copy(
            int_hbm.at[pl.ds(ay, ph_win), pl.ds(ax, pw_win)],
            win_ref.at[slot],
            sem.at[bucket_id, slot],
        )

    @pl.when(br_ref[gi] == bucket_id)
    def _process():
        dma(0, 0).start()

        def body(j, _):
            slot = j % 2

            @pl.when(j + 1 < g)
            def _():
                dma((j + 1) % 2, j + 1).start()

            dma(slot, j).wait()

            wi = win_ref[slot]
            # Base-subtract at the window corner: rectangle values stay
            # nonnegative and < ph_win*pw_win*255 < 2^24; the base
            # cancels in every downstream tap group.
            anchored_i = wi - wi[0:1, :] - wi[:, 0:1] + wi[0, 0]

            # Index vectors come PRE-FLATTENED from XLA (Mosaic rejects
            # lane reshapes like (p, 6) -> (p*6,)): relc (pl8,) with
            # lane l = point*6 + jcol; relr holds 4 i32 words per
            # keypoint, each packing TWO 16-bit row coordinates (rows
            # 2m low, 2m+1 high) broadcast over the point's col lanes.
            colv = relc_ref[j].reshape(1, pl8)
            sub_w = jax.lax.broadcasted_iota(
                jnp.int32, (pw_win, pl8), 0
            )
            oh_c = (sub_w == colv).astype(jnp.bfloat16)  # (pw_win, pl8)
            # Mosaic does NOT honor precision=HIGHEST (measured: bf16
            # truncation of the window values). Split into 8-bit limbs —
            # each limb (< 256) is bf16-exact and each dot output selects
            # a single limb value, so every `part` is f32-exact. Small
            # windows (max anchored value ph_win*pw_win*255 < 2^24) use 3
            # limbs recombined into ONE exact f32 accumulator; larger
            # windows (e.g. the AST 256x256 catch-all bucket: 264*384*255
            # ~ 25.9M > 2^24) use 4 limbs in TWO accumulators — f32
            # cannot represent odd integers >= 2^24, so limbs {0,1} and
            # {2,3} are each recombined to an exact < 2^16 value, row-
            # picked separately, and rejoined in int32 after the pick.
            def limb_dot(shift_amt):
                limb = ((anchored_i >> shift_amt) & 0xFF).astype(
                    jnp.bfloat16
                )
                return jax.lax.dot_general(
                    limb, oh_c,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

            if n_limbs <= 3:
                sels = [
                    limb_dot(0) + limb_dot(8) * 256.0
                    + limb_dot(16) * 65536.0
                ]
                weights = [1]
            else:
                sels = [
                    limb_dot(0) + limb_dot(8) * 256.0,
                    limb_dot(16) + limb_dot(24) * 256.0,
                ]
                weights = [1, 65536]
            # each (ph_win, pl8) f32, exact

            # Row pick: six sublane mask-reduces (i = 0..5) per
            # accumulator; the i axis is padded to 8 sublanes and written
            # as one aligned tile.
            sub_h = jax.lax.broadcasted_iota(
                jnp.int32, (ph_win, pl8), 0
            )
            rows_out = []
            for i in range(6):
                # 16-bit unpack: word m = i//2 holds rows 2m (low) and
                # 2m+1 (high) — see the host-side packing note.
                word = relr_ref[4 * j + i // 2].reshape(1, pl8)
                ri = (word >> (16 * (i % 2))) & 0xFFFF
                mask = (sub_h == ri).astype(jnp.float32)
                acc = None
                for sel, wgt in zip(sels, weights):
                    picked = jnp.sum(mask * sel, axis=0).astype(
                        jnp.int32
                    ) * wgt
                    acc = picked if acc is None else acc + picked
                rows_out.append(acc)  # (pl8,) int32
            zero = rows_out[0] * 0
            rows_out += [zero, zero]  # pad the 8-sublane output tile
            taps_ref[j] = jnp.stack(rows_out, axis=0)

        # Unrolled: the per-keypoint compute chains are independent, so
        # unrolling lets Mosaic overlap them (describe 121.5 -> 119.3
        # ms/batch64 — probe_describe_split 2026-08-20).
        jax.lax.fori_loop(0, g, body, None, unroll=True)


@functools.partial(
    jax.jit,
    static_argnames=("patch_sizes", "group", "frame_rows",
                     "interpret", "v1_rounding", "debug_stop"),
)
def smoothed_intensity_patch_pallas(
    img: jnp.ndarray,           # unused (API parity)
    integral: jnp.ndarray,      # (R, C) int32 stacked integral
    key_x: jnp.ndarray,         # (K,) f32
    key_y: jnp.ndarray,
    pat_x: jnp.ndarray,         # (K, P) f32
    pat_y: jnp.ndarray,
    pat_sigma: jnp.ndarray,
    pat_scaling: jnp.ndarray,
    pat_scaling2: jnp.ndarray,
    patch_sizes: tuple = ((32, 128), (64, 128), (128, 128)),
    group: int = 8,
    v1_rounding: bool = False,
    row_base: jnp.ndarray | None = None,
    frame_rows: int | None = None,
    interpret: bool = False,
    debug_stop: str | None = None,
) -> jnp.ndarray:
    """Drop-in for smoothed_intensity_patch_ms (bit-identical values).

    ``debug_stop`` truncates the computation for stage cost probes
    (tools/probes/probe_describe_split.py): "geom" returns after tap
    geometry + bucket assignment, "prep" after the packed kernel
    inputs (host-XLA index packing), "taps" the raw kernel output
    before unsort + tap weighting. Production callers leave it None.
    """
    rows_i, cols_i = integral.shape
    frame_rows_i = rows_i if frame_rows is None else frame_rows + 1
    k, p = pat_x.shape
    n_b = len(patch_sizes)

    g = _tap_geometry(key_x, key_y, pat_x, pat_y, pat_sigma)
    rows_q = g["row_coords"]  # (K, p, 6) frame-local integral rows
    cols_q = g["col_coords"]
    tx = _trunc_i32(key_x)
    ty = _trunc_i32(key_y)
    rmin = rows_q.reshape(k, -1).min(axis=1)
    rmax = rows_q.reshape(k, -1).max(axis=1)
    cmin = cols_q.reshape(k, -1).min(axis=1)
    cmax = cols_q.reshape(k, -1).max(axis=1)

    # Bucket list: before each configured (ph, pw) bucket, an ALIGNED
    # variant whose window is exactly the keypoint's 128-lane tile —
    # half the DMA bytes and half the one-hot matmul K-dim; ~half of
    # keypoints (those whose taps don't straddle a tile boundary)
    # qualify. Tap values are bucket-invariant for fitting keypoints,
    # so results stay bit-identical to patch_ms (whose fit/clip
    # semantics the non-aligned buckets replicate; the catch-all LAST
    # bucket is always the configured largest).
    buckets = []
    for ph, pw in patch_sizes:
        buckets.append((ph, 128, True))
        buckets.append((ph, pw, False))
    n_b = len(buckets)

    branch = jnp.full((k,), n_b - 1, jnp.int32)
    anchors = []
    fits_by_b = [None] * n_b
    for b in range(n_b - 1, -1, -1):
        ph, pw, aligned = buckets[b]
        ay = jnp.clip(ty - ph // 2, 0, max(frame_rows_i - ph, 0))
        if aligned:
            ax = jnp.maximum((tx // 128) * 128, 0)
        else:
            ax = jnp.clip(tx - pw // 2, 0, max(cols_i - pw, 0))
        anchors.append((ay, ax))
        fits = (
            (rmin >= ay) & (rmax <= ay + ph - 1)
            & (cmin >= ax) & (cmax <= ax + pw - 1)
        )
        if aligned:
            # An aligned bucket may only take keypoints that ALSO fit
            # its non-aligned sibling: a keypoint fitting the 128-lane
            # tile but straddling the sibling's [tx-pw/2, ...) window
            # would be computed exactly here while patch_ms clips it at
            # the catch-all — breaking the bitwise pallas==patch_ms
            # contract the TPU-vs-CPU parity gate relies on (found
            # 2026-08-20: one tap off by 1 on the bench distribution).
            fits = fits & fits_by_b[b + 1]
        fits_by_b[b] = fits
        if b < n_b - 1:
            branch = jnp.where(fits, jnp.int32(b), branch)
    anchors = anchors[::-1]

    order = jnp.argsort(branch, stable=True)
    inv = jnp.argsort(order, stable=True)

    def take(a):
        return jnp.take(a, order, axis=0)

    br_s = jnp.take(branch, order)
    rb_s = (
        jnp.zeros((k,), jnp.int32)
        if row_base is None else jnp.take(row_base, order)
    )

    pad_k = (-k) % group
    n_groups = (k + pad_k) // group

    def pad0(a):
        return jnp.pad(a, [(0, pad_k)] + [(0, 0)] * (a.ndim - 1))

    # Processing bucket = the first bucket >= the GROUP's max branch
    # that contains EVERY member's taps, else the catch-all. The naive
    # group max (patch_ms's chunk rule) is NOT sufficient here because
    # of the aligned bucket variants: a member whose taps straddle a
    # 128-lane tile boundary (non-aligned branch) can land in a group
    # whose max branch is ALIGNED — the aligned window cannot contain
    # its taps and the clip corrupts them (found 2026-08-20: slice-
    # dependent mismatches vs patch_ms). With the promotion, a group is
    # processed either in a bucket containing all members (exact,
    # bucket-invariant values == patch_ms) or in the catch-all, whose
    # clip geometry is exactly patch_ms's catch-all clip.
    br_g_pre = pad0(br_s).reshape(n_groups, group).max(axis=1)
    fits_s = jnp.stack(
        [take(f) for f in fits_by_b], axis=0
    )  # (n_b, K) sorted keypoint order
    fits_g = jnp.all(
        jnp.pad(
            fits_s, ((0, 0), (0, pad_k)), constant_values=True
        ).reshape(n_b, n_groups, group),
        axis=2,
    )  # (n_b, n_groups): bucket contains every member of the group
    b_iota = jnp.arange(n_b, dtype=jnp.int32)[:, None]
    cand = fits_g & (b_iota >= br_g_pre[None, :])
    br_g_pre = jnp.where(
        jnp.any(cand, axis=0),
        jnp.argmax(cand, axis=0).astype(jnp.int32),
        jnp.int32(n_b - 1),
    )
    proc_b = jnp.repeat(br_g_pre, group)[: k]  # (K,) sorted order

    ay_b = jnp.stack([take(a[0]) for a in anchors], 0)  # (n_b, K)
    ax_b = jnp.stack([take(a[1]) for a in anchors], 0)
    bsel = proc_b[None, :] == jnp.arange(n_b, dtype=jnp.int32)[:, None]
    ay_l = jnp.sum(jnp.where(bsel, ay_b, 0), axis=0)  # frame-local
    ax_l = jnp.sum(jnp.where(bsel, ax_b, 0), axis=0)
    ph_of = jnp.asarray([b[0] for b in buckets], jnp.int32)
    pw_of = jnp.asarray([b[1] for b in buckets], jnp.int32)
    ph_k = ph_of[proc_b]
    pw_k = pw_of[proc_b]

    ay_abs = ay_l + rb_s
    ay8 = (ay_abs // 8) * 8
    ax128 = (ax_l // 128) * 128

    # Pad the stacked integral so every aligned window stays in bounds:
    # rows by the 8-row alignment slack, cols to a 128 multiple plus one
    # extra 128-lane tile (ax128 + pw + 128 can pass the true width).
    max_pw = max(pw for _, pw in patch_sizes)
    cols_pad = -(-cols_i // 128) * 128 + 128
    cols_pad = max(cols_pad, max_pw + 128)
    integral = jnp.pad(
        integral, ((0, 8), (0, cols_pad - cols_i))
    )
    rows_i = rows_i + 8

    # Patch-relative coords with patch_ms's exact clipping (_rel: clip
    # into [0, ph-1] against the UNALIGNED anchor), then shifted by the
    # anchor's alignment slack into the window.
    rows_s = (
        jnp.clip(
            take(rows_q) - ay_l[:, None, None],
            0, (ph_k - 1)[:, None, None],
        )
        + (ay_abs - ay8)[:, None, None]
    )
    cols_s = (
        jnp.clip(
            take(cols_q) - ax_l[:, None, None],
            0, (pw_k - 1)[:, None, None],
        )
        + (ax_l - ax128)[:, None, None]
    )

    if debug_stop == "geom":
        return rows_s, cols_s, ay8, ax128, br_s

    # Pre-flattened index vectors (Mosaic cannot reshape lanes in the
    # kernel); rows (K, 6, p*6) carry row-tap i's coordinate broadcast
    # over the point's 6 col lanes.
    # Tight lane packing: lane = point*6 + jcol (396 lanes for p=66),
    # padded to the next 128 multiple (512) — 20% less one-hot MXU work
    # than the earlier 8-lanes-per-point layout (640 lanes).
    pl8 = -(-(p * 6) // 128) * 128  # lane dim must be a 128 multiple
    colsf = cols_s.reshape(k, p * 6)
    colsf = jnp.pad(colsf, ((0, 0), (0, pl8 - p * 6)))
    # 16-bit pack pairs of i-rows into one i32 word (window rows are
    # < 2^16): the row-index array is the biggest kernel input
    # (16 KB/keypoint unpacked) — packing halves both its XLA pack
    # write and the kernel's VMEM read; the kernel unpacks with a
    # shift+mask per i (_bucket_branch). Pack BEFORE the 6-lane repeat
    # so only the half-size array is ever materialized (packing after
    # the repeat measured 14.3 vs 9.3 ms — XLA writes both copies).
    rows_t = jnp.transpose(rows_s, (0, 2, 1))         # (K, 6i, p)
    packed_small = rows_t[:, 0::2, :] | (rows_t[:, 1::2, :] << 16)
    packed_r = jnp.repeat(packed_small, 6, axis=2)    # (K, 3, p*6)
    packed_r = jnp.pad(
        packed_r, ((0, 0), (0, 1), (0, pl8 - p * 6))
    )  # word axis 3 -> 4 (i rows 6,7 are zero-padding)
    relr = pad0(packed_r).reshape(n_groups, group * 4, pl8)
    relc = pad0(colsf).reshape(n_groups, group, pl8)
    ay8_p = pad0(ay8).reshape(-1)
    ax128_p = pad0(ax128).reshape(-1)
    # Group processing bucket (promoted — see proc_b above).
    br_g = br_g_pre

    # ONE kernel launch for all buckets: each grid step branches on its
    # group's bucket id into that bucket's statically-shaped window
    # scratch (per-bucket double buffers; VMEM total is the sum over
    # buckets — well under budget at every supported config).
    if debug_stop == "prep":
        return relr, relc, ay8_p, ax128_p, br_g, integral

    kernel = functools.partial(
        _kernel, group, tuple(buckets), pl8, rows_i
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_groups,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(
                (1, group * 4, pl8), lambda i, *_: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, group, pl8), lambda i, *_: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, group, 8, pl8), lambda i, *_: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM(
                (2, ph + 8, pw if aligned else pw + 128), jnp.int32
            )
            for (ph, pw, aligned) in buckets
        ] + [pltpu.SemaphoreType.DMA((n_b, 2))],
    )

    def squeeze_kernel(ay_r, ax_r, br_r, int_r, rr_r, rc_r,
                       to_r, *scratch):
        kernel(
            ay_r, ax_r, br_r, int_r,
            rr_r.at[0], rc_r.at[0], to_r.at[0],
            *scratch,
        )

    taps = pl.pallas_call(
        squeeze_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n_groups, group, 8, pl8), jnp.int32
        ),
        interpret=interpret,
    )(ay8_p, ax128_p, br_g, integral, relr, relc)

    if debug_stop == "taps":
        return taps

    # (n_groups, group, 8i, pl8) -> (K, p, 6, 6) in SORTED keypoint
    # order. Weight in sorted order and un-sort only the final (K, p)
    # values: gathering the taps back to input order first moved
    # 9.3 KB/keypoint (vs ~4.4 KB for the geometry fields the
    # weighting needs, and 0.26 KB for the values) — gather cost here
    # is bytes-bound, not op-count-bound (probe_describe_split).
    taps = taps.reshape(n_groups * group, 8, pl8)[:k, :6, : p * 6]
    taps = taps.reshape(k, 6, p, 6)
    taps = jnp.transpose(taps, (0, 2, 1, 3))  # (K, p, 6i, 6jcol)
    g_s = {
        f: take(g[f])
        for f in ("xf", "yf", "small", "big", "x_1", "x1", "y_1", "y1",
                  "x_left", "y_top", "x_right", "y_bottom", "x_i", "y_i")
    }
    vals_s = _values_from_taps(
        taps, g_s, take(pat_scaling), take(pat_scaling2),
        v1_rounding=v1_rounding,
    )
    return jnp.take(vals_s, inv, axis=0)
