"""MFU / roofline accounting for the bench (round-3 VERDICT item 6).

Two parts:

* :func:`measure_peaks` — measures THIS device's achievable f32 matmul
  GFLOP/s and HBM read GB/s with the honest checksum-timing protocol
  (NOTES.md: block_until_ready does not force execution on the
  tunneled backend). These are the denominators — the tunnel slice is
  ~1/100 of a full chip, so absolute numbers are small; the
  *fractions* are what transfer.

* :func:`stage_model` — static shape math for the pipeline stages'
  algorithmic work. FLOP counts are exact for the matmul-shaped
  stages (describe contraction, match popcount-matmul) and
  order-of-magnitude op counts for the stencil stages; byte counts
  are the MINIMUM algorithmic traffic (inputs read once + outputs
  written once). Sort-bound stages (top_k) get bytes only — a sort's
  utilization is reported against the bandwidth peak and flagged.

The bench prints achieved/peak per stage and names the lowest-
utilization stage; numbers also land in the BENCH json.
"""
from __future__ import annotations

import time

import numpy as np


def _force(x) -> float:
    import jax.numpy as jnp

    return float(np.asarray(jnp.sum(x.astype(jnp.float32))))


def measure_peaks(reps: int = 3) -> dict:
    """Measured peak f32/bf16 matmul GFLOP/s and HBM read GB/s."""
    import jax
    import jax.numpy as jnp

    n = 2048
    flops = 2.0 * n * n * n

    def mm_peak(dtype):
        a = jnp.ones((n, n), dtype)
        mm = jax.jit(
            lambda x: jax.lax.dot_general(
                x, x, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).sum()
        )
        for _ in range(3):
            float(np.asarray(mm(a)))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            acc = None
            iters = 4
            for _ in range(iters):
                r = mm(a)
                acc = r if acc is None else acc + r
            float(np.asarray(acc))
            best = min(best, (time.perf_counter() - t0) / iters)
        return flops / best / 1e9

    peak_gflops = mm_peak(jnp.float32)
    peak_gflops_bf16 = mm_peak(jnp.bfloat16)

    m = 64 * 1024 * 1024 // 4  # 64 MB f32
    big = jnp.ones((m,), jnp.float32)
    rd = jax.jit(lambda x: x.sum())
    for _ in range(3):
        float(np.asarray(rd(big)))
    bestb = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        acc = None
        iters = 4
        for _ in range(iters):
            r = rd(big)
            acc = r if acc is None else acc + r
        float(np.asarray(acc))
        bestb = min(bestb, (time.perf_counter() - t0) / iters)
    peak_gbs = (m * 4) / bestb / 1e9
    return {
        "peak_gflops": peak_gflops,
        "peak_gflops_bf16": peak_gflops_bf16,
        "peak_gbs": peak_gbs,
    }


def _pyramid_pixels(h: int, w: int, n_layers: int) -> float:
    """Total pixels across the scale-space pyramid."""
    px = 0.0
    dims = [(h, w)]
    if n_layers > 1:
        dims.append((2 * h // 3, 2 * w // 3))
    for i in range(2, n_layers):
        ph, pw = dims[i - 2]
        dims.append((ph // 2, pw // 2))
    for ph, pw in dims[:n_layers]:
        px += ph * pw
    return px


def stage_model(
    *,
    batch: int,
    h: int,
    w: int,
    n_layers: int,
    max_candidates: int,
    max_keypoints: int,
    describe_slots: int,
    pattern_points: int = 66,
    desc_words: int = 12,
) -> dict:
    """Static per-stage (gflops, gbytes_min, kind) for the Harris bench
    pipeline at the given shapes. kind: 'mxu' (flops meaningful),
    'bw' (bandwidth-bound stencil), 'sort' (comparison-bound — flops
    not meaningful, bytes = one read of the sorted operands per pass,
    pass count unknowable statically so ONE pass is reported: the
    printed fraction is an upper bound on useful-traffic utilization).
    """
    px = _pyramid_pixels(h, w, n_layers) * batch

    stages = {}
    # Harris scores: Scharr dx/dy + 3 products + 3x3 Gauss x3 + det -
    # trace^2/16 — ~60 integer ops/px; min bytes: u8 in + i32 score out.
    stages["scores"] = dict(
        gflops=60e-9 * px, gbytes=5e-9 * px, kind="bw"
    )
    # Maxima masks + cross-layer warp compares: ~40 ops/px over the
    # pyramid, score maps re-read ~3x (self + neighbors), bool out.
    stages["masks"] = dict(
        gflops=40e-9 * px, gbytes=13e-9 * px, kind="bw"
    )
    # top_k candidate extraction: XLA lowers to a full sort of the
    # masked maps (measured == jnp.sort, probes r4). One read of the
    # (value, index) pairs is the algorithmic minimum.
    stages["top_k"] = dict(gflops=0.0, gbytes=8e-9 * px, kind="sort")
    # Uniformity: blocked pairwise suppression over max_candidates.
    k = max_candidates
    stages["uniformity"] = dict(
        gflops=10e-9 * k * 256 * n_layers * batch,
        gbytes=4e-9 * k * n_layers * batch * 4,
        kind="bw",
    )
    # Refine: 9 flat gathers over the accepted prefix + quadratic fit.
    kk = max_keypoints
    stages["refine"] = dict(
        gflops=60e-9 * kk * n_layers * batch,
        gbytes=9 * 4e-9 * kk * n_layers * batch,
        kind="bw",
    )
    # Describe (pallas sampler): per slot, TWO phases of the col-select
    # one-hot contraction. Window mix is data-dependent; this uses the
    # bench-median mix (mostly the 40x128-aligned bucket) => MACs/slot
    # ~= ph_win * pw_win * lanes = 48*128*512 with 3 bf16 limb passes,
    # x2 phases. Lower bound on traffic: window DMA (ph_win*pw_win*4B)
    # + taps out (8*512*4B = 16 KB) per slot per phase.
    slots = describe_slots * batch
    macs_slot = 48 * 128 * 512 * 3
    stages["describe"] = dict(
        gflops=2e-9 * macs_slot * 2 * slots,
        gbytes=(48 * 128 * 4 + 8 * 512 * 4) * 2e-9 * slots,
        kind="mxu_bf16",  # limb dots run bf16 — compare the bf16 peak
    )
    # Match: (B-1) pairs of K x K Hamming distances via the +-1 MXU
    # matmul over desc_words*32 bits.
    n_bits = desc_words * 32
    stages["match"] = dict(
        gflops=2e-9 * (batch - 1) * kk * kk * n_bits,
        gbytes=2e-9 * (batch - 1) * kk * n_bits / 8 * 2,
        kind="mxu",
    )
    return stages


def report(stage_ms: dict, model: dict, peaks: dict) -> dict:
    """Combine measured per-stage times with the static model.

    Returns {stage: {ms, mfu, bandwidth_frac, kind}}; mfu = achieved
    GFLOP/s / peak, bandwidth_frac = min-traffic GB/s / peak.
    """
    out = {}
    for name, ms in stage_ms.items():
        m = model.get(name)
        if m is None or ms <= 0:
            continue
        s = ms / 1e3
        gfs = m["gflops"] / s
        gbs = m["gbytes"] / s
        peak = (
            peaks["peak_gflops_bf16"]
            if m["kind"] == "mxu_bf16"
            else peaks["peak_gflops"]
        )
        out[name] = dict(
            ms=round(ms, 2),
            kind=m["kind"],
            mfu=round(gfs / peak, 4),
            bandwidth_frac=round(gbs / peaks["peak_gbs"], 4),
        )
    return out
