"""Exact top-k of a large int32 map without a full-size sort.

``lax.top_k`` over the flattened H*W score map is ~30% of detect time
on TPU (NOTES.md): it sorts all ~307k elements to extract k=8k. This
module computes the IDENTICAL result (values descending, ties by
ascending flat index — lax.top_k's documented tie order) with:

1. an on-device 31-step bisection for the k-th value threshold t
   (each step is one bandwidth-trivial reduction over the 1.2 MB map);
2. selection of `x > t` plus the first (k - count_gt) elements == t in
   index order (prefix-count over the equality mask);
3. compaction by inverting the selection prefix-sum with a vectorized
   binary search (`searchsorted`) — no scatter, no nonzero (which
   lowers to a full sort);
4. a final k-element stable sort for the descending-value tie order
   (37x smaller than the full-map sort).

Reference hot path being replaced: the descending candidate sort of
`PointWithScore` (brisk/include/brisk/internal/score-calculator.h:66-85
inverted operator<; scale-space-layer-inl.h:372-392).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

INT32_MIN = jnp.iinfo(jnp.int32).min


def topk_int32(x: jnp.ndarray, k: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Bit-equal drop-in for ``jax.lax.top_k`` on a 1-D int32 array.

    Returns (values, indices), values descending, ties by ascending
    index. Requires k <= x.size.
    """
    n = x.size
    if k >= n:
        return jax.lax.top_k(x, k)

    # --- 1. k-th largest value by bisection: find the largest t with
    # count(x > t) < k; then the k-th value is t (standard invariant:
    # count(x > kth) < k and count(x >= kth) >= k).
    def body(_, state):
        lo, hi = state  # invariant: the k-th value lies in [lo, hi]
        # Overflow-safe floor midpoint (hi - lo can exceed int32).
        mid = (lo >> 1) + (hi >> 1) + (lo & hi & 1)
        c = jnp.sum(x > mid)
        return jnp.where(c >= k, mid + 1, lo), jnp.where(c >= k, hi, mid)

    lo0 = jnp.int32(INT32_MIN)
    hi0 = jnp.int32(jnp.iinfo(jnp.int32).max)
    # 32 iterations cover the full int32 range (interval halves from
    # 2^32; loop preserves lo <= hi with count(x > hi) < k).
    lo, hi = jax.lax.fori_loop(0, 32, body, (lo0, hi0))
    t = hi  # k-th largest value

    # --- 2. Selection mask with exact tie handling.
    gt = x > t
    eq = x == t
    n_gt = jnp.sum(gt)
    r = k - n_gt  # how many == t survive (first r in index order)
    eq_rank = jnp.cumsum(eq.astype(jnp.int32))  # 1-based among eq
    sel = gt | (eq & (eq_rank <= r))

    # --- 3. Compaction: j-th selected index = searchsorted(csum, j+1).
    csum = jnp.cumsum(sel.astype(jnp.int32))
    idx = jnp.searchsorted(
        csum, jnp.arange(1, k + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    vals = jnp.take(x, idx)

    # --- 4. Order: descending value, ascending index on ties. The
    # compacted list is index-ascending, so a stable sort on the
    # order-reversing key ~v (= -v-1, no INT32_MIN overflow) reproduces
    # lax.top_k's tie order exactly.
    order = jnp.argsort(~vals, stable=True)
    return jnp.take(vals, order), jnp.take(idx, order)


def topk_from_mask(
    x: jnp.ndarray, mask: jnp.ndarray, k: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k of ``where(mask, x, INT32_MIN)`` without any full-size sort.

    Bit-equal to ``jax.lax.top_k(where(mask, x, INT32_MIN), k)``
    (values descending, ties by ascending flat index — including the
    sentinel padding rows, which top_k fills with the lowest-index
    unmasked positions) WHENEVER ``count(mask) <= k`` and every masked
    value is > INT32_MIN (so masked elements are distinguishable from
    the sentinel; the detection masks guarantee this — they imply
    ``score >= absolute_threshold``). On overflow
    (more masked elements than k — a capacity misconfiguration; the
    per-layer candidate caps are sized to cover every 2D maximum) it
    degrades to the first k masked elements in flat-index order instead
    of the k best by score; callers that must stay exact under overflow
    use ``topk_impl="sort"``.

    Unlike the bisection select (:func:`topk_int32`) there is NO
    sequential loop — one cumsum + two vectorized binary searches + one
    k-element lexsort — so it vmaps over frames without convoying and
    is not launch-latency-bound (the 31-step bisection lost end-to-end
    for exactly that reason, NOTES round 2).
    """
    n = x.size
    if k >= n:
        return jax.lax.top_k(jnp.where(mask, x, INT32_MIN), k)

    xi = jnp.where(mask, x, INT32_MIN)
    # Positions of masked elements in index order: j-th one is the first
    # i with cumsum(mask)[i] == j+1 (vectorized binary search on the
    # monotone prefix count — no nonzero(), which lowers to a full sort).
    csum = jnp.cumsum(mask.astype(jnp.int32))
    count = csum[n - 1]
    j = jnp.arange(1, k + 1, dtype=jnp.int32)
    idx_m = jnp.searchsorted(csum, j, side="left").astype(jnp.int32)
    # Padding positions: first (k - count) UNmasked indices, found the
    # same way on the complement count (i+1) - csum[i].
    csum_not = jnp.arange(1, n + 1, dtype=jnp.int32) - csum
    idx_p = jnp.searchsorted(
        csum_not, j, side="left"
    ).astype(jnp.int32)
    take_m = j <= count
    idx = jnp.where(take_m, jnp.minimum(idx_m, n - 1),
                    jnp.take(idx_p, (j - 1) - count, mode="clip"))
    vals = jnp.take(xi, idx)

    # Final order: descending value, ascending index on ties — across
    # the masked AND padding parts jointly (a masked element can
    # legitimately hold INT32_MIN), exactly lax.top_k's order.
    order = jnp.lexsort((idx, ~vals))
    return jnp.take(vals, order), jnp.take(idx, order)
