"""Hamming brute-force matching, TPU-native.

Reference: ``BruteForceMatcher`` (``brisk/src/brute-force-matcher.cc``) with
the SSSE3 popcount-of-XOR distance (``hamming-inl.h:85-134``) — knnMatch
extracts k minima per query row, radiusMatch returns all within a radius.

On TPU the distance matrix is MXU-shaped: unpack each 384-bit descriptor to
a ±1 vector; then ``hamming(q, t) = (bits - q . t) / 2`` — a single bf16
matmul on the systolic array, exact because all values are small integers.
A popcount(XOR) path is kept for verification and for memory-bound regimes.

knn/radius become top-k / threshold masks over the dense distance matrix.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def unpack_bits_pm1(desc: jnp.ndarray, n_bits: int) -> jnp.ndarray:
    """(N, W) uint32 -> (N, n_bits) bf16 in {+1, -1} (bit LSB-first)."""
    w = desc.shape[-1]
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (desc[..., :, None] >> shifts[None, None, :]) & jnp.uint32(1)
    bits = bits.reshape(*desc.shape[:-1], w * 32)[..., :n_bits]
    return (bits.astype(jnp.bfloat16) * 2 - 1)


def hamming_distance_matrix(
    query: jnp.ndarray, train: jnp.ndarray, n_bits: int = 384
) -> jnp.ndarray:
    """(Q, W) x (T, W) uint32 -> (Q, T) int32 Hamming distances via MXU.

    distance = (n_bits - <q_pm1, t_pm1>) / 2, exact in bf16->f32 matmuls
    since all magnitudes <= n_bits < 2^24.
    """
    q = unpack_bits_pm1(query, n_bits)
    t = unpack_bits_pm1(train, n_bits)
    dot = jax.lax.dot_general(
        q,
        t,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return ((n_bits - dot) * 0.5).astype(jnp.int32)


def hamming_distance_matrix_popcnt(
    query: jnp.ndarray, train: jnp.ndarray
) -> jnp.ndarray:
    """XOR + popcount distance matrix (reference semantics, VPU path)."""
    x = query[:, None, :] ^ train[None, :, :]
    return jnp.sum(
        jax.lax.population_count(x).astype(jnp.int32), axis=-1
    )


@partial(jax.jit, static_argnames=("k", "n_bits"))
def knn_match(
    query: jnp.ndarray,
    train: jnp.ndarray,
    query_valid: jnp.ndarray,
    train_valid: jnp.ndarray,
    k: int = 2,
    n_bits: int = 384,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """k-nearest matches per query (commonKnnMatchImpl semantics).

    Returns (indices (Q, k) int32, distances (Q, k) int32); masked-out
    entries get distance INT32_MAX-class sentinel (n_bits + 1).
    """
    sentinel = n_bits + 1
    d = hamming_distance_matrix(query, train, n_bits)
    d = jnp.where(train_valid[None, :], d, sentinel)
    neg_d, idx = jax.lax.top_k(-d, k)
    dist = -neg_d
    dist = jnp.where(query_valid[:, None], dist, sentinel)
    return idx, dist


@partial(jax.jit, static_argnames=("n_bits",))
def radius_match_best(
    query: jnp.ndarray,
    train: jnp.ndarray,
    query_valid: jnp.ndarray,
    train_valid: jnp.ndarray,
    radius: int,
    n_bits: int = 384,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Best match per query if strictly below radius (test-match.cc:75-89).

    Returns (best_idx (Q,), best_dist (Q,), matched (Q,) bool).
    """
    sentinel = n_bits + 1
    d = hamming_distance_matrix(query, train, n_bits)
    d = jnp.where(train_valid[None, :], d, sentinel)
    best_idx = jnp.argmin(d, axis=1).astype(jnp.int32)
    best_dist = jnp.min(d, axis=1)
    matched = (best_dist < radius) & query_valid
    return best_idx, best_dist, matched


@partial(jax.jit, static_argnames=("n_bits",))
def match_with_ratio_and_crosscheck(
    query: jnp.ndarray,
    train: jnp.ndarray,
    query_valid: jnp.ndarray,
    train_valid: jnp.ndarray,
    max_distance: int,
    ratio_num: int = 8,
    ratio_den: int = 10,
    n_bits: int = 384,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Lowe-style ratio test + mutual cross-check (for the VO front-end).

    Integer ratio test: d1 * ratio_den <= d2 * ratio_num. Returns
    (best_idx (Q,), matched (Q,) bool).
    """
    sentinel = n_bits + 1
    d = hamming_distance_matrix(query, train, n_bits)
    d = jnp.where(train_valid[None, :], d, sentinel)
    d = jnp.where(query_valid[:, None], d, sentinel)

    neg2, idx2 = jax.lax.top_k(-d, 2)
    d1, d2 = -neg2[:, 0], -neg2[:, 1]
    best = idx2[:, 0]

    reverse_best = jnp.argmin(d, axis=0)  # best query per train
    mutual = jnp.take(reverse_best, best) == jnp.arange(d.shape[0])

    matched = (
        query_valid
        & (d1 <= max_distance)
        & (d1 * ratio_den <= d2 * ratio_num)
        & mutual
    )
    return best.astype(jnp.int32), matched


@partial(jax.jit, static_argnames=("k", "n_bits"))
def knn_match_masked(
    query: jnp.ndarray,
    train: jnp.ndarray,
    query_valid: jnp.ndarray,
    train_valid: jnp.ndarray,
    mask: jnp.ndarray,      # (Q, T) bool — allowed pairs (cv mask semantics)
    k: int = 2,
    n_bits: int = 384,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """knnMatch with a pair mask (commonKnnMatchImpl mask support,
    brute-force-matcher.cc:101-137)."""
    sentinel = n_bits + 1
    d = hamming_distance_matrix(query, train, n_bits)
    d = jnp.where(mask & train_valid[None, :], d, sentinel)
    neg_d, idx = jax.lax.top_k(-d, k)
    dist = jnp.where(query_valid[:, None], -neg_d, sentinel)
    return idx, dist


@partial(jax.jit, static_argnames=("max_matches", "n_bits"))
def radius_match_all(
    query: jnp.ndarray,
    train: jnp.ndarray,
    query_valid: jnp.ndarray,
    train_valid: jnp.ndarray,
    radius: int,
    max_matches: int = 64,
    n_bits: int = 384,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """ALL matches with distance < radius per query, distance-sorted — the
    reference's radiusMatch (commonRadiusMatchImpl,
    brute-force-matcher.cc:164-214), with a static per-query capacity.

    Returns (indices (Q, max_matches) i32, distances (Q, max_matches) i32,
    counts (Q,) i32); empty slots carry distance n_bits+1.
    """
    sentinel = n_bits + 1
    d = hamming_distance_matrix(query, train, n_bits)
    d = jnp.where(train_valid[None, :], d, sentinel)
    d = jnp.where(d < radius, d, sentinel)
    neg_d, idx = jax.lax.top_k(-d, max_matches)
    dist = -neg_d
    dist = jnp.where(query_valid[:, None], dist, sentinel)
    counts = jnp.sum(dist < sentinel, axis=1).astype(jnp.int32)
    return idx.astype(jnp.int32), dist, counts
