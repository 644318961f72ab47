"""BRISK sampling-pattern lookup tables.

Re-implements the pattern LUT generation of the reference
(``brisk/src/brisk-descriptor-extractor.cc``):

* v2: 66 base points read from the public pattern table
  (``InitFromStream``, brisk-descriptor-extractor.cc:180-291), expanded to
  64 scales x 1024 rotations, with per-point Gaussian sigmas, short/long
  pair lists, and integer long-pair gradient weights ``dx/|d|^2 * 2048``.
* v1: ring-generated pattern (``generateKernel``,
  brisk-descriptor-extractor.cc:65-178) with distance-threshold derived
  short/long pairs.

Floating-point order of operations mirrors the C++ (float32 storage, float64
trig) so sampled coordinates agree with the reference to the last ulp class.

The LUT is built once on host (vectorized NumPy) and shipped to device as a
constant; gathering rows by (scale, rotation) replaces the reference's
pointer arithmetic.
"""
from __future__ import annotations

import dataclasses
import functools
import os

import numpy as np

SCALES = 64          # brisk-descriptor-extractor.cc:58
SCALERANGE = 30.0    # brisk-descriptor-extractor.cc:60
N_ROT = 1024         # brisk-descriptor-extractor.cc:62
BASIC_SIZE = 12.0    # brisk-descriptor-extractor.cc:57
SIGMA_SCALE = np.float32(1.3)

_PATTERN_NPZ = os.path.join(os.path.dirname(__file__), "brisk_v2_pattern.npz")


@dataclasses.dataclass(frozen=True)
class BriskPattern:
    """Host-side pattern tables (NumPy); converted to jnp by the extractor.

    Attributes:
      lut_x, lut_y: (SCALES, N_ROT, P) f32 rotated/scaled point offsets.
      lut_sigma: (SCALES, P) f32 per-point Gaussian half-widths (rotation
        invariant, so no rotation axis).
      scale_list: (SCALES,) f32 scale factors.
      size_list: (SCALES,) i32 border sizes.
      short_pairs, long_pairs: (S, 2)/(L, 2) i32 point-index pairs (i, j).
      long_weights: (L, 2) i32 fixed-point gradient weights (dx, dy).
      n_points: number of pattern points P.
      descriptor_bits / descriptor_bytes: packed descriptor geometry.
    """

    lut_x: np.ndarray
    lut_y: np.ndarray
    lut_sigma: np.ndarray
    scale_list: np.ndarray
    size_list: np.ndarray
    short_pairs: np.ndarray
    long_pairs: np.ndarray
    long_weights: np.ndarray

    @property
    def lut_scaling(self) -> np.ndarray:
        """(S, P) i32: int(4194304.0 / area), area = 4*sigma^2 in float32.

        Mirrors SmoothedIntensity's ``scaling``
        (brisk-descriptor-extractor.cc:412); the double division and int
        truncation are reproduced exactly on host.
        """
        area = np.float32(4.0) * self.lut_sigma * self.lut_sigma  # f32
        return np.trunc(4194304.0 / area.astype(np.float64)).astype(np.int32)

    @property
    def lut_scaling2(self) -> np.ndarray:
        """(S, P) i32: int(float(scaling) * area / 1024.0) (:413)."""
        area = np.float32(4.0) * self.lut_sigma * self.lut_sigma
        scaling_f = self.lut_scaling.astype(np.float32)
        prod = (scaling_f * area).astype(np.float32)  # float multiply
        return np.trunc(prod.astype(np.float64) / 1024.0).astype(np.int32)

    @property
    def n_points(self) -> int:
        return self.lut_x.shape[-1]

    @property
    def descriptor_bits(self) -> int:
        return int(self.short_pairs.shape[0])

    @property
    def descriptor_bytes(self) -> int:
        # strings_ = ceil(bits / 128) * 16 (brisk-descriptor-extractor.cc:283)
        return int(np.ceil(self.descriptor_bits / 128.0)) * 16

    @property
    def descriptor_words(self) -> int:
        return self.descriptor_bytes // 4


def _scale_list() -> np.ndarray:
    # lb_scale_step is float in C++; scale * lb_scale_step is a float
    # multiply; pow runs in double (brisk-descriptor-extractor.cc:200-220).
    lb_scale = np.float32(np.log(SCALERANGE) / np.log(2.0))
    lb_scale_step = np.float32(lb_scale / np.float32(SCALES))
    exps = (
        np.arange(SCALES, dtype=np.float32) * lb_scale_step
    ).astype(np.float64)
    return np.power(2.0, exps).astype(np.float32)


def _expand(
    u_x: np.ndarray, u_y: np.ndarray, u_sigma: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Expand base points to (scales, rots) LUT with reference fp semantics."""
    scale_list = _scale_list()
    n = u_x.shape[0]

    theta = (
        np.arange(N_ROT, dtype=np.float64) * 2.0 * np.pi / float(N_ROT)
    )  # double in C++
    cos_t = np.cos(theta)[None, :, None]  # (1, R, 1)
    sin_t = np.sin(theta)[None, :, None]
    sl = scale_list.astype(np.float64)[:, None, None]  # (S, 1, 1)
    ux = u_x.astype(np.float64)[None, None, :]  # (1, 1, P)
    uy = u_y.astype(np.float64)[None, None, :]

    lut_x = (sl * (ux * cos_t - uy * sin_t)).astype(np.float32)
    lut_y = (sl * (ux * sin_t + uy * cos_t)).astype(np.float32)

    # sigma = (sigma_scale * scaleList[s]) * sigma[i], all float32 ops.
    lut_sigma = (
        (SIGMA_SCALE * scale_list)[:, None] * u_sigma[None, :]
    ).astype(np.float32)  # (S, P)

    # size = ceil(sqrt(x^2+y^2) + sigma) + 1, max over rot and point.
    radius = np.sqrt(
        lut_x.astype(np.float64) ** 2 + lut_y.astype(np.float64) ** 2
    )
    size = np.ceil(radius + lut_sigma[:, None, :].astype(np.float64)) + 1
    size_list = size.reshape(SCALES, -1).max(axis=1).astype(np.int32)

    return lut_x, lut_y, lut_sigma, scale_list, size_list


def _long_pair_weights(
    u_x: np.ndarray, u_y: np.ndarray, long_pairs: np.ndarray
) -> np.ndarray:
    # weighted = int(d/|d|^2 * 2048 + 0.5), truncation toward zero
    # (brisk-descriptor-extractor.cc:273-280). dx = u[j] - u[i].
    i, j = long_pairs[:, 0], long_pairs[:, 1]
    dx = (u_x[j] - u_x[i]).astype(np.float32)
    dy = (u_y[j] - u_y[i]).astype(np.float32)
    norm_sq = (dx * dx + dy * dy).astype(np.float32)
    wdx = np.trunc(
        (dx.astype(np.float64) / norm_sq.astype(np.float64)) * 2048.0 + 0.5
    ).astype(np.int32)
    wdy = np.trunc(
        (dy.astype(np.float64) / norm_sq.astype(np.float64)) * 2048.0 + 0.5
    ).astype(np.int32)
    return np.stack([wdx, wdy], axis=1)


@functools.lru_cache(maxsize=4)
def brisk_v2_pattern(pattern_scale: float = 1.0) -> BriskPattern:
    """The default BRISK v2 pattern: 66 points, 384 short / 856 long pairs."""
    data = np.load(_PATTERN_NPZ)
    pts = data["points"]  # (66, 3) float64 from the text table
    ps = np.float32(pattern_scale)
    u_x = (pts[:, 0].astype(np.float32) * ps).astype(np.float32)
    u_y = (pts[:, 1].astype(np.float32) * ps).astype(np.float32)
    u_sigma = (pts[:, 2].astype(np.float32) * ps).astype(np.float32)

    lut_x, lut_y, lut_sigma, scale_list, size_list = _expand(u_x, u_y, u_sigma)
    long_pairs = data["long_pairs"].astype(np.int32)
    return BriskPattern(
        lut_x=lut_x,
        lut_y=lut_y,
        lut_sigma=lut_sigma,
        scale_list=scale_list,
        size_list=size_list,
        short_pairs=data["short_pairs"].astype(np.int32),
        long_pairs=long_pairs,
        long_weights=_long_pair_weights(u_x, u_y, long_pairs),
    )


@functools.lru_cache(maxsize=4)
def pattern_from_file(path: str, pattern_scale: float = 1.0) -> BriskPattern:
    """Load a runtime ``.ptn`` pattern file.

    Mirrors the reference's file ctor + ``InitFromStream``
    (brisk-descriptor-extractor.cc:357-367, 180-291): whitespace-separated
    tokens — point count, (x, y, sigma) per point (each multiplied by
    ``patternScale`` on read), short-pair count + pairs, long-pair count +
    pairs. Long-pair weights are computed from the *scaled* base points,
    exactly as ``InitFromStream`` does.
    """
    with open(path) as f:
        tok = iter(f.read().split())

    def nxt() -> float:
        return float(next(tok))

    n = int(nxt())
    ps = np.float32(pattern_scale)
    pts = np.array(
        [[nxt(), nxt(), nxt()] for _ in range(n)], dtype=np.float64
    )
    u_x = (pts[:, 0].astype(np.float32) * ps).astype(np.float32)
    u_y = (pts[:, 1].astype(np.float32) * ps).astype(np.float32)
    u_sigma = (pts[:, 2].astype(np.float32) * ps).astype(np.float32)

    n_short = int(nxt())
    short_pairs = np.array(
        [[int(nxt()), int(nxt())] for _ in range(n_short)], dtype=np.int32
    )
    n_long = int(nxt())
    long_pairs = np.array(
        [[int(nxt()), int(nxt())] for _ in range(n_long)], dtype=np.int32
    )

    lut_x, lut_y, lut_sigma, scale_list, size_list = _expand(u_x, u_y, u_sigma)
    return BriskPattern(
        lut_x=lut_x,
        lut_y=lut_y,
        lut_sigma=lut_sigma,
        scale_list=scale_list,
        size_list=size_list,
        short_pairs=short_pairs,
        long_pairs=long_pairs,
        long_weights=_long_pair_weights(u_x, u_y, long_pairs),
    )


@functools.lru_cache(maxsize=4)
def brisk_v1_pattern(pattern_scale: float = 1.0) -> BriskPattern:
    """The legacy BRISK 1.0 ring pattern (generateKernel semantics).

    Rings r = 0.85*patternScale*{0, 2.9, 4.9, 7.4, 10.8} with
    {1, 10, 14, 15, 20} points; short pairs |d| < 5.85, long pairs
    |d| > 8.2 (brisk-descriptor-extractor.cc:316-339).
    """
    f32, f64 = np.float32, np.float64
    # radiusList[i] = float(f * c) with double f = 0.85*patternScale
    # (brisk-v1.cc:76-86).
    fac = f64(0.85) * pattern_scale
    radius_list = np.array(
        [f32(fac * c) for c in (0.0, 2.9, 4.9, 7.4, 10.8)], f32
    )
    number_list = [1, 10, 14, 15, 20]
    d_max = f32(f64(5.85) * pattern_scale)
    d_min = f32(f64(8.2) * pattern_scale)

    # v1's generateKernel builds the FULL LUT directly with its own float
    # chains (brisk-v1.cc:103-178) — validated bit-exact against the
    # compiled reference on all 64x1024x60 entries (tools/refbuild
    # `v1pattern` dump; tests/test_v1.py pins slices):
    # * lb_scale resolves to the <cmath> FLOAT log overload in this
    #   translation unit (logf(30.f)/log(2.0) -> double div, f32 store) —
    #   unlike brisk-descriptor-extractor.cc, where the same spelling
    #   promotes to double log (each verified against its dump);
    # * scaleList[s] = f32(pow(2.0, double(f32(s * lb_scale_step))));
    # * x = f32(f64(f32(scale*radius)) * cos(alpha+theta)), alpha/theta
    #   in double;
    # * sigma ring0 = f32(f64(f32(1.3f*scale)) * 0.5), else
    #   f32(f64(f32(1.3f*scale)) * f64(radius) * sin(pi/n)).
    lb_scale = f32(np.log(f32(30.0)).astype(f64) / np.log(f64(2.0)))
    lb_step = f32(lb_scale / f32(SCALES))
    scale_list = np.power(
        2.0, (np.arange(SCALES).astype(f32) * lb_step).astype(f32)
        .astype(f64)
    ).astype(f32)

    rings = np.repeat(np.arange(5), number_list)  # (P,) ring index
    alpha = np.concatenate(
        [np.arange(n, dtype=f64) * 2.0 * np.pi / f64(n)
         for n in number_list]
    )  # (P,) double
    rad_pt = radius_list[rings]  # (P,) f32
    s13 = (f32(1.3) * scale_list).astype(f32)  # (S,) f32
    sinfac = np.array(
        [0.0] + [np.sin(np.pi / f64(n)) for n in number_list[1:]]
    )
    lut_sigma = np.where(
        rings[None, :] == 0,
        s13[:, None].astype(f64) * 0.5,
        (s13[:, None].astype(f64) * rad_pt[None, :].astype(f64))
        * sinfac[rings][None, :],
    ).astype(f32)  # (S, P)

    sr = (scale_list[:, None] * rad_pt[None, :]).astype(f32)  # (S, P) f32
    theta = np.arange(N_ROT, dtype=f64)[:, None] * 2.0 * np.pi / f64(N_ROT)
    ang = alpha[None, :] + theta  # (R, P) double
    lut_x = (sr[:, None, :].astype(f64) * np.cos(ang)[None]).astype(f32)
    lut_y = (sr[:, None, :].astype(f64) * np.sin(ang)[None]).astype(f32)

    # size = ceil(f32(scale*radius) + sigma) + 1, max over points (the
    # rot loop adds nothing: sr and sigma are rot-invariant).
    size_list = (
        np.ceil((sr + lut_sigma).astype(f64)).max(axis=1).astype(np.int32)
        + 1
    )

    # Pairs over all i>j at scale 1 rot 0 (u = LUT[scale condition...]
    # — generateKernel uses patternPoints_[0..points_), i.e. scale 0
    # rot 0 coordinates, brisk-v1.cc:181-205).
    u_x = lut_x[0, 0]
    u_y = lut_y[0, 0]
    n = len(u_x)
    ii, jj = np.tril_indices(n, k=-1)  # i > j
    dx = (u_x[jj] - u_x[ii]).astype(f32)
    dy = (u_y[jj] - u_y[ii]).astype(f32)
    norm_sq = (dx * dx + dy * dy).astype(f32)
    d_max_sq = f32(d_max * d_max)
    d_min_sq = f32(d_min * d_min)
    long_mask = norm_sq > d_min_sq
    short_mask = (~long_mask) & (norm_sq < d_max_sq)  # else-if, :196
    short_pairs = np.stack([ii[short_mask], jj[short_mask]], 1).astype(
        np.int32
    )
    long_pairs = np.stack([ii[long_mask], jj[long_mask]], 1).astype(np.int32)
    lw = _long_pair_weights(u_x, u_y, long_pairs)
    return BriskPattern(
        lut_x=lut_x,
        lut_y=lut_y,
        lut_sigma=lut_sigma,
        scale_list=scale_list,
        size_list=size_list,
        short_pairs=short_pairs,
        long_pairs=long_pairs,
        long_weights=lw,
    )
