"""Multi-scalar multiplication over BN254 G1 (TPU Pippenger).

TPU-native replacement for halo2-axiom's rayon Pippenger (SURVEY.md §2.2).
Shape of the algorithm (designed for XLA, not translated from CPU code):

  * signed c-bit digit decomposition (halves bucket memory);
  * bucket accumulation as ONE `lax.scan` over the points: each step does a
    batch of `K x W` branchless mixed-adds in parallel (K = number of MSMs
    sharing the same base points -- e.g. circuit columns against the same
    SRS -- and W = number of windows). TPU gets its parallelism from the
    K*W*limb lanes, not from threads;
  * bucket aggregation + window Horner as short vectorized scans.

All point math is the branch-free complete arithmetic from ops/curve.py,
so scatter/gather order never hits a special case.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from . import curve as C
from . import field as F
from .field import FQ, FR


def num_windows(c: int) -> int:
    # +1 window absorbs the signed-digit carry out of the top bits
    return (256 + c - 1) // c + 1


def signed_digits(scalars, c: int):
    """scalars: (L, *batch) standard-form Fr limbs -> (W, *batch) int32
    signed digits in [-(2^(c-1)), 2^(c-1)], LSB window first."""
    assert c <= 8
    W = num_windows(c)
    batch = scalars.shape[1:]
    lb = F.LIMB_BITS

    raw = []
    for w in range(W):
        start = c * w
        lo = start // lb
        off = start % lb
        v = jnp.zeros(batch, dtype=jnp.uint32)
        if lo < F.NLIMBS:
            v = scalars[lo] >> off
            if lo + 1 < F.NLIMBS and off + c > lb:
                v = v | (scalars[lo + 1] << (lb - off))
        raw.append(v & ((1 << c) - 1))
    raw = jnp.stack(raw)  # (W, *batch) uint32

    half = jnp.uint32(1 << (c - 1))
    full = jnp.int32(1 << c)

    def body(carry, r):
        d = (r + carry).astype(jnp.int32)
        wrap = d > half.astype(jnp.int32)
        d = jnp.where(wrap, d - full, d)
        carry = wrap.astype(jnp.uint32)
        return carry, d

    _, digits = jax.lax.scan(body, raw[0] * jnp.uint32(0), raw)
    return digits  # (W, *batch) int32


def msm(points, scalars, c: int = 8):
    """Pippenger MSM: sum_i scalars[k, i] * points[i] for each k.

    points:  (X, Y) affine G1, each (L, n) uint32 Montgomery-form Fq.
    scalars: (L, K, n) uint32 standard-form Fr limbs.
    Returns Jacobian (X, Y, Z) each (L, K).
    """
    PX, PY = points
    L, n = PX.shape
    K = scalars.shape[1]
    W = num_windows(c)
    B = (1 << (c - 1)) + 1  # bucket 0 = trash/no-op

    digits = signed_digits(scalars, c)  # (W, K, n) int32
    digits_seq = jnp.moveaxis(digits, -1, 0)  # (n, W, K)
    px_seq = jnp.moveaxis(PX, -1, 0)  # (n, L)
    py_seq = jnp.moveaxis(PY, -1, 0)

    # bucket state: (L, K, W, B) per coordinate (vary_like: see field.py —
    # scan carries must match the body's shard_map varying axes)
    ref4 = (PX[:, :1, None, None] * jnp.uint32(0))
    bx = F.vary_like(jnp.broadcast_to(
        F.const(FQ, FQ.to_mont_int(1), (K, W, B)), (L, K, W, B)),
        jnp.broadcast_to(ref4, (L, K, W, B)))
    by = bx
    bz = F.vary_like(jnp.zeros((L, K, W, B), dtype=jnp.uint32),
                     jnp.broadcast_to(ref4, (L, K, W, B)))

    karange = jnp.arange(K)[:, None]
    warange = jnp.arange(W)[None, :]

    def step(state, xs):
        bx, by, bz = state
        d, px, py = xs  # d: (W, K); px/py: (L,)
        d = d.T  # (K, W)
        idx = jnp.abs(d).astype(jnp.int32)  # (K, W)
        neg = d < 0

        # gather buckets at idx: (L, K, W)
        g_idx = idx[None, :, :, None]
        gx = jnp.take_along_axis(bx, g_idx, axis=3)[..., 0]
        gy = jnp.take_along_axis(by, g_idx, axis=3)[..., 0]
        gz = jnp.take_along_axis(bz, g_idx, axis=3)[..., 0]

        qx = jnp.broadcast_to(px[:, None, None], (L, K, W))
        qy = jnp.broadcast_to(py[:, None, None], (L, K, W))
        qy = F.select(neg, F.sub(FQ, F.zero((K, W)), qy), qy)
        live = (idx != 0).astype(jnp.uint32)
        qnz = jnp.broadcast_to(live[None], (L, K, W))  # validity flag limbs

        nx, ny, nz = C.point_add_mixed((gx, gy, gz), (qx, qy, qnz))

        bx = bx.at[:, karange, warange, idx].set(nx)
        by = by.at[:, karange, warange, idx].set(ny)
        bz = bz.at[:, karange, warange, idx].set(nz)
        return (bx, by, bz), None

    (bx, by, bz), _ = jax.lax.scan(
        step, (bx, by, bz), (digits_seq, px_seq, py_seq)
    )

    # aggregate buckets: T_w = sum_{b=1..B-1} b * bucket_b via descending
    # running sums; 2(B-1) sequential vectorized adds on (K, W) lanes.
    ref3 = jnp.broadcast_to(PX[:, :1, None] * jnp.uint32(0), (L, K, W))
    inf = tuple(F.vary_like(t, ref3) for t in C.infinity_like((K, W)))

    def agg(state, b):
        run, acc = state
        sel = B - 1 - b  # b = 0.. B-2 -> bucket B-1 .. 1
        pt = (bx[..., sel], by[..., sel], bz[..., sel])
        run = C.point_add(run, pt)
        acc = C.point_add(acc, run)
        return (run, acc), None

    (_, totals), _ = jax.lax.scan(
        agg, (inf, inf), jnp.arange(B - 1, dtype=jnp.int32)
    )
    # totals: Jacobian (L, K, W)

    # window combine (Horner from the top window): acc = 2^c * acc + T_w
    def horner(w, acc):
        sel = W - 1 - w

        def dbl(_, a):
            return C.point_double(a)

        acc = jax.lax.fori_loop(0, c, dbl, acc)
        tw = tuple(t[..., sel] for t in totals)
        return C.point_add(acc, tw)

    ref2 = jnp.broadcast_to(PX[:, :1] * jnp.uint32(0), (L, K))
    acc = tuple(F.vary_like(t, ref2) for t in C.infinity_like((K,)))
    acc = jax.lax.fori_loop(0, W, horner, acc)
    return acc


def msm_host(points: list[C.AffinePoint], scalars: list[int]) -> C.AffinePoint:
    """Host reference MSM (naive double-and-add) for tests."""
    acc = C.AffinePoint()
    for p, s in zip(points, scalars):
        acc = acc.add(p.mul(s))
    return acc
