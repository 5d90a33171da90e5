"""Modular matrix multiplication over BN254 Fr on the TPU MXU.

Field-element contractions (polynomial evaluation at a point, random-
linear-combination folds) are matmuls over Fr. The VPU elementwise path
(ops/pallas_field.py) tops out around 1-2.7 Gmul/s; the MXU does int8
matmul at a measured 364 Top/s on v5e (scripts/probe_mxu.py), so any
genuine contraction belongs on it.

Scheme (standard limb-plane decomposition, built from scratch):
  * Split each 260-bit operand (20 x 13-bit limbs) into 37 planes of
    7 bits stored as int8 (values 0..127 fit the signed dtype).
  * One s8 x s8 -> s32 `jax.lax.dot_general` computes ALL plane pairs:
    lhs (M*37, K) x rhs (K, 37*N) -> C[(m,u),(v,n)] = sum_k a_u[m,k]*b_v[k,n].
    Per-element bound 127^2 * K < 2^31 for K <= 133_000 (assert).
  * Fold pairs u+v=s into 73 wide planes. The fold itself can exceed
    int32, so C is split 16/16 into lo/hi halves first (sums then stay
    below 2^22).
  * Recompose the wide planes into 42 normalized 13-bit limbs and
    Montgomery-reduce (fold-top + REDC) back to 20 limbs.

Montgomery semantics match ops/field.mont_mul: inputs aR, bR produce
(sum_k a*b) R mod p, so this is a drop-in for mont_mul+tree_sum chains.

The reference does these contractions on CPU bigints inside halo2-axiom
(poly evaluation / SHPLONK folds driven by run_eth's prove path,
SURVEY.md §3.3); this module is the TPU-native equivalent.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import field as F
from .field import FR, LIMB_BITS, NLIMBS

PBITS = 7
# 20*13 = 260 bits -> ceil(260/7) = 38 planes; the top plane holds just
# bit 259 (values < p < 2^254 leave the top planes zero, but the layout
# covers the full limb array).
NPLANES = -(-NLIMBS * LIMB_BITS // PBITS)
NWIDE = 2 * NPLANES - 1
MAX_K = (1 << 31) // (127 * 127)  # dot accumulator bound


def to_planes7(a):
    """(NLIMBS, *batch) 13-bit limbs -> (NPLANES, *batch) int8 7-bit planes."""
    outs = []
    for t in range(NPLANES):
        start = t * PBITS
        lo, off = start // LIMB_BITS, start % LIMB_BITS
        v = a[lo] >> off
        if lo + 1 < a.shape[0] and off + PBITS > LIMB_BITS:
            v = v | (a[lo + 1] << (LIMB_BITS - off))
        outs.append(v & jnp.uint32((1 << PBITS) - 1))
    return jnp.stack(outs).astype(jnp.int8)


def _wide_planes_to_limbs(t_lo, t_hi):
    """Recompose fold planes into normalized 13-bit limbs.

    Value = sum_s 2^(7s) * (t_lo[s] + 2^16 * t_hi[s]); t_lo < 2^22,
    t_hi < 2^21 (fold of <= NPLANES 16-bit pieces). Returns
    (NL, *batch) uint32 normalized limbs."""
    S = t_lo.shape[0]
    batch = t_lo.shape[1:]
    max_bits = PBITS * (S - 1) + 16 + 22
    NL = -(-max_bits // LIMB_BITS) + 1
    acc = [jnp.zeros(batch, jnp.uint32) for _ in range(NL)]

    def scatter(w, bitpos):
        # w: uint32 < 2^22, deposited at bitpos. Split into 13-bit limb
        # pieces without ever shifting past 32 bits.
        j, off = bitpos // LIMB_BITS, bitpos % LIMB_BITS
        p0 = (w & jnp.uint32((1 << (LIMB_BITS - off)) - 1)) << off
        acc[j] = acc[j] + p0
        rest = w >> (LIMB_BITS - off)
        acc[j + 1] = acc[j + 1] + (rest & jnp.uint32(F.LIMB_MASK))
        rest2 = rest >> LIMB_BITS
        acc[j + 2] = acc[j + 2] + rest2

    for s in range(S):
        scatter(t_lo[s].astype(jnp.uint32), s * PBITS)
        scatter(t_hi[s].astype(jnp.uint32), s * PBITS + 16)
    t = jnp.stack(acc)
    # per-limb sums < ~8 * 2^13 << 2^32; one carry chain normalizes
    out, carry = F._carry_chain(t)
    # total value < 2^max_bits <= 13*NL by construction: no final carry
    return out


def _fold_const(field: F.Field) -> np.ndarray:
    # 2^(13*39) mod p, Montgomery-free plain constant, as limbs
    return F.int_to_limbs(pow(2, LIMB_BITS * 39, field.p))


@functools.lru_cache(maxsize=4)
def _fold_const_j(field: F.Field):
    return tuple(int(v) for v in _fold_const(field))


def mont_reduce_wide(field: F.Field, t):
    """(NL, *batch) normalized limbs (NL > 2*NLIMBS possible, value up to
    ~2^546) -> value * R^-1 mod p as (NLIMBS, *batch) reduced limbs.

    Folds limbs [39:] down with 2^507 mod p so the tail fits REDC's
    t < p*R precondition, then runs ops/field.mont_reduce."""
    NL = t.shape[0]
    batch = t.shape[1:]
    twoL = 2 * NLIMBS
    if NL <= twoL - 1:
        pad = jnp.zeros((twoL - NL,) + batch, jnp.uint32)
        return F.mont_reduce(field, jnp.concatenate([t, pad], axis=0))
    hi = t[twoL - 1:]  # limbs at bit >= 507; value < 2^(13*(NL-39))
    assert hi.shape[0] <= NLIMBS - 2, "wide value too large to fold"
    hi_pad = jnp.concatenate(
        [hi, jnp.zeros((NLIMBS - hi.shape[0],) + batch, jnp.uint32)], axis=0)
    cst = jnp.asarray(_fold_const_j(field), jnp.uint32).reshape(
        (NLIMBS,) + (1,) * len(batch))
    folded = F.mul_wide(hi_pad, jnp.broadcast_to(cst, hi_pad.shape))
    lo = jnp.concatenate(
        [t[: twoL - 1], jnp.zeros((1,) + batch, jnp.uint32)], axis=0)
    total, carry = F._carry_chain(lo + folded)
    # lo < 2^507, folded < 2^(254 + 13*(NL-39)) -> total < p*R for NL <= 44
    return F.mont_reduce(field, total)


@functools.partial(jax.jit, static_argnums=0)
def mat_mul_mont(field: F.Field, A, B):
    """Montgomery matmul: A (L, M, K) x B (L, K, N) -> (L, M, N) where
    out = (sum_k A_mk * B_kn) * R^-1 mod p — the contraction analog of
    mont_mul. Runs the multiply-accumulate on the MXU via int8 planes."""
    L, M, K = A.shape
    _, K2, N = B.shape
    assert L == NLIMBS and K2 == K and K <= MAX_K
    Ap = to_planes7(A)  # (P, M, K)
    Bp = to_planes7(B)  # (P, K, N)
    lhs = jnp.transpose(Ap, (1, 0, 2)).reshape(M * NPLANES, K)
    rhs = jnp.transpose(Bp, (1, 0, 2)).reshape(K, NPLANES * N)
    C = jax.lax.dot_general(
        lhs, rhs, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).reshape(M, NPLANES, NPLANES, N)
    # split before the pair fold: fold sums of raw C would pass 2^31
    # (C elements are non-negative: all plane values are in [0, 127])
    C_lo = (C & jnp.int32(0xFFFF)).astype(jnp.uint32)
    C_hi = C.astype(jnp.uint32) >> 16

    def fold(X):  # (M, P, P, N) -> (S, M, N), S = 2P-1
        rows = [jnp.pad(X[:, u], [(0, 0), (u, NPLANES - 1 - u), (0, 0)])
                for u in range(NPLANES)]
        return jnp.moveaxis(jnp.sum(jnp.stack(rows), axis=0), 1, 0)

    t_lo = fold(C_lo)
    t_hi = fold(C_hi)
    limbs = _wide_planes_to_limbs(t_lo, t_hi)  # (NL, M, N)
    return mont_reduce_wide(field, limbs)


def mat_vec_mont(field: F.Field, A, x):
    """A (L, M, K) x x (L, K) -> (L, M)."""
    return mat_mul_mont(field, A, x[:, :, None])[:, :, 0]
