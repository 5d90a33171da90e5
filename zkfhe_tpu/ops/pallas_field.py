"""Pallas TPU kernel for batched Montgomery multiplication.

The XLA elementwise pipeline tops out around 3e6 254-bit muls/s on v5e
(HBM-materialized intermediates + unfused limb chains). This kernel keeps
the whole CIOS pipeline in VMEM/vregs: one block holds (20, ROWS, 128)
limb tiles of both operands, the 40-row product accumulator lives in
registers/VMEM, and the only HBM traffic is the operands + result
(3 x 10 KB per 1024 lanes).

Same math as ops/field.mont_mul (13-bit x 20-limb CIOS, uint32 lanes,
identical overflow analysis); ops/field.py dispatches here automatically
for large batches on TPU backends. Correctness is cross-checked against
the jnp path in tests and at bench start.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import field as F

L = F.NLIMBS
MASK = F.LIMB_MASK
BITS = F.LIMB_BITS
ROWS = 64  # sublane rows per block; lanes per block = ROWS * 128
TILE = ROWS * 128

# Opt-in: measured on v5e the kernel matches the jnp path bit-for-bit but
# does NOT beat it (530ms vs 479ms on 262k lanes) — the uint32 elementwise
# multiply path, not HBM traffic or fusion, is the bound. Auto-dispatching
# would invalidate every cached prover executable for zero gain, so the
# kernel stays opt-in until it wins.
ENABLED = os.environ.get("ZKFHE_PALLAS", "") not in ("", "0")
DISABLED = not ENABLED


def _kernel_factory(field: F.Field):
    p_limbs = field.p_limbs
    mu = field.mu

    def kernel(a_ref, b_ref, out_ref):
        a = [a_ref[i] for i in range(L)]  # each (ROWS, 128) uint32
        b = [b_ref[i] for i in range(L)]

        # schoolbook product: t[s] = sum_{i+j=s} a_i * b_j (< 2^30.4)
        t = [None] * (2 * L)
        for i in range(L):
            ai = a[i]
            for j in range(L):
                prod = ai * b[j]
                s = i + j
                t[s] = prod if t[s] is None else t[s] + prod
        t[2 * L - 1] = jnp.zeros_like(a[0])

        # interleaved Montgomery reduction (radix 2^13)
        mu_c = jnp.uint32(mu)
        for k in range(L):
            m = ((t[k] & MASK) * mu_c) & MASK
            t[k] = t[k] + m * jnp.uint32(p_limbs[0])
            carry = t[k] >> BITS
            t[k + 1] = t[k + 1] + carry
            for j in range(1, L):
                t[k + j] = t[k + j] + m * jnp.uint32(p_limbs[j])

        # carry-normalize the high half
        res = []
        carry = jnp.zeros_like(a[0])
        for i in range(L, 2 * L):
            v = t[i] + carry
            res.append(v & MASK)
            carry = v >> BITS
        # conditional subtract p (result < 2p)
        sub = []
        borrow = jnp.zeros_like(a[0])
        big = jnp.uint32(1 << BITS)
        for i in range(L):
            d = res[i] + big - jnp.uint32(p_limbs[i]) - borrow
            sub.append(d & MASK)
            borrow = jnp.uint32(1) - (d >> BITS)
        keep = borrow != 0  # borrow -> res < p -> keep res
        for i in range(L):
            out_ref[i] = jnp.where(keep, res[i], sub[i])

    return kernel


@functools.lru_cache(maxsize=8)
def _build_call(field: F.Field, nblk: int):
    kernel = _kernel_factory(field)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((L, nblk * ROWS, 128), jnp.uint32),
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((L, ROWS, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, ROWS, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((L, ROWS, 128), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
    )


def mont_mul_pallas(field: F.Field, a, b):
    """Drop-in mont_mul for (L, *batch) uint32 with large batches."""
    batch_shape = a.shape[1:]
    n = 1
    for d in batch_shape:
        n *= d
    pad = (-n) % TILE
    af = a.reshape(L, n)
    bf = b.reshape(L, n)
    if pad:
        af = jnp.pad(af, [(0, 0), (0, pad)])
        bf = jnp.pad(bf, [(0, 0), (0, pad)])
    nblk = (n + pad) // TILE
    call = _build_call(field, nblk)
    out = call(af.reshape(L, nblk * ROWS, 128), bf.reshape(L, nblk * ROWS, 128))
    out = out.reshape(L, n + pad)[:, :n]
    return out.reshape((L,) + batch_shape)


def should_use(batch_elems: int) -> bool:
    if DISABLED:
        return False
    if batch_elems < TILE // 2:
        return False
    return jax.default_backend() in ("tpu", "axon")
