"""Pallas TPU kernels for batched BN254 field arithmetic.

THE substrate decision of this framework (round 5): amortized-dispatch
measurement on the real v5e (scripts/probe_mxu.py, 25 ms tunnel floor
subtracted) shows

    jnp scan mont_mul      ~33 Mmul/s   (lax.scan carry chains, HBM hops)
    jnp unrolled mont_mul  ~69 Mmul/s
    THIS pallas kernel   ~2680 Mmul/s   (VMEM-resident CIOS, ~HBM-bound)

so the Pallas path is enabled BY DEFAULT on TPU backends ("tpu"/"axon");
rounds 3-4 measured it as "tied" only because block_until_ready does not
wait on the axon platform and a per-call device->host transfer (~25 ms +
20 MB) swamped the kernel. ZKFHE_PALLAS=0 opts out; on CPU the kernels
run only under ZKFHE_PALLAS_INTERPRET=1 (pallas interpret mode, used by
tests to pin bit-identity against the jnp path).

Same math as ops/field (13-bit x 20-limb CIOS, uint32 lanes, identical
overflow analysis). The reference stack does this arithmetic on CPU
bigints inside halo2-axiom (usage sites: src/poly_chip.rs:8); these
kernels are the TPU-native equivalent.
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

def _interp() -> bool:
    """Interpret-mode opt-in (CPU correctness tests). Read per call so
    tests can flip it without import-order games."""
    return os.environ.get("ZKFHE_PALLAS_INTERPRET", "") not in ("", "0")


@functools.lru_cache(maxsize=1)
def _on_tpu() -> bool:
    return jax.default_backend() in ("tpu", "axon")


def enabled() -> bool:
    if os.environ.get("ZKFHE_PALLAS", "") == "0":
        return False
    return _on_tpu() or _interp()


def should_use(batch_elems: int) -> bool:
    """Trace-time dispatch decision for a (L, *batch) elementwise op."""
    if batch_elems < TILE // 2:
        return False
    return enabled()


# ---------------------------------------------------------------------------
# In-kernel helpers (operate on python lists of (ROWS, 128) uint32 blocks)
# ---------------------------------------------------------------------------

def _k_carry(t):
    """Normalize a list of limb blocks (values may exceed 2^BITS)."""
    out = []
    carry = jnp.zeros_like(t[0])
    for v in t:
        v = v + carry
        out.append(v & MASK)
        carry = v >> BITS
    return out, carry


def _k_cond_sub_p(p_limbs, res):
    """res (normalized, < 2p) -> res mod p via one conditional subtract."""
    sub = []
    borrow = jnp.zeros_like(res[0])
    big = jnp.uint32(1 << BITS)
    for i in range(L):
        d = res[i] + big - jnp.uint32(p_limbs[i]) - borrow
        sub.append(d & MASK)
        borrow = jnp.uint32(1) - (d >> BITS)
    keep = borrow != 0  # borrow -> res < p -> keep res
    return [jnp.where(keep, res[i], sub[i]) for i in range(L)]


def _k_mont_mul(p_limbs, mu, a, b):
    """CIOS Montgomery product of two L-lists of blocks -> L-list < p."""
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

    res, _ = _k_carry(t[L:])
    return _k_cond_sub_p(p_limbs, res)


def _k_add(p_limbs, a, b):
    s, _ = _k_carry([a[i] + b[i] for i in range(L)])
    return _k_cond_sub_p(p_limbs, s)


def _k_sub(p_limbs, a, b):
    d = []
    borrow = jnp.zeros_like(a[0])
    big = jnp.uint32(1 << BITS)
    for i in range(L):
        v = a[i] + big - b[i] - borrow
        d.append(v & MASK)
        borrow = jnp.uint32(1) - (v >> BITS)
    withp, _ = _k_carry([d[i] + jnp.uint32(p_limbs[i]) for i in range(L)])
    under = borrow != 0
    return [jnp.where(under, withp[i], d[i]) for i in range(L)]


# ---------------------------------------------------------------------------
# Kernel bodies
# ---------------------------------------------------------------------------

def _read(ref):
    return [ref[i] for i in range(L)]


def _write(ref, vals):
    for i in range(L):
        ref[i] = vals[i]


def _mont_mul_kernel(field: F.Field):
    p_limbs, mu = field.p_limbs, field.mu

    def kernel(a_ref, b_ref, out_ref):
        _write(out_ref, _k_mont_mul(p_limbs, mu, _read(a_ref), _read(b_ref)))

    return kernel


def _add_kernel(field: F.Field):
    p_limbs = field.p_limbs

    def kernel(a_ref, b_ref, out_ref):
        _write(out_ref, _k_add(p_limbs, _read(a_ref), _read(b_ref)))

    return kernel


def _sub_kernel(field: F.Field):
    p_limbs = field.p_limbs

    def kernel(a_ref, b_ref, out_ref):
        _write(out_ref, _k_sub(p_limbs, _read(a_ref), _read(b_ref)))

    return kernel


def _bfly_kernel(field: F.Field):
    """Fused DIT NTT butterfly: (u, v, tw) -> (u + v*tw, u - v*tw).

    One VMEM pass instead of three (mul, add, sub) HBM round trips —
    the butterfly is the whole inner loop of ops/ntt._ntt_core."""
    p_limbs, mu = field.p_limbs, field.mu

    def kernel(u_ref, v_ref, tw_ref, hi_ref, lo_ref):
        u = _read(u_ref)
        vw = _k_mont_mul(p_limbs, mu, _read(v_ref), _read(tw_ref))
        _write(hi_ref, _k_add(p_limbs, u, vw))
        _write(lo_ref, _k_sub(p_limbs, u, vw))

    return kernel


def _bfly_dif_kernel(field: F.Field):
    """Fused DIF butterfly: (u, v, tw) -> (u + v, (u - v)*tw) — the
    inner loop of the Stockham autosort NTT (ops/ntt), which has no
    bit-reversal gather."""
    p_limbs, mu = field.p_limbs, field.mu

    def kernel(u_ref, v_ref, tw_ref, hi_ref, lo_ref):
        u, v = _read(u_ref), _read(v_ref)
        _write(hi_ref, _k_add(p_limbs, u, v))
        d = _k_sub(p_limbs, u, v)
        _write(lo_ref, _k_mont_mul(p_limbs, mu, d, _read(tw_ref)))

    return kernel


_KERNELS = {
    "mont_mul": (_mont_mul_kernel, 2, 1),
    "add": (_add_kernel, 2, 1),
    "sub": (_sub_kernel, 2, 1),
    "bfly": (_bfly_kernel, 3, 2),
    "bfly_dif": (_bfly_dif_kernel, 3, 2),
}


@functools.lru_cache(maxsize=64)
def _build_call(name: str, field: F.Field, nblk: int, interpret: bool):
    factory, n_in, n_out = _KERNELS[name]
    spec = pl.BlockSpec((L, ROWS, 128), lambda i: (0, i, 0),
                        memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((L, nblk * ROWS, 128), jnp.uint32)
    return pl.pallas_call(
        factory(field),
        out_shape=shape if n_out == 1 else (shape,) * n_out,
        grid=(nblk,),
        in_specs=[spec] * n_in,
        out_specs=spec if n_out == 1 else (spec,) * n_out,
        interpret=interpret,
    )


def _dispatch(name: str, field: F.Field, *args):
    """Flatten (L, *batch) operands into (L, rows, 128) blocks, call the
    kernel, restore shape. All operands must share the batch shape."""
    batch_shape = args[0].shape[1:]
    n = 1
    for d in batch_shape:
        n *= d
    pad = (-n) % TILE
    nblk = (n + pad) // TILE
    flat = []
    for a in args:
        af = a.reshape(L, n)
        if pad:
            af = jnp.pad(af, [(0, 0), (0, pad)])
        flat.append(af.reshape(L, nblk * ROWS, 128))
    out = _build_call(name, field, nblk, _interp() and not _on_tpu())(*flat)
    single = not isinstance(out, (tuple, list))
    outs = (out,) if single else out
    outs = tuple(o.reshape(L, n + pad)[:, :n].reshape((L,) + batch_shape)
                 for o in outs)
    return outs[0] if single else outs


def mont_mul_pallas(field: F.Field, a, b):
    return _dispatch("mont_mul", field, a, b)


def add_pallas(field: F.Field, a, b):
    return _dispatch("add", field, a, b)


def sub_pallas(field: F.Field, a, b):
    return _dispatch("sub", field, a, b)


def butterfly_pallas(field: F.Field, u, v, tw):
    """(u + v*tw, u - v*tw); tw must be pre-broadcast to u's shape."""
    return _dispatch("bfly", field, u, v, tw)


def butterfly_dif_pallas(field: F.Field, u, v, tw):
    """(u + v, (u - v)*tw); tw must be pre-broadcast to u's shape."""
    return _dispatch("bfly_dif", field, u, v, tw)
