"""Vectorized big-prime-field arithmetic for TPU (JAX).

Design (TPU-first, see SURVEY.md §7 step 1):
  * A field element is ``L`` limbs of ``B`` bits stored in ``uint32``.
    With B=13, L=20 (260 bits >= 254), every schoolbook partial product
    fits in 26 bits and up to ~64 partial products can be accumulated in a
    uint32 lane without overflow -- so the whole CIOS Montgomery multiply
    runs on the VPU with no 64-bit integer support (TPU has none).
  * Arrays are limb-major ("SoA"): shape ``(L, *batch)`` so the batch axis
    is the fast (lane) axis. All ops are elementwise over the batch and
    vectorize/fuse under jit.
  * Heavy values live in Montgomery form (x*R mod p, R = 2^(B*L)) inside
    kernels; the trace/transcript boundary uses standard form.

The reference stack does 254-bit arithmetic on CPU bigints inside
halo2-axiom (see /root/reference usage sites: src/poly_chip.rs:8
``bigint_to_fe``/``fe_to_bigint``); this module is the TPU-native
equivalent built from scratch.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Limb parameters
# ---------------------------------------------------------------------------
LIMB_BITS = 13
NLIMBS = 20
LIMB_MASK = (1 << LIMB_BITS) - 1
RADIX_BITS = LIMB_BITS * NLIMBS  # 260

# Well-known BN254 moduli.
BN254_FR = 21888242871839275222246405745257275088548364400416034343698204186575808495617
BN254_FQ = 21888242871839275222246405745257275088696311157297823662689037894645226208583

U32 = jnp.uint32


def int_to_limbs(x: int, n: int = NLIMBS) -> np.ndarray:
    """Host: python int -> (n,) uint32 limb array (little-endian, 13-bit)."""
    assert x >= 0
    out = np.zeros(n, dtype=np.uint32)
    for i in range(n):
        out[i] = x & LIMB_MASK
        x >>= LIMB_BITS
    assert x == 0, "value does not fit in limb array"
    return out


def limbs_to_int(limbs) -> int:
    """Host: limb array (little-endian) -> python int."""
    limbs = np.asarray(limbs)
    x = 0
    for i in range(limbs.shape[0] - 1, -1, -1):
        x = (x << LIMB_BITS) | int(limbs[i])
    return x


def ints_to_array(xs: Sequence[int], n: int = NLIMBS) -> np.ndarray:
    """Host: list of ints -> (n, len) uint32 SoA array."""
    return np.stack([int_to_limbs(x, n) for x in xs], axis=-1)


def array_to_ints(arr) -> list[int]:
    arr = np.asarray(arr)
    flat = arr.reshape(arr.shape[0], -1)
    return [limbs_to_int(flat[:, j]) for j in range(flat.shape[1])]


@dataclasses.dataclass(frozen=True)
class Field:
    """Static description of a prime field in 13-bit/20-limb form.

    Hashable (all-python) so it can be a static argument under jit.
    """

    p: int
    name: str = "F"

    # -- derived host-side constants (computed lazily, cached) --------------
    @functools.cached_property
    def p_limbs(self) -> tuple[int, ...]:
        return tuple(int(v) for v in int_to_limbs(self.p))

    @functools.cached_property
    def r(self) -> int:  # Montgomery R
        return pow(2, RADIX_BITS, self.p)

    @functools.cached_property
    def r2(self) -> int:  # R^2 mod p
        return pow(2, 2 * RADIX_BITS, self.p)

    @functools.cached_property
    def r_inv(self) -> int:
        return pow(self.r, self.p - 2, self.p)

    @functools.cached_property
    def mu(self) -> int:  # -p^-1 mod 2^LIMB_BITS
        inv = pow(self.p, -1, 1 << LIMB_BITS)
        return (-inv) % (1 << LIMB_BITS)

    @functools.cached_property
    def inv_exp_bits(self) -> tuple[int, ...]:
        """Bits of p-2, LSB first (for Fermat inversion ladder)."""
        e = self.p - 2
        return tuple((e >> i) & 1 for i in range(e.bit_length()))

    def __hash__(self):
        return hash((self.p, self.name))

    # -- host helpers -------------------------------------------------------
    def to_mont_int(self, x: int) -> int:
        return (x * self.r) % self.p

    def from_mont_int(self, x: int) -> int:
        return (x * self.r_inv) % self.p


FR = Field(BN254_FR, "Fr")
FQ = Field(BN254_FQ, "Fq")


# ---------------------------------------------------------------------------
# Internal representation note:
# Public API functions take/return stacked arrays of shape (NLIMBS, *batch).
# Internally we unstack into python lists of (*batch,) arrays to keep XLA
# graphs free of tiny dynamic slices; the loops below are static (L=20).
# ---------------------------------------------------------------------------


def vary_like(x, ref):
    """Give x the same shard_map device-varying axes (vma) as ref without
    changing values — needed so constant-initialized scan/loop carries
    type-check inside shard_map (the carry must match the varying body
    output). jnp.where with a False predicate joins the vma sets."""
    return jnp.where(jnp.bool_(False), ref, x)


# Trace-time switch: inside `with unrolled():` the sequential limb chains
# (carry propagation, borrow chains, Montgomery reduction rounds) emit
# straight-line ops instead of lax.scan. Scans keep graphs tiny (fast
# compiles) but each 20-step while-loop costs real latency per invocation;
# kernels that run the chains MANY times sequentially per device call
# (the MSM's EC-add pipeline) trace their bodies unrolled so XLA fuses
# the whole chain into one kernel. Default stays scan-based.
_UNROLL = False


import contextlib


@contextlib.contextmanager
def unrolled():
    global _UNROLL
    old = _UNROLL
    _UNROLL = True
    try:
        yield
    finally:
        _UNROLL = old


def _carry_chain(t):
    """Propagate carries along axis 0 of a (L, *batch) uint32 array whose
    limbs may exceed 2^LIMB_BITS. Returns (normalized, final_carry)."""
    if _UNROLL:
        out = []
        carry = t[0] * jnp.uint32(0)
        for i in range(t.shape[0]):
            v = t[i] + carry
            out.append(v & LIMB_MASK)
            carry = v >> LIMB_BITS
        return jnp.stack(out), carry

    def body(carry, v):
        v = v + carry
        return v >> LIMB_BITS, v & LIMB_MASK

    carry, out = jax.lax.scan(body, t[0] * jnp.uint32(0), t)
    return out, carry


def _sub_limbs(a, b):
    """a - b with borrow chain along axis 0; returns (limbs, borrow) where
    borrow==1 iff b > a. Inputs normalized."""
    if _UNROLL:
        out = []
        borrow = (a[0] + b[0]) * jnp.uint32(0)
        for i in range(a.shape[0]):
            d = a[i] + jnp.uint32(1 << LIMB_BITS) - b[i] - borrow
            out.append(d & LIMB_MASK)
            borrow = jnp.uint32(1) - (d >> LIMB_BITS)
        return jnp.stack(out), borrow

    def body(borrow, xy):
        x, y = xy
        d = x + jnp.uint32(1 << LIMB_BITS) - y - borrow
        return jnp.uint32(1) - (d >> LIMB_BITS), d & LIMB_MASK

    # carry seed derives from BOTH operands so it picks up either side's
    # shard_map varying axes (see vary_like)
    borrow, out = jax.lax.scan(body, (a[0] + b[0]) * jnp.uint32(0), (a, b))
    return out, borrow


def _pvec(field: Field, batch_ndim: int):
    return jnp.asarray(field.p_limbs, dtype=U32).reshape(
        (NLIMBS,) + (1,) * batch_ndim
    )


def _cond_sub_p(field: Field, t):
    """If t >= p subtract p (single conditional subtract). t: (L,*batch)."""
    p = jnp.broadcast_to(_pvec(field, t.ndim - 1), t.shape)
    s, borrow = _sub_limbs(t, p)
    keep = (borrow != 0)[None]  # borrow -> t < p -> keep t
    return jnp.where(keep, t, s)


def _pallas_binary(field: Field, a, b):
    """Trace-time dispatch: large TPU batches ride the VMEM Pallas kernels
    (ops/pallas_field.py, ~40-80x the scan path on v5e). Returns the
    broadcast (a, b, use_pallas) triple."""
    if a.shape != b.shape:
        shape = jnp.broadcast_shapes(a.shape, b.shape)
        a = jnp.broadcast_to(a, shape)
        b = jnp.broadcast_to(b, shape)
    nelems = 1
    for d in a.shape[1:]:
        nelems *= d
    from . import pallas_field as _PF
    return a, b, _PF.should_use(nelems)


@functools.partial(jax.jit, static_argnums=0)
def add(field: Field, a, b):
    """(a + b) mod p. a, b: (L, *batch) uint32, reduced."""
    a, b, use_pl = _pallas_binary(field, a, b)
    if use_pl:
        from . import pallas_field as _PF
        return _PF.add_pallas(field, a, b)
    s, _ = _carry_chain(a + b)
    return _cond_sub_p(field, s)


@functools.partial(jax.jit, static_argnums=0)
def sub(field: Field, a, b):
    """(a - b) mod p."""
    a, b, use_pl = _pallas_binary(field, a, b)
    if use_pl:
        from . import pallas_field as _PF
        return _PF.sub_pallas(field, a, b)
    d, borrow = _sub_limbs(a, b)
    withp, _ = _carry_chain(d + _pvec(field, a.ndim - 1))
    return jnp.where((borrow != 0)[None], withp, d)


def neg(field: Field, a):
    return sub(field, jnp.zeros_like(a), a)


def double(field: Field, a):
    return add(field, a, a)


@functools.partial(jax.jit, static_argnums=0)
def mont_mul(field: Field, a, b):
    """Montgomery product a*b*R^-1 mod p. a, b: (L, *batch) uint32, < p.

    Limb-axis-vectorized CIOS at radix 2^13. Overflow analysis (uint32):
    schoolbook accumulators < 20*(2^13-1)^2 < 2^30.4; each reduction round
    adds <= L products of < 2^26 plus a < 2^19 carry, peak < 2^31.8 < 2^32.

    Large batches on TPU dispatch to the VMEM-resident Pallas kernel
    (ops/pallas_field.py) — decided at trace time from static
    shape+backend. Default ON (measured ~2.7 Gmul/s vs ~33-69 Mmul/s for
    the scan/unrolled jnp paths on v5e once the 25 ms axon dispatch floor
    is amortized); ZKFHE_PALLAS=0 opts out.
    """
    a, b, use_pl = _pallas_binary(field, a, b)
    if use_pl:
        from . import pallas_field as _PF
        return _PF.mont_mul_pallas(field, a, b)
    L = NLIMBS
    batch = a.shape[1:]
    nelems = 1
    for d in batch:
        nelems *= d
    mu = jnp.uint32(field.mu)
    p_vec = _pvec(field, len(batch))

    # schoolbook product into (2L, *batch). Two shapes of the same math:
    # the outer-product form materializes an (L, L, *batch) transient —
    # fastest for normal batches but 11.6 GB at keygen's k=15 column
    # matrix (OOM observed 2026-08-19); huge batches instead accumulate
    # limb-by-limb in a scan whose working set is (2L, *batch).
    if nelems * L * L * 4 > (1 << 31):
        def pstep(t, i):
            ai = jax.lax.dynamic_index_in_dim(a, i, axis=0, keepdims=False)
            seg = jax.lax.dynamic_slice_in_dim(t, i, L, axis=0) \
                + ai[None] * b
            return jax.lax.dynamic_update_slice_in_dim(t, seg, i, axis=0), \
                None
        t = jnp.zeros((2 * L,) + batch, dtype=jnp.uint32)
        t, _ = jax.lax.scan(pstep, t, jnp.arange(L, dtype=jnp.int32))
    else:
        prods = a[:, None] * b[None, :]  # (L, L, *batch), each < 2^26
        rows = [
            jnp.pad(prods[i], [(i, L - 1 - i)] + [(0, 0)] * len(batch))
            for i in range(L)
        ]
        t = jnp.sum(jnp.stack(rows), axis=0)  # (2L-1, *batch) < 2^30.4
        t = jnp.pad(t, [(0, 1)] + [(0, 0)] * len(batch))  # (2L, *batch)

    # interleaved Montgomery reduction: sequential over L rounds (inherent),
    # each round vectorized over limbs. Unrolled mode emits straight-line
    # ops with static indices (fused by XLA); scan mode keeps graphs tiny.
    if _UNROLL:
        rows = [t[i] for i in range(2 * L)]
        pl = [jnp.uint32(v) for v in field.p_limbs]
        for k in range(L):
            m = ((rows[k] & LIMB_MASK) * mu) & LIMB_MASK
            rows[k] = rows[k] + m * pl[0]
            carry = rows[k] >> LIMB_BITS
            rows[k + 1] = rows[k + 1] + carry
            for j in range(1, L):
                rows[k + j] = rows[k + j] + m * pl[j]
        res, _ = _carry_chain(jnp.stack(rows[L:]))
        return _cond_sub_p(field, res)

    def round_fn(t, k):
        tk = jax.lax.dynamic_index_in_dim(t, k, axis=0, keepdims=False)
        m = ((tk & LIMB_MASK) * mu) & LIMB_MASK
        corr = m[None] * p_vec  # (L, *batch)
        window = jax.lax.dynamic_slice_in_dim(t, k, L, axis=0) + corr
        carry = (window[0]) >> LIMB_BITS
        window = window.at[1].add(carry)
        window = window.at[0].set(jnp.zeros_like(carry))
        t = jax.lax.dynamic_update_slice_in_dim(t, window, k, axis=0)
        return t, None

    t, _ = jax.lax.scan(round_fn, t, jnp.arange(L, dtype=jnp.int32))

    res, _ = _carry_chain(t[L:])
    return _cond_sub_p(field, res)


def mont_sqr(field: Field, a):
    return mont_mul(field, a, a)


@functools.partial(jax.jit, static_argnums=0)
def mont_reduce(field: Field, t):
    """Montgomery-reduce a double-width value: t (2L, *batch) uint32
    13-bit limbs -> t * R^-1 mod p as (L, *batch) reduced limbs. The
    reduction half of mont_mul, exposed for callers that build the
    double-width input themselves (device-side uniform sampling).
    Precondition (as for any REDC): t < p*R, i.e. the top limbs must not
    make t exceed ~2^513 — REDC returns (t + m*p)/R < t/R + p, so the
    single conditional subtract only suffices for t/R < p."""
    L = NLIMBS
    batch = t.shape[1:]
    mu = jnp.uint32(field.mu)
    p_vec = _pvec(field, len(batch))

    def round_fn(t, k):
        tk = jax.lax.dynamic_index_in_dim(t, k, axis=0, keepdims=False)
        m = ((tk & LIMB_MASK) * mu) & LIMB_MASK
        corr = m[None] * p_vec
        window = jax.lax.dynamic_slice_in_dim(t, k, L, axis=0) + corr
        carry = (window[0]) >> LIMB_BITS
        window = window.at[1].add(carry)
        window = window.at[0].set(jnp.zeros_like(carry))
        return jax.lax.dynamic_update_slice_in_dim(t, window, k, axis=0), None

    t, _ = jax.lax.scan(round_fn, t, jnp.arange(L, dtype=jnp.int32))
    res, _ = _carry_chain(t[L:])
    return _cond_sub_p(field, res)


@functools.partial(jax.jit, static_argnums=(0, 2))
def rand_mont(field: Field, key, shape: tuple):
    """Uniform field elements sampled ON DEVICE: threefry bits -> 2L-1
    13-bit limbs (a uniform 507-bit integer U < p*R) -> mont_reduce
    gives U*R^-1 mod p, uniform up to bias < 2^-250. Returned limbs are
    treated as Montgomery form (any uniform element is uniform in either
    form). Replaces host randrange + encode + a device transfer per
    blinding draw (the remote-TPU tunnel charges ~25 ms per transfer)."""
    import jax.random as _jr
    bits = _jr.bits(key, (2 * NLIMBS,) + tuple(shape), dtype=U32)
    bits = bits & LIMB_MASK
    # zero the top limb: keeps U < 2^507 < p*R (see mont_reduce)
    return mont_reduce(field, bits.at[2 * NLIMBS - 1].set(0))


@functools.partial(jax.jit, static_argnums=0)
def to_mont(field: Field, a):
    """standard -> Montgomery form (multiply by R^2, mont-reduce)."""
    r2 = _const(field, field.r2, a)
    return mont_mul(field, a, r2)


@functools.partial(jax.jit, static_argnums=0)
def from_mont(field: Field, a):
    """Montgomery -> standard form (mont-multiply by 1)."""
    one = _const(field, 1, a)
    return mont_mul(field, a, one)


def _const(field: Field, value: int, like):
    """Broadcast a python-int constant to the batch shape of `like`."""
    limbs = int_to_limbs(value % field.p)
    batch = like.shape[1:]
    return jnp.broadcast_to(
        jnp.asarray(limbs, dtype=U32).reshape((NLIMBS,) + (1,) * len(batch)),
        (NLIMBS,) + batch,
    )


def const(field: Field, value: int, batch_shape=()):
    limbs = int_to_limbs(value % field.p)
    return jnp.broadcast_to(
        jnp.asarray(limbs, dtype=U32).reshape((NLIMBS,) + (1,) * len(batch_shape)),
        (NLIMBS,) + tuple(batch_shape),
    )


def zero(batch_shape=()):
    return jnp.zeros((NLIMBS,) + tuple(batch_shape), dtype=U32)


def is_zero(a):
    """Boolean mask over batch: a == 0 (limbwise)."""
    return jnp.all(a == 0, axis=0)


def eq(a, b):
    return jnp.all(a == b, axis=0)


def select(mask, a, b):
    """mask ? a : b, mask has batch shape."""
    return jnp.where(mask[None], a, b)


def mont_pow(field: Field, a, exp_bits):
    """a^e in Montgomery form; exp_bits: (nbits,) uint32 array of bits, LSB
    first (dynamic). Runs a fori_loop ladder: cheap graph, nbits iterations."""
    one = vary_like(to_mont(field, _const(field, 1, a)), a)
    nbits = exp_bits.shape[0]

    def body(i, state):
        acc, base = state
        bit = exp_bits[i]
        mul = mont_mul(field, acc, base)
        acc = jnp.where(jnp.bool_(bit)[None], mul, acc)
        base = mont_sqr(field, base)
        return acc, base

    acc, _ = jax.lax.fori_loop(0, nbits, body, (one, a))
    return acc


@functools.partial(jax.jit, static_argnums=0)
def inv(field: Field, a):
    """Fermat inverse in Montgomery form: a^(p-2). inv(0) = 0."""
    bits = jnp.asarray(field.inv_exp_bits, dtype=U32)
    out = mont_pow(field, a, bits)
    return select(is_zero(a), zero(a.shape[1:]), out)


# Lanes per block in the blocked Montgomery batch-inversion. Bounds every
# prefix/suffix product chain to log2(BLOCK) elementwise mont_muls over the
# full array — the round-3 OOM came from running associative_scan over a
# ~2.1M-lane axis inside the MSM affine tree (VERDICT r3 weak #1): XLA
# materialized multi-GB scan transients. The blocked form's peak transient
# is a small constant multiple of the input regardless of n.
BATCH_INV_BLOCK = 256


@functools.partial(jax.jit, static_argnums=0)
def batch_inv(field: Field, a):
    """Batched inversion (Montgomery form) along the LAST axis using the
    blocked Montgomery trick: split the axis into groups of
    ``BATCH_INV_BLOCK`` lanes, build in-group exclusive prefix/suffix
    products with log-depth Hillis-Steele doubling (pure elementwise
    mont_muls — no lax scans, so transients stay O(n)), invert the group
    totals recursively, then inv(a_i) = prefix_i * suffix_i *
    inv(group_total). Zeros map to zero.
    """
    zmask = is_zero(a)
    one_like = vary_like(to_mont(field, _const(field, 1, a)), a)
    safe = select(zmask, one_like, a)
    invs = _batch_inv_nonzero(field, safe, one_like)
    return select(zmask, zero(a.shape[1:]), invs)


def _shift_fill(x, s: int, fill, reverse: bool = False):
    """Shift x by s along the LAST axis, filling vacated lanes from
    `fill` (identity). reverse=False shifts right (toward higher index)."""
    pad = fill[..., :s]
    if reverse:
        return jnp.concatenate([x[..., s:], pad], axis=-1)
    return jnp.concatenate([pad, x[..., :-s]], axis=-1)


def _batch_inv_nonzero(field: Field, a, one_like):
    """batch_inv core for arrays with no zero lanes. a: (L, *rest, n)."""
    n = a.shape[-1]
    if n == 1:
        return inv(field, a)
    g = min(n, BATCH_INV_BLOCK)
    G = -(-n // g)
    if G * g != n:  # pad with identity lanes (sliced off at the end)
        padn = G * g - n
        a = jnp.concatenate(
            [a, jnp.broadcast_to(one_like[..., :1], a.shape[:-1] + (padn,))],
            axis=-1)
    grp = a.reshape(a.shape[:-1] + (G, g))
    ones = jnp.broadcast_to(one_like[..., :1, None], grp.shape)

    # inclusive prefix/suffix products along the g axis (Hillis-Steele)
    pre, suf = grp, grp
    s = 1
    while s < g:
        pre = mont_mul(field, pre, _shift_fill(pre, s, ones))
        suf = mont_mul(field, suf, _shift_fill(suf, s, ones, reverse=True))
        s *= 2

    totals = pre[..., -1]  # (L, *rest, G)
    tinv = _batch_inv_nonzero(field, totals, one_like[..., :G])

    excl_pre = _shift_fill(pre, 1, ones)
    excl_suf = _shift_fill(suf, 1, ones, reverse=True)
    around = mont_mul(field, excl_pre, excl_suf)
    invs = mont_mul(field, around, jnp.broadcast_to(tinv[..., None], grp.shape))
    return invs.reshape(a.shape[:-1] + (G * g,))[..., :n]


@functools.partial(jax.jit, static_argnums=(0, 2))
def power_series(field: Field, base_mont, count: int):
    """[1, b, b^2, ..., b^(count-1)] in Montgomery form via log-depth
    doubling: out holds [b^0..b^(cur-1)], bp = b^cur, extend with
    out*bp. log2(count) full-width muls (Pallas-sized on TPU) — the
    previous associative_scan form spent its levels in tiny moveaxis'd
    scan-path muls. base_mont: (L,) Montgomery."""
    one = vary_like(to_mont(field, const(field, 1)), base_mont)
    out = one[:, None]
    if count == 1:
        return out
    bp = base_mont[:, None]  # b^(2^t) after t doublings
    while out.shape[1] < count:
        take = min(out.shape[1], count - out.shape[1])
        ext = mont_mul(field, out[:, :take],
                       jnp.broadcast_to(bp, (NLIMBS, take)))
        out = jnp.concatenate([out, ext], axis=1)
        if out.shape[1] < count:
            bp = mont_mul(field, bp, bp)
    return out


@functools.partial(jax.jit, static_argnums=(0, 2))
def tree_sum_mod(field: Field, arr, axis: int = -1):
    """Modular sum along an axis by pairwise reduction (log depth; every
    intermediate stays < p so 20 limbs always suffice)."""
    arr = jnp.moveaxis(arr, axis if axis >= 0 else arr.ndim + axis, -1)
    n = arr.shape[-1]
    while n > 1:
        half = n // 2
        s = add(field, arr[..., :half], arr[..., half:2 * half])
        if n % 2:
            s = jnp.concatenate([s, arr[..., -1:]], axis=-1)
        arr = s
        n = arr.shape[-1]
    return arr[..., 0]


# ---------------------------------------------------------------------------
# Plain multi-limb integer helpers (no modular reduction) — used for range
# decompositions and witness div/mod on values far below p.
# ---------------------------------------------------------------------------

@jax.jit
def mul_wide(a, b):
    """Exact product of two (L,*batch) normalized limb arrays -> (2L,*batch)
    normalized. Accumulators stay < 2^31 (see mont_mul analysis)."""
    L = NLIMBS
    batch = a.shape[1:]
    prods = a[:, None] * b[None, :]
    rows = [
        jnp.pad(prods[i], [(i, L - 1 - i)] + [(0, 0)] * len(batch))
        for i in range(L)
    ]
    t = jnp.sum(jnp.stack(rows), axis=0)
    t = jnp.pad(t, [(0, 1)] + [(0, 0)] * len(batch))  # (2L,*batch)
    out, carry = _carry_chain(t)
    return out  # carry is 0: product < 2^520


def shr_bits(a, s: int):
    """Logical right shift of a normalized limb array by a STATIC amount."""
    L = a.shape[0]
    lo, off = s // LIMB_BITS, s % LIMB_BITS
    shifted = jnp.concatenate(
        [a[lo:], jnp.zeros((lo,) + a.shape[1:], dtype=a.dtype)], axis=0
    )
    if off:
        nxt = jnp.concatenate(
            [shifted[1:], jnp.zeros((1,) + a.shape[1:], dtype=a.dtype)], axis=0
        )
        shifted = ((shifted >> off) | (nxt << (LIMB_BITS - off))) & LIMB_MASK
    return shifted


def extract_bits(a, start: int, width: int):
    """Bits [start, start+width) of a normalized (L,*batch) limb array as a
    plain (*batch,) uint32 lane. width <= 13."""
    assert width <= LIMB_BITS
    lo, off = start // LIMB_BITS, start % LIMB_BITS
    v = a[lo] >> off if lo < a.shape[0] else jnp.zeros(a.shape[1:], a.dtype)
    if lo + 1 < a.shape[0] and off + width > LIMB_BITS:
        v = v | (a[lo + 1] << (LIMB_BITS - off))
    return v & ((1 << width) - 1)


def from_u32(v, nlimbs: int = NLIMBS):
    """(*batch,) uint32 values (< 2^26) -> (nlimbs,*batch) limb array."""
    limbs = [v & LIMB_MASK, (v >> LIMB_BITS) & LIMB_MASK]
    limbs += [jnp.zeros_like(v)] * (nlimbs - 2)
    return jnp.stack(limbs, axis=0)


@jax.jit
def geq(a, b):
    """a >= b over normalized limb arrays; (*batch,) bool."""
    _, borrow = _sub_limbs(a, b)
    return borrow == 0


@jax.jit
def sub_plain(a, b):
    """a - b for a >= b (normalized limb arrays)."""
    d, _ = _sub_limbs(a, b)
    return d


@functools.partial(jax.jit, static_argnums=(1, 2))
def divmod_const(a, m: int, num_bits: int):
    """(a // m, a % m) for normalized (L,*batch) values a < 2^num_bits and a
    STATIC modulus m. Barrett reduction entirely in 13-bit limbs (no 64-bit
    integers): q_hat = (a * mu) >> s with mu = floor(2^s / m), then <= 2
    correction subtractions."""
    s = num_bits + 1
    mu = (1 << s) // m
    batch = a.shape[1:]
    mu_arr = jnp.broadcast_to(
        jnp.asarray(int_to_limbs(mu), dtype=U32).reshape(
            (NLIMBS,) + (1,) * len(batch)
        ),
        a.shape,
    )
    m_arr = jnp.broadcast_to(
        jnp.asarray(int_to_limbs(m), dtype=U32).reshape(
            (NLIMBS,) + (1,) * len(batch)
        ),
        a.shape,
    )
    wide = mul_wide(a, mu_arr)  # (2L,*batch)
    q = shr_bits(wide, s)[:NLIMBS]
    qm = mul_wide(q, m_arr)[:NLIMBS]
    r = sub_plain(a, qm)
    for _ in range(2):  # Barrett correction
        over = geq(r, m_arr)
        r = jnp.where(over[None], sub_plain(r, m_arr), r)
        qp, _ = _carry_chain(q.at[0].add(1))
        q = jnp.where(over[None], qp, q)
    return q, r


# ---------------------------------------------------------------------------
# Host-side exact conversions for tests / io
# ---------------------------------------------------------------------------

def encode_ints_np(xs, n: int = NLIMBS) -> np.ndarray:
    """Host bulk encoder: array-like of python ints -> (n, len) uint32 SoA.
    Vectorized via numpy object arithmetic: 20 vector ops instead of one
    python call per element (keygen encodes millions of values)."""
    arr = np.asarray(xs, dtype=object)
    out = np.zeros((n,) + arr.shape, dtype=np.uint32)
    for i in range(n):
        out[i] = (arr & LIMB_MASK).astype(np.uint32)
        arr = arr >> LIMB_BITS
    assert not np.any(arr != 0), "values do not fit"
    return out


def encode(field: Field, xs: Sequence[int], mont: bool = False) -> np.ndarray:
    xs = [x % field.p for x in xs]
    if mont:
        xs = [field.to_mont_int(x) for x in xs]
    return ints_to_array(xs)


def decode(field: Field, arr, mont: bool = False) -> list[int]:
    vals = array_to_ints(arr)
    if mont:
        vals = [field.from_mont_int(v) for v in vals]
    return vals
