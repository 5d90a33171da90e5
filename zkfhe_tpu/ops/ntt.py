"""Radix-2 NTT over BN254 Fr (TPU, limb-vectorized).

The TPU-native replacement for halo2-axiom's CPU `best_fft`
(SURVEY.md §2.2 "Radix-2 FFT/NTT"): iterative Cooley-Tukey where every
butterfly stage is one vectorized Montgomery multiply + add/sub over the
whole array, so the work maps onto the VPU as (20, n)-shaped integer ops.
Twiddle tables are precomputed host-side per domain and live on device.

Used for: quotient-polynomial evaluation on the extended (coset) domain,
interpolation (iNTT), and exact witness polynomial products (values < p).
"""
from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp

from . import field as F
from .field import FR


def _find_root_of_unity(field: F.Field, order_log2: int) -> int:
    """Host: element of exact multiplicative order 2^order_log2."""
    p = field.p
    two_adicity = 0
    t = p - 1
    while t % 2 == 0:
        t //= 2
        two_adicity += 1
    assert order_log2 <= two_adicity, "field 2-adicity too small"
    for g in range(2, 100):
        w = pow(g, (p - 1) >> two_adicity, p)
        if pow(w, 1 << (two_adicity - 1), p) != 1:
            # w has exact order 2^two_adicity
            return pow(w, 1 << (two_adicity - order_log2), p)
    raise AssertionError("no generator found")


def _bit_reverse_perm(n: int) -> np.ndarray:
    k = n.bit_length() - 1
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int64)
    for b in range(k):
        rev |= ((idx >> b) & 1) << (k - 1 - b)
    return rev


@dataclasses.dataclass(eq=False)
class Domain:
    """Multiplicative subgroup domain of size n = 2^k over Fr.

    Holds host ints + device twiddle tables (Montgomery form).
    Hashable by (k, field) so it can be a static jit argument — the
    tables are a pure function of those.
    """

    field: F.Field
    k: int
    omega: int  # generator of the size-n subgroup
    omega_inv: int
    n_inv: int

    # device tables
    stage_tw: list  # stage s -> (L, 2^s / 2) twiddles, Montgomery (numpy,
    # NOT jnp: Domain is lru-cached across jit traces, so device arrays here
    # would leak tracers / stale buffers)
    stage_tw_inv: list
    bitrev: np.ndarray

    @staticmethod
    @functools.lru_cache(maxsize=32)
    def new(k: int, field: F.Field = FR) -> "Domain":
        n = 1 << k
        omega = _find_root_of_unity(field, k)
        omega_inv = pow(omega, field.p - 2, field.p)
        n_inv = pow(n, field.p - 2, field.p)

        def tables(w):
            out = []
            for s in range(1, k + 1):
                m = 1 << s
                wm = pow(w, n // m, field.p)
                tws = [1] * (m // 2)
                for j in range(1, m // 2):
                    tws[j] = tws[j - 1] * wm % field.p
                out.append(np.asarray(F.encode(field, tws, mont=True)))
            return out

        return Domain(
            field=field,
            k=k,
            omega=omega,
            omega_inv=omega_inv,
            n_inv=n_inv,
            stage_tw=tables(omega),
            stage_tw_inv=tables(omega_inv),
            bitrev=_bit_reverse_perm(n),
        )

    def __hash__(self):
        return hash((self.k, self.field))

    def __eq__(self, other):
        return (self.k, self.field) == (other.k, other.field)

    @property
    def n(self) -> int:
        return 1 << self.k

    def powers(self, base: int, count: int | None = None) -> np.ndarray:
        """Host: [1, base, base^2, ...] as ints."""
        count = self.n if count is None else count
        out = [1] * count
        for i in range(1, count):
            out[i] = out[i - 1] * base % self.field.p
        return out


def _ntt_core(domain: Domain, x, stage_tables):
    """x: (L, ..., n) Montgomery values; returns NTT along last axis.

    Stockham autosort DIF: natural order in AND out with NO bit-reversal
    permutation — the classic radix-2 DIT needed a 21 MB `jnp.take`
    gather per 16-column launch, and TPU gathers (4-byte granularity)
    were the measured bulk of the 123 ms/launch coset NTT. Every stage
    here touches only contiguous slices:

        view x as (2, l, m)  [l = n/2^(t+1), m = 2^t]
        y[j, 0, k] = x[0, j, k] + x[1, j, k]
        y[j, 1, k] = (x[0, j, k] - x[1, j, k]) * w^(j*m)
        flatten y (l, 2, m) -> n, repeat

    The stage-t twiddles (powers of w^(2^t), length l) are exactly the
    classic tables in reverse stage order. On TPU each stage is ONE
    fused Pallas DIF-butterfly kernel (add+sub+mul in a single VMEM
    pass)."""
    from . import pallas_field as PF

    fld = domain.field
    n = domain.n
    k = domain.k
    lead = x.shape[:-1]  # (L, *batch)
    nbatch = 1
    for d in lead[1:]:
        nbatch *= d
    fuse = PF.should_use(nbatch * n // 2)
    for t in range(k):
        l = n >> (t + 1)
        m = 1 << t
        xr = x.reshape(lead + (2, l, m))
        u = xr[..., 0, :, :]
        v = xr[..., 1, :, :]
        tw = stage_tables[k - 1 - t]  # (L, l) = powers of w^(2^t)
        tw = tw.reshape((F.NLIMBS,) + (1,) * (len(lead) - 1) + (l, 1))
        tw = jnp.broadcast_to(tw, v.shape)
        if fuse:
            hi, lo = PF.butterfly_dif_pallas(fld, u, v, tw)
        else:
            hi = F.add(fld, u, v)
            lo = F.mont_mul(fld, F.sub(fld, u, v), tw)
        x = jnp.stack([hi, lo], axis=-2).reshape(lead + (n,))
    return x


@functools.partial(jax.jit, static_argnums=0)
def ntt(domain: Domain, coeffs):
    """Forward NTT: coefficients (a_0..a_{n-1}, ascending) -> evaluations at
    [w^0..w^{n-1}]. Input/output (L, *batch, n) uint32 Montgomery form."""
    return _ntt_core(domain, coeffs, domain.stage_tw)


@functools.partial(jax.jit, static_argnums=0)
def intt(domain: Domain, evals):
    """Inverse NTT: evaluations -> coefficients (ascending order)."""
    x = _ntt_core(domain, evals, domain.stage_tw_inv)
    ninv = F.const(
        domain.field, domain.field.to_mont_int(domain.n_inv), x.shape[1:]
    )
    return F.mont_mul(domain.field, x, ninv)


def scale_by_powers(field: F.Field, x, base: int):
    """Multiply x[..., i] by base^i (for coset NTTs). base: host int."""
    n = x.shape[-1]
    pows = [1] * n
    for i in range(1, n):
        pows[i] = pows[i - 1] * base % field.p
    pvec = jnp.asarray(F.encode(field, pows, mont=True))
    pvec = pvec.reshape((F.NLIMBS,) + (1,) * (x.ndim - 2) + (n,))
    return F.mont_mul(field, x, jnp.broadcast_to(pvec, x.shape))


def coset_ntt(domain: Domain, coeffs, coset_gen: int):
    """Evaluate coefficients over the coset g*H (g = coset_gen)."""
    return ntt(domain, scale_by_powers(domain.field, coeffs, coset_gen))


def coset_intt(domain: Domain, evals, coset_gen: int):
    """Interpolate evaluations over coset g*H back to coefficients."""
    coeffs = intt(domain, evals)
    ginv = pow(coset_gen, domain.field.p - 2, domain.field.p)
    return scale_by_powers(domain.field, coeffs, ginv)


@functools.partial(jax.jit, static_argnums=0)
def poly_mul(domain: Domain, a, b):
    """Exact product of two (Montgomery-form) polynomials via NTT.

    Degrees must satisfy deg(a)+deg(b) < n. Used by the on-device witness
    generator for pk0*u / pk1*u (reference: src/poly.rs:75-103 does this
    O(N^2) on CPU bigints; here it is O(n log n) on TPU, exact because all
    coefficient values stay < p)."""
    fa = ntt(domain, a)
    fb = ntt(domain, b)
    return intt(domain, F.mont_mul(domain.field, fa, fb))
