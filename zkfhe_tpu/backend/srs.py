"""KZG structured reference string (test-only, seeded trapdoor).

Equivalent of halo2-scaffold's `gen_srs` (SURVEY.md §2.2 "SRS management"):
a deterministic random tau generates [tau^i]G1 for i < 2^k plus [1]G2 and
[tau]G2, cached under params/kzg_bn254_{k}.npz (mirrors the reference's
`params/` artifact layout, .gitignore:18). UNSAFE for production, exactly
like the reference's test SRS (README.md:34).

G1 powers are computed ON DEVICE: a vectorized double-and-add ladder over
all 2^k scalars at once (ops/curve.scalar_mul), then one batched
Jacobian->affine normalization (Montgomery batch inversion).
"""
from __future__ import annotations

import dataclasses
import hashlib
import os

import numpy as np
import jax.numpy as jnp

from ..ops import curve as C
from ..ops import field as F
from ..ops.field import FQ, FR
from . import pairing as PR


@dataclasses.dataclass
class SRS:
    k: int
    g1: tuple  # (X, Y) affine Montgomery-form arrays, (L, n)
    g2_gen: tuple  # G2 affine (host ints)
    g2_tau: tuple
    # Lagrange-basis points ([L_j(tau)]G1), populated by generate() /
    # load_or_generate(); enables evaluation-form (width-aware) commits.
    g1_lag: tuple | None = None

    @property
    def n(self):
        return 1 << self.k

    def g1_points(self, count=None) -> list:
        """Host affine points (for verifier-side small MSMs)."""
        X, Y = self.g1
        count = self.n if count is None else count
        Z = F.const(FQ, FQ.to_mont_int(1), (count,))
        return C.decode_points((X[:, :count], Y[:, :count], Z))


def _tau_from_seed(seed: bytes) -> int:
    return int.from_bytes(hashlib.blake2b(seed).digest(), "little") % FR.p


def _g1_batch(scalars: list):
    """[s_j] -> affine ([s_j]G1) arrays (X, Y), via one vectorized
    double-and-add ladder on device (host fallback for tiny batches)."""
    n = len(scalars)
    if n <= 256:
        pts = [C.G1_GEN.mul(t) for t in scalars]
        X, Y, _ = C.encode_points(pts)
        return jnp.asarray(X), jnp.asarray(Y)
    nbits = 254
    bits = np.zeros((nbits, n), dtype=np.uint32)
    for i, t in enumerate(scalars):
        for b in range(t.bit_length()):
            bits[b, i] = (t >> b) & 1
    G = C.encode_points([C.G1_GEN] * n)
    acc = C.scalar_mul(G, jnp.asarray(bits))
    X, Y = to_affine_xy(acc)
    return jnp.asarray(X), jnp.asarray(Y)


def generate(k: int, seed: bytes = b"zkfhe-tpu-test-srs") -> SRS:
    n = 1 << k
    tau = _tau_from_seed(seed)

    # host: powers of tau (exact ints)
    taus = [1] * n
    for i in range(1, n):
        taus[i] = taus[i - 1] * tau % FR.p

    X, Y = _g1_batch(taus)
    g2_tau = PR.g2_mul(PR.G2_GEN, tau)
    lag = _g1_batch(lagrange_scalars(k, seed))
    return SRS(k=k, g1=(X, Y), g2_gen=PR.G2_GEN, g2_tau=g2_tau,
               g1_lag=lag)


def lagrange_scalars(k: int, seed: bytes = b"zkfhe-tpu-test-srs") -> list:
    """L_j(tau) for the size-2^k domain: L_j(X) = (w^j/n)(X^n-1)/(X-w^j).
    Exact host math from the (test-SRS) known trapdoor."""
    from ..ops import ntt as N
    n = 1 << k
    tau = _tau_from_seed(seed)
    omega = N.Domain.new(k).omega
    zh = (pow(tau, n, FR.p) - 1) % FR.p
    n_inv = pow(n, FR.p - 2, FR.p)
    wj = 1
    denoms = []
    wjs = []
    for j in range(n):
        wjs.append(wj)
        denoms.append((tau - wj) % FR.p)
        wj = wj * omega % FR.p
    # batch inversion of the denominators
    prefix = [1] * (n + 1)
    for j in range(n):
        prefix[j + 1] = prefix[j] * denoms[j] % FR.p
    inv_all = pow(prefix[n], FR.p - 2, FR.p)
    invs = [0] * n
    for j in range(n - 1, -1, -1):
        invs[j] = inv_all * prefix[j] % FR.p
        inv_all = inv_all * denoms[j] % FR.p
    return [zh * n_inv % FR.p * wjs[j] % FR.p * invs[j] % FR.p
            for j in range(n)]


def lagrange_path_for(k: int, params_dir: str = "params") -> str:
    return os.path.join(params_dir, f"kzg_bn254_{k}.lag.npz")


def load_or_generate_lagrange(k: int, params_dir: str = "params"):
    """Lagrange-basis G1 points ([L_j(tau)]G1) for committing columns in
    evaluation form (width-aware MSMs see the raw small values instead of
    full-width iNTT coefficients). Cached like the monomial SRS."""
    path = lagrange_path_for(k, params_dir)
    if os.path.exists(path):
        data = np.load(path)
        return jnp.asarray(data["g1x"]), jnp.asarray(data["g1y"])
    X, Y = _g1_batch(lagrange_scalars(k))
    os.makedirs(params_dir, exist_ok=True)
    np.savez_compressed(path, g1x=np.asarray(X), g1y=np.asarray(Y))
    return X, Y


to_affine_xy = C.to_affine_xy


def path_for(k: int, params_dir: str = "params") -> str:
    return os.path.join(params_dir, f"kzg_bn254_{k}.npz")


def save(srs: SRS, params_dir: str = "params"):
    os.makedirs(params_dir, exist_ok=True)
    np.savez_compressed(
        path_for(srs.k, params_dir),
        k=srs.k,
        g1x=np.asarray(srs.g1[0]),
        g1y=np.asarray(srs.g1[1]),
        g2_gen=np.asarray(
            [srs.g2_gen[0][0], srs.g2_gen[0][1], srs.g2_gen[1][0], srs.g2_gen[1][1]],
            dtype=object,
        ),
        g2_tau=np.asarray(
            [srs.g2_tau[0][0], srs.g2_tau[0][1], srs.g2_tau[1][0], srs.g2_tau[1][1]],
            dtype=object,
        ),
        allow_pickle=True,
    )


def load(k: int, params_dir: str = "params") -> SRS:
    data = np.load(path_for(k, params_dir), allow_pickle=True)
    g2g = [int(v) for v in data["g2_gen"]]
    g2t = [int(v) for v in data["g2_tau"]]
    return SRS(
        k=int(data["k"]),
        g1=(jnp.asarray(data["g1x"]), jnp.asarray(data["g1y"])),
        g2_gen=((g2g[0], g2g[1]), (g2g[2], g2g[3])),
        g2_tau=((g2t[0], g2t[1]), (g2t[2], g2t[3])),
    )


def load_or_generate(k: int, params_dir: str = "params") -> SRS:
    if os.path.exists(path_for(k, params_dir)):
        srs = load(k, params_dir)
        srs.g1_lag = load_or_generate_lagrange(k, params_dir)
        return srs
    srs = generate(k)
    save(srs, params_dir)
    lp = lagrange_path_for(k, params_dir)
    np.savez_compressed(lp, g1x=np.asarray(srs.g1_lag[0]),
                        g1y=np.asarray(srs.g1_lag[1]))
    return srs
