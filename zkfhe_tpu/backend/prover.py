"""The proving pipeline (SURVEY.md §3.3, rebuilt TPU-native).

create_proof stages, mirroring halo2's protocol with a logUp lookup and
SHPLONK multiopen (see backend/protocol.py for the exact schedule):

  1. jitted witness generation (phase 0), column scatter, blinding,
     phase-0 commitments                         -> squeeze gamma
  2. full witness with gamma, phase-1 + lookup-advice commitments,
     lookup multiplicities                       -> squeeze beta_l
  3. logUp helpers h_g, g_t, accumulator phi     -> squeeze beta_p, gamma_p
  4. permutation grand products (chunked)        -> squeeze y
  5. quotient: fold all constraint terms on the 8n coset with y powers,
     divide by Z_H, split/commit                 -> squeeze x
  6. evaluations of every opened polynomial      -> squeeze v, y2
  7. SHPLONK: per-rotation-set quotients folded into ONE h poly,
     commit H -> squeeze u -> linearization witness W -> proof

Performance shape: every stage below is a MODULE-LEVEL JITTED function
(one XLA executable each, reused across every term/column/proof), so the
host loop issues a few hundred large device calls instead of thousands
of eager ops — essential on TPU where per-executable compilation and
dispatch dominate otherwise.
"""
from __future__ import annotations

import functools
import time
import os

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import curve as C
from ..ops import field as F
from ..ops import msm as M
from ..ops import mxu_field as MX
from ..ops import ntt as N
from ..ops.field import FR
from ..trace.builder import CTX_LK, CTX_P0, CTX_P1, LOOKUP_BITS, NUM_CTX
from ..trace.compile import make_witgen, make_witgen_p0
from . import protocol as PROTO
from .assembly import EXT_FACTOR, LOOKUP_GROUP, PERM_CHUNK
from .keygen import (ProvingKey, commit_columns, commit_columns_lagrange,
                     make_committer, vk_digest)
from .srs import SRS
from .transcript import Transcript

L = F.NLIMBS
_LOG = os.environ.get("ZKFHE_LOG", "") not in ("", "0")


def _log(msg):
    if _LOG:
        import sys, time
        print(f"[prove {time.strftime('%H:%M:%S')}] {msg}",
              file=sys.stderr, flush=True)


# per-stage wall-clock of the most recent prove() (utils/profiling wired
# into the pipeline — SURVEY.md §5 "Tracing/profiling"; bench.py reports
# this in the round JSON)
LAST_STAGES: dict = {}

# polys per coset-NTT launch in the quotient cache fill: wider batches
# cut dispatch count (~600 polys / COS_B launches); one launch's stack
# is L*COS_B*8n*4 bytes (160 MB at k=13 with COS_B=16)
COS_B = int(os.environ.get("ZKFHE_COSET_BATCH", "16"))


def _rand_field_rows(rng, rows, cols):
    vals = [rng.randrange(FR.p) for _ in range(rows * cols)]
    return F.encode_ints_np([FR.to_mont_int(v) for v in vals]).reshape(
        L, rows, cols
    )


class _ProofRng:
    """Blinding source for one proof, sampled ON DEVICE (ops/field
    rand_mont: threefry bits -> 507-bit uniform -> Montgomery reduce).
    One small key upload per proof replaces a host randrange + a
    ~25 ms tunnel transfer per blinding draw. Seeded from os.urandom
    (threefry-2x32 as a PRF over 128 fresh bits) by default; rng_seed
    gives the deterministic path for tests/benches. The draw ORDER is
    fixed by the protocol code: the serial, batched and pipelined
    provers make identical sequences, keeping proof bytes identical
    across them for equal seeds."""

    def __init__(self, seed: bytes | None):
        import hashlib
        data = (os.urandom(16) if seed is None else
                hashlib.blake2b(b"zkfhe-blind:" + seed,
                                digest_size=16).digest())
        key = jax.random.key(int.from_bytes(data[:8], "little",
                                            signed=True))
        key = jax.random.fold_in(key, int.from_bytes(data[8:12], "little"))
        self.key = jax.random.fold_in(key,
                                      int.from_bytes(data[12:16], "little"))
        self._n = 0

    def draw(self, rows: int, cols: int):
        """(L, rows, cols) uniform field elements, Montgomery form."""
        self._n += 1
        return F.rand_mont(FR, jax.random.fold_in(self.key, self._n),
                           (rows, cols))


def _enc_mont_scalar(x: int):
    return jnp.asarray(F.encode(FR, [x % FR.p], mont=True))[:, 0]


def _jit(n_static=1):
    return functools.partial(jax.jit, static_argnums=tuple(range(n_static)))


class PolyStore:
    """name -> (L, n) coefficient array, backed by stacked (L, K, n)
    arrays sliced on demand so the ~650 polynomials of a proof are not
    duplicated as individual buffers (device memory is the binding
    constraint on the axon TPU)."""

    def __init__(self):
        self._direct = {}
        self._stacks = {}

    def __setitem__(self, key, value):
        self._direct[key] = value

    def add_stack(self, names, arr):
        for i, nm in enumerate(names):
            self._stacks[nm] = (arr, i)

    def __getitem__(self, key):
        if key in self._direct:
            return self._direct[key]
        arr, i = self._stacks[key]
        return arr[:, i]

    def gather(self, names):
        """(L, len(names), n) stack of the named polys in ONE batched
        copy per backing-array run. The naive per-name form
        (jnp.stack([store[nm] for nm in names])) issues an eager slice
        op per name; on the axon tunnel each eager dispatch costs
        ~10 ms, which made poly stacking the measured bulk of the
        evals/multiopen/quotient stages (1.3 s per 128-poly stack vs
        3 ms for one jnp.take)."""
        runs = []  # [backing_arr | None, [col | direct_arr, ...]]
        for nm in names:
            if nm in self._direct:
                a, i = None, self._direct[nm]
            else:
                a, i = self._stacks[nm]
            if runs and runs[-1][0] is a and a is not None:
                runs[-1][1].append(i)
            elif runs and runs[-1][0] is None and a is None:
                runs[-1][1].append(i)
            else:
                runs.append([a, [i]])
        pieces = []
        for a, cols in runs:
            if a is None:
                pieces.append(jnp.stack(cols, axis=1))
            elif cols == list(range(a.shape[1])):
                pieces.append(a)
            else:
                pieces.append(jnp.take(a, jnp.asarray(cols, jnp.int32),
                                       axis=1))
        if len(pieces) == 1:
            return pieces[0]
        return jnp.concatenate(pieces, axis=1)


# ---------------------------------------------------------------------------
# Jitted stage kernels (compiled once per shape, cached persistently)
# ---------------------------------------------------------------------------

def _coset(dom_ext, coeffs, cpow):
    """(L, *batch, n) coeffs -> (L, *batch, ext_n) coset evaluations
    (traced helper; one batched NTT per call)."""
    ext_n = dom_ext.n
    pad = [(0, 0)] * (coeffs.ndim - 1) + [(0, ext_n - coeffs.shape[-1])]
    cp = jnp.pad(coeffs, pad)
    cb = cpow.reshape((cpow.shape[0],) + (1,) * (coeffs.ndim - 2) + (ext_n,))
    return N.ntt(dom_ext, F.mont_mul(FR, cp, jnp.broadcast_to(cb, cp.shape)))


@_jit(1)
def _j_coset(dom_ext, coeffs, cpow):
    """(L, n) coeffs -> (L, ext_n) coset evaluations."""
    return _coset(dom_ext, coeffs, cpow)


def _roll(ev, rot):
    return jnp.roll(ev, -EXT_FACTOR * rot, axis=-1)


def _wmul(w, t):
    return F.mont_mul(FR, t, jnp.broadcast_to(w[:, None], t.shape))


def _wsum(ws, terms):
    """(L, G) weights x (L, G, E) terms -> weighted sum (L, E)."""
    t = F.mont_mul(FR, terms,
                   jnp.broadcast_to(ws[:, :, None], terms.shape))
    return F.tree_sum_mod(FR, t, axis=1)


# ---- batched constraint-term kernels (one dispatch per GROUP of terms;
# the round-1 per-term loop paid ~300 host->device dispatches and
# recomputed shared fixed cosets like q_act dozens of times). All stacks
# are PRECOMPUTED coset evaluations (L, G, E): ~900 inline coset NTTs
# (advice cosets twice, sigma every prove) were 14 s of the round-2
# quotient stage; the prove-level cache computes each poly's coset once.

def _gate_terms_partial(ws, a_ev, sel_ev):
    """ws: (L, G); a_ev/sel_ev: (L, G, E) coset evals -> (L, E) weighted
    sum. Padding columns must carry weight 0 (their term value is then
    irrelevant). Partial form so the mesh path can shard the term axis
    (parallel/sharding.sharded_term_batch)."""
    t = F.add(FR, a_ev, F.mont_mul(FR, _roll(a_ev, 1), _roll(a_ev, 2)))
    t = F.sub(FR, t, _roll(a_ev, 3))
    return _wsum(ws, F.mont_mul(FR, sel_ev, t))


@functools.partial(jax.jit, donate_argnums=0)
def _j_gate_terms_batch(acc, ws, a_ev, sel_ev):
    return F.add(FR, acc, _gate_terms_partial(ws, a_ev, sel_ev))


def _chal_terms_partial(ws, a_ev, qg_ev, gamma_m):
    gb = jnp.broadcast_to(gamma_m[:, None, None], a_ev.shape)
    return _wsum(ws, F.mont_mul(FR, qg_ev, F.sub(FR, a_ev, gb)))


@functools.partial(jax.jit, donate_argnums=0)
def _j_chal_terms_batch(acc, ws, a_ev, qg_ev, gamma_m):
    return F.add(FR, acc, _chal_terms_partial(ws, a_ev, qg_ev, gamma_m))


@jax.jit
def _j_acc_add(acc, part):
    return F.add(FR, acc, part)


_j_elt_mul = jax.jit(functools.partial(F.mont_mul, FR))


def _lookup_h_terms_partial(ws, h_ev, l_ev, qact_ev, beta_m):
    """All FULL logUp helper groups at once. h_ev: (L, NG, E) helper
    cosets; l_ev: (L, NG, Gc, E) lookup-column cosets per group.
    Padding groups (zero stacks) must carry weight 0."""
    NG, Gc = l_ev.shape[1], l_ev.shape[2]
    h = h_ev
    facs = []
    for i in range(Gc):
        li = l_ev[:, :, i]
        facs.append(F.add(FR, li,
                          jnp.broadcast_to(beta_m[:, None, None], li.shape)))
    prod = facs[0]
    for f2 in facs[1:]:
        prod = F.mont_mul(FR, prod, f2)
    lhs = F.mont_mul(FR, h, prod)
    rhs = jnp.zeros_like(lhs)
    one = jnp.broadcast_to(_enc_mont_scalar(1)[:, None, None], lhs.shape)
    for j in range(Gc):
        pr = one
        for kk in range(Gc):
            if kk != j:
                pr = F.mont_mul(FR, pr, facs[kk])
        rhs = F.add(FR, rhs, pr)
    term = F.mont_mul(
        FR, jnp.broadcast_to(qact_ev[:, None, :], lhs.shape),
        F.sub(FR, lhs, rhs))
    return _wsum(ws, term)


@functools.partial(jax.jit, donate_argnums=0)
def _j_lookup_h_terms_batch(acc, ws, h_ev, l_ev, qact_ev, beta_m):
    return F.add(FR, acc, _lookup_h_terms_partial(
        ws, h_ev, l_ev, qact_ev, beta_m))


def _perm_chunks_partial(ws, z_ev, v_ev, sig_ev, dpows, qact_ev, xcoset,
                         beta_m, gamma_m):
    """J FULL permutation chunks -> (L, E) weighted sum. z_ev:
    (L, J, E); v_ev/sig_ev: (L, J, CH, E); dpows: (L, J, CH).
    Padded chunks (all-zero stacks) must carry weight 0."""
    J, CH = v_ev.shape[1], v_ev.shape[2]
    z = z_ev
    lhs, rhs = _roll(z, 1), z
    for i in range(CH):
        v = v_ev[:, :, i]
        sig = sig_ev[:, :, i]
        bb = jnp.broadcast_to(beta_m[:, None, None], v.shape)
        gg = jnp.broadcast_to(gamma_m[:, None, None], v.shape)
        lhs = F.mont_mul(FR, lhs, F.add(
            FR, v, F.add(FR, F.mont_mul(FR, bb, sig), gg)))
        did = F.mont_mul(
            FR, jnp.broadcast_to(dpows[:, :, i, None], v.shape),
            jnp.broadcast_to(xcoset[:, None, :], v.shape))
        rhs = F.mont_mul(FR, rhs, F.add(
            FR, v, F.add(FR, F.mont_mul(FR, bb, did), gg)))
    term = F.mont_mul(
        FR, jnp.broadcast_to(qact_ev[:, None, :], lhs.shape),
        F.sub(FR, lhs, rhs))
    return _wsum(ws, term)


@functools.partial(jax.jit, donate_argnums=0)
def _j_perm_chunks_batch(acc, ws, z_ev, v_ev, sig_ev, dpows, qact_ev,
                         xcoset, beta_m, gamma_m):
    return F.add(FR, acc, _perm_chunks_partial(
        ws, z_ev, v_ev, sig_ev, dpows, qact_ev, xcoset, beta_m, gamma_m))


def _perm_chains_partial(u, ws, zj_ev, zprev_ev, qfirst_ev):
    """Chain terms for a batch of consecutive z polys. Padding rows must
    carry weight 0."""
    zprev_u = jnp.roll(zprev_ev, -EXT_FACTOR * u, axis=-1)
    term = F.mont_mul(
        FR, jnp.broadcast_to(qfirst_ev[:, None, :], zj_ev.shape),
        F.sub(FR, zj_ev, zprev_u))
    return _wsum(ws, term)


@functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
def _j_perm_chains_batch(u, acc, ws, zj_ev, zprev_ev, qfirst_ev):
    return F.add(FR, acc, _perm_chains_partial(
        u, ws, zj_ev, zprev_ev, qfirst_ev))


@functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
def _j_lookup_h_term(dom_ext, acc, w, h_coeffs, l_coeffs, qact_coeffs,
                     cpow, beta_m):
    """l_coeffs: (L, G, n) stacked lookup-column coeffs for this group."""
    G = l_coeffs.shape[1]
    qact = _j_coset(dom_ext, qact_coeffs, cpow)
    h = _j_coset(dom_ext, h_coeffs, cpow)
    facs = []
    for i in range(G):
        li = _j_coset(dom_ext, l_coeffs[:, i], cpow)
        facs.append(F.add(FR, li, jnp.broadcast_to(beta_m[:, None], li.shape)))
    prod = facs[0]
    for f2 in facs[1:]:
        prod = F.mont_mul(FR, prod, f2)
    lhs = F.mont_mul(FR, h, prod)
    one = jnp.broadcast_to(_enc_mont_scalar(1)[:, None], lhs.shape)
    rhs = jnp.zeros_like(lhs)
    for j in range(G):
        pr = one
        for kk in range(G):
            if kk != j:
                pr = F.mont_mul(FR, pr, facs[kk])
        rhs = F.add(FR, rhs, pr)
    return F.add(FR, acc, _wmul(w, F.mont_mul(FR, qact, F.sub(FR, lhs, rhs))))


@functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
def _j_lookup_table_term(dom_ext, acc, w, g_coeffs, t_coeffs, m_coeffs,
                         qact_coeffs, cpow, beta_m):
    qact = _j_coset(dom_ext, qact_coeffs, cpow)
    g_ev = _j_coset(dom_ext, g_coeffs, cpow)
    t_ev = _j_coset(dom_ext, t_coeffs, cpow)
    m_ev = _j_coset(dom_ext, m_coeffs, cpow)
    bb = jnp.broadcast_to(beta_m[:, None], t_ev.shape)
    t0 = F.sub(FR, F.mont_mul(FR, g_ev, F.add(FR, t_ev, bb)), m_ev)
    return F.add(FR, acc, _wmul(w, F.mont_mul(FR, qact, t0)))


@functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
def _j_lookup_acc_term(dom_ext, acc, w, phi_coeffs, h_stack, g_coeffs,
                       qact_coeffs, cpow):
    """h_stack: (L, NG, n) all group-helper coeffs."""
    qact = _j_coset(dom_ext, qact_coeffs, cpow)
    phi = _j_coset(dom_ext, phi_coeffs, cpow)
    sh = F.sub(FR, _roll(phi, 1), phi)
    hsum = jnp.zeros_like(phi)
    for g in range(h_stack.shape[1]):
        hsum = F.add(FR, hsum, _j_coset(dom_ext, h_stack[:, g], cpow))
    g_ev = _j_coset(dom_ext, g_coeffs, cpow)
    t0 = F.add(FR, F.sub(FR, sh, hsum), g_ev)
    return F.add(FR, acc, _wmul(w, F.mont_mul(FR, qact, t0)))


@functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
def _j_sel_poly_term(dom_ext, acc, w, poly_coeffs, sel_coeffs, cpow):
    """sel * poly (lookup_first/lookup_last boundary terms)."""
    sel = _j_coset(dom_ext, sel_coeffs, cpow)
    pv = _j_coset(dom_ext, poly_coeffs, cpow)
    return F.add(FR, acc, _wmul(w, F.mont_mul(FR, sel, pv)))


@functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
def _j_sel_poly_minus_one_term(dom_ext, acc, w, poly_coeffs, sel_coeffs,
                               cpow):
    """sel * (poly - 1) (perm_first/perm_last boundary terms)."""
    sel = _j_coset(dom_ext, sel_coeffs, cpow)
    pv = _j_coset(dom_ext, poly_coeffs, cpow)
    onem = jnp.broadcast_to(_enc_mont_scalar(1)[:, None], pv.shape)
    return F.add(FR, acc, _wmul(w, F.mont_mul(FR, sel, F.sub(FR, pv, onem))))


@functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
def _j_perm_chunk_term(dom_ext, acc, w, z_coeffs, v_coeffs, sig_coeffs,
                       qact_coeffs, cpow, xcoset, dpows, beta_m, gamma_m):
    """v_coeffs/sig_coeffs: (L, CH, n); dpows: (L, CH) delta^i Montgomery."""
    CH = v_coeffs.shape[1]
    qact = _j_coset(dom_ext, qact_coeffs, cpow)
    z = _j_coset(dom_ext, z_coeffs, cpow)
    lhs, rhs = _roll(z, 1), z
    for i in range(CH):
        v = _j_coset(dom_ext, v_coeffs[:, i], cpow)
        sig = _j_coset(dom_ext, sig_coeffs[:, i], cpow)
        bb = jnp.broadcast_to(beta_m[:, None], v.shape)
        gg = jnp.broadcast_to(gamma_m[:, None], v.shape)
        lhs = F.mont_mul(FR, lhs, F.add(
            FR, v, F.add(FR, F.mont_mul(FR, bb, sig), gg)))
        did = F.mont_mul(
            FR, jnp.broadcast_to(dpows[:, i][:, None], xcoset.shape), xcoset)
        rhs = F.mont_mul(FR, rhs, F.add(
            FR, v, F.add(FR, F.mont_mul(FR, bb, did), gg)))
    return F.add(FR, acc, _wmul(w, F.mont_mul(FR, qact, F.sub(FR, lhs, rhs))))


@_jit(1)
def _j_quot_finish(dom_ext, acc, zh_inv, cpow_inv):
    h_ev = F.mont_mul(FR, acc, zh_inv)
    h_coeffs = N.intt(dom_ext, h_ev)
    return F.mont_mul(FR, h_coeffs, cpow_inv)


@jax.jit
def _j_evals_batch(coeffs_stack, xpow):
    """(L, K, n) stack -> (L, K) evals at one point."""
    prods = F.mont_mul(FR, coeffs_stack,
                       jnp.broadcast_to(xpow[:, None], coeffs_stack.shape))
    return F.tree_sum_mod(FR, prods, axis=-1)


@jax.jit
def _j_divide_linear(comb, ce, zm, zim):
    """(f(X) - f(z))/(X - z): subtract ce from the constant term, then
    synthetic division via log-depth suffix sums: b_j = z^-(j+1) S_{j+1}
    with S_j = sum_{i>=j} a_i z^i. The suffix sums are Hillis-Steele
    shift+add rounds over the full row (Pallas-sized on TPU) rather
    than an associative_scan of tiny moveaxis'd adds."""
    n = comb.shape[-1]
    comb = comb.at[:, 0].set(F.sub(FR, comb[:, 0:1], ce[:, None])[:, 0])
    zp = F.power_series(FR, zm, n)
    zip_ = F.power_series(FR, zim, n + 1)
    s = F.mont_mul(FR, comb, zp)
    step = 1
    while step < n:
        shifted = jnp.concatenate(
            [s[:, step:], jnp.zeros((L, step), dtype=jnp.uint32)], axis=1)
        s = F.add(FR, s, shifted)
        step *= 2
    s_next = jnp.concatenate(
        [s[:, 1:], jnp.zeros((L, 1), dtype=jnp.uint32)], axis=1)
    return F.mont_mul(FR, s_next, zip_[:, 1:])


@functools.partial(jax.jit, static_argnums=0)
def _j_sub_low(m, comb, rc_enc):
    """Subtract an (L, m) Montgomery coefficient block from the low-order
    coefficients of comb (SHPLONK's f_i - r_i with deg r_i < m <= 4)."""
    return comb.at[:, :m].set(F.sub(FR, comb[:, :m], rc_enc))


@jax.jit
def _j_combine(coeffs_stack, vpows):
    """sum_j vpows[j] * coeffs_stack[:, j] -> (L, n), on the MXU
    (8.5x the Pallas mont_mul+tree_sum at 190x8192 on v5e)."""
    return MX.mat_mul_mont(FR, vpows[:, None, :], coeffs_stack)[:, 0]


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def _j_advice_p0(p0, n, u, values_p0, idx_p0, blind_p0):
    """Phase-0-only advice EVALUATIONS: scatter just the CTX_P0 cells
    (assembly places them in columns [0, p0)), convert to Montgomery and
    append the blinding rows — no iNTT (the table committer consumes
    Lagrange values; coefficients are only ever needed after witgen1)."""
    flat = jnp.zeros((L, p0 * n), dtype=jnp.uint32)
    if values_p0.shape[1]:
        flat = flat.at[:, idx_p0].set(values_p0)
    adv = F.to_mont(FR, flat.reshape(L, p0, n))
    return jnp.concatenate([adv[:, :, :u], blind_p0], axis=2)


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _j_advice(dom, num_advice, n, u, values, scatter_idx, blind):
    """Scatter trace cells into the (L, A, n) advice matrix, convert to
    Montgomery, append blinding rows, and iNTT to coefficients."""
    flat = jnp.zeros((L, num_advice * n), dtype=jnp.uint32)
    for ctx in range(NUM_CTX):
        if values[ctx].shape[1]:
            flat = flat.at[:, scatter_idx[ctx]].set(values[ctx])
    adv = F.to_mont(FR, flat.reshape(L, num_advice, n))
    adv = jnp.concatenate([adv[:, :, :u], blind], axis=2)
    return adv, N.intt(dom, adv)


@_jit(2)
def _j_lookup_aux(dom, u, lk_cols, m_vals, table_vals, beta_m, rand_h,
                  rand_g, rand_phi):
    """logUp helpers: returns (h_all values, h coeffs, g coeffs, phi
    coeffs). lk_cols: (L, nlk, n) Montgomery Lagrange values."""
    n = dom.n
    nlk = lk_cols.shape[1]
    ngroups = -(-nlk // LOOKUP_GROUP)
    bcast = jnp.broadcast_to(beta_m[:, None, None], lk_cols.shape)
    denoms = F.add(FR, lk_cols, bcast)
    inv = F.batch_inv(FR, denoms.reshape(L, -1)).reshape(denoms.shape)
    hs = []
    for g in range(ngroups):
        sl = inv[:, g * LOOKUP_GROUP:(g + 1) * LOOKUP_GROUP, :]
        hs.append(F.tree_sum_mod(FR, sl, axis=1))
    h_all = jnp.stack(hs, axis=1)
    tden = F.add(FR, table_vals,
                 jnp.broadcast_to(beta_m[:, None], table_vals.shape))
    g_vals = F.mont_mul(FR, m_vals, F.batch_inv(FR, tden))
    s_vals = F.sub(FR, F.tree_sum_mod(FR, h_all, axis=1), g_vals)
    act = (jnp.arange(n) < u)
    s_vals = jnp.where(act[None], s_vals, jnp.zeros_like(s_vals))
    moved = jnp.moveaxis(s_vals, -1, 0)[:, :, None]

    def addop(xx, yy):
        return jnp.moveaxis(
            F.add(FR, jnp.moveaxis(xx, 1, 0), jnp.moveaxis(yy, 1, 0)), 0, 1)

    pref = jnp.moveaxis(
        jax.lax.associative_scan(addop, moved)[..., 0], 0, -1)
    phi = jnp.concatenate(
        [jnp.zeros((L, 1), dtype=jnp.uint32), pref[:, :-1]], axis=1)
    phi = jnp.concatenate([phi[:, : u + 1], rand_phi], axis=1)
    h_all = jnp.concatenate([h_all[:, :, :u], rand_h], axis=2)
    g_vals = jnp.concatenate([g_vals[:, :u], rand_g], axis=1)
    h_coeffs = N.intt(dom, h_all)
    g_coeffs = N.intt(dom, g_vals)
    phi_coeffs = N.intt(dom, phi)
    return h_all, g_vals, phi, h_coeffs, g_coeffs, phi_coeffs


@_jit(2)
def _j_perm_z(dom, u, perm_vals, sigma_vals, dpow, wpow, beta_m, gamma_m,
              rand_z):
    """All permutation grand-product polys.

    perm_vals/sigma_vals: (L, P, n); rand_z: (L, nz, n-u-1).
    Returns (z_lagrange (L, nz, n), z_coeffs (L, nz, n))."""
    n = dom.n
    P = perm_vals.shape[1]
    nz = rand_z.shape[1]
    idv = F.mont_mul(
        FR,
        jnp.broadcast_to(dpow[:, :, None], (L, P, n)),
        jnp.broadcast_to(wpow[:, None, :], (L, P, n)),
    )
    bb = jnp.broadcast_to(beta_m[:, None, None], (L, P, n))
    gg = jnp.broadcast_to(gamma_m[:, None, None], (L, P, n))
    num = F.add(FR, perm_vals, F.add(FR, F.mont_mul(FR, bb, idv), gg))
    den = F.add(FR, perm_vals, F.add(FR, F.mont_mul(FR, bb, sigma_vals), gg))
    den_inv = F.batch_inv(FR, den.reshape(L, -1)).reshape(den.shape)
    ratio = F.mont_mul(FR, num, den_inv)

    def mulop(xx, yy):
        return jnp.moveaxis(
            F.mont_mul(FR, jnp.moveaxis(xx, 1, 0), jnp.moveaxis(yy, 1, 0)),
            0, 1)

    one_m = _enc_mont_scalar(1)
    chain = jnp.broadcast_to(one_m[:, None], (L, 1))[:, 0]
    z_lag = []
    for j in range(nz):
        sl = ratio[:, j * PERM_CHUNK:(j + 1) * PERM_CHUNK, :u]
        prod = sl[:, 0]
        for i in range(1, sl.shape[1]):
            prod = F.mont_mul(FR, prod, sl[:, i])
        moved = jnp.moveaxis(prod, -1, 0)[:, :, None]
        pref = jnp.moveaxis(
            jax.lax.associative_scan(mulop, moved)[..., 0], 0, -1)
        zvals = jnp.concatenate(
            [jnp.broadcast_to(one_m[:, None], (L, 1)), pref], axis=1)
        zvals = F.mont_mul(
            FR, zvals, jnp.broadcast_to(chain[:, None], zvals.shape))
        chain = zvals[:, -1]
        zvals = jnp.concatenate([zvals, rand_z[:, j]], axis=1)
        z_lag.append(zvals)
    z_lag = jnp.stack(z_lag, axis=1)  # (L, nz, n)
    z_coeffs = N.intt(dom, z_lag)
    return z_lag, z_coeffs


# ---------------------------------------------------------------------------
# The prover
# ---------------------------------------------------------------------------

def _term_plan(shape, nd: int) -> np.ndarray:
    """ypows indices (exponent ny-1-ti, i.e. the y-weight of term ti)
    for every BATCHED term-weight slice of the quotient loop, in exactly
    the order the loop consumes them. Static per (circuit shape, device
    count); uploaded once per pk so per-prove term weights become one
    device take + slices instead of ~40 host encodes (~25 ms each over
    the remote tunnel). The consuming enc_ws asserts each slice against
    this plan, so the two copies of the grouping logic cannot drift."""
    terms = PROTO.build_terms(shape)
    ny = len(terms)
    nlk = shape["num_lk_cols"]
    P = shape["num_perm_cols"]
    gate_b = -(-8 // nd) * nd
    permj = -(-4 // nd) * nd
    by_kind = {}
    for ti, (kind, arg) in enumerate(terms):
        by_kind.setdefault(kind, []).append((ti, arg))
    out = []
    for kind in ("gate", "challenge"):
        grp_all = by_kind.get(kind, [])
        for s in range(0, len(grp_all), gate_b):
            out += [ny - 1 - ti for ti, _ in grp_all[s:s + gate_b]]
    lk_full = [
        (ti, g) for ti, g in by_kind.get("lookup_h", [])
        if min((g + 1) * LOOKUP_GROUP, nlk) - g * LOOKUP_GROUP
        == LOOKUP_GROUP
    ]
    if lk_full:
        out += [ny - 1 - ti for ti, _ in lk_full]
    pc_full = [(ti, j) for ti, j in by_kind.get("perm_chunk", [])
               if min((j + 1) * PERM_CHUNK, P) - j * PERM_CHUNK
               == PERM_CHUNK]
    for s in range(0, len(pc_full), permj):
        out += [ny - 1 - ti for ti, _ in pc_full[s:s + permj]]
    chains = by_kind.get("perm_chain", [])
    for s in range(0, len(chains), gate_b):
        out += [ny - 1 - ti for ti, _ in chains[s:s + gate_b]]
    return np.asarray(out, dtype=np.int64)


def _pk_device_state(pk: ProvingKey, dom, dom_ext, nd: int) -> dict:
    """Device-resident per-pk constants, uploaded ONCE and reused by
    every prove. The remote-TPU tunnel charges ~25-40 ms per transfer
    and ~7 MB/s of bandwidth; before this cache each prove re-uploaded
    the ~12 MB scatter indices, the delta/omega/coset power series, the
    Z_H^-1 cycle and the lookup table — several seconds of pure
    transfer per proof."""
    key = (dom.n, dom_ext.n, nd)
    cache = getattr(pk, "_dev_state", None)
    if cache is not None and cache.get("key") == key:
        return cache
    asm = pk.asm
    n, ext_n = dom.n, dom_ext.n
    delta = pk.vk.delta
    c: dict = {"key": key}
    c["scatter_idx"] = tuple(
        jnp.asarray(asm.cell_col[ctx].astype(np.int64) * n
                    + asm.cell_row[ctx].astype(np.int64))
        for ctx in range(NUM_CTX)
    )
    P = asm.num_perm_cols
    dp = [1] * P
    for i in range(1, P):
        dp[i] = dp[i - 1] * delta % FR.p
    c["dpow"] = jnp.asarray(F.encode(FR, dp, mont=True))
    c["wpow"] = F.power_series(FR, _enc_mont_scalar(dom.omega), n)
    c["cpow"] = F.power_series(FR, _enc_mont_scalar(delta), ext_n)
    c["cpow_inv"] = F.power_series(
        FR, _enc_mont_scalar(pow(delta, FR.p - 2, FR.p)), ext_n)
    c["xcoset"] = F.mont_mul(
        FR,
        F.power_series(FR, _enc_mont_scalar(dom_ext.omega), ext_n),
        jnp.broadcast_to(_enc_mont_scalar(delta)[:, None], (L, ext_n)),
    )
    zh_cycle = []
    gn = pow(delta, n, FR.p)
    for j in range(EXT_FACTOR):
        val = (gn * pow(dom_ext.omega, n * j, FR.p) - 1) % FR.p
        zh_cycle.append(pow(val, FR.p - 2, FR.p))
    c["zh_inv"] = jnp.tile(
        jnp.asarray(F.encode(FR, zh_cycle, mont=True)),
        (1, ext_n // EXT_FACTOR))
    table_std = np.zeros(n, dtype=np.uint64)
    table_std[: 1 << LOOKUP_BITS] = np.arange(1 << LOOKUP_BITS)
    c["table_vals"] = F.to_mont(
        FR, jnp.asarray(F.encode_ints_np(list(table_std))))
    c["fixed_vals_const"] = N.ntt(dom, pk.fixed_coeffs[:, 0])
    # per-rotation twiddle series omega^(r*j): lets the evals stage build
    # all opening-point power series from ONE series of x (x*w^r)^j =
    # x^j * w^(rj) instead of a log-depth series per rotation
    rp = []
    for r in PROTO.ROTATIONS:
        e = r if r != PROTO.ROT_LAST else asm.u
        rp.append(F.power_series(
            FR, _enc_mont_scalar(pow(dom.omega, e, FR.p)), n))
    c["rot_pows"] = jnp.stack(rp, axis=2)  # (L, n, R)
    plan = _term_plan(pk.vk.shape, nd)
    c["term_plan_np"] = plan
    c["term_plan"] = jnp.asarray(plan)
    pk._dev_state = c
    return c


def prove(pk: ProvingKey, srs: SRS, circuit_fn, inputs,
          rng_seed: bytes | None = None, debug: bool = False,
          mesh=None, mesh_axis: str = "chips") -> bytes:
    """Produce a proof. With mesh (a jax.sharding.Mesh), the hot stages
    run multi-chip: commitment MSMs shard the SRS-point axis
    (parallel/sharding.sharded_msm_tab) and quotient constraint batches
    shard the term axis (sharded_term_batch), partial results combining
    over ICI collectives. The proof bytes are identical to the
    single-device path (exact field arithmetic, layout-only change)."""
    gen = _prove_gen(pk, srs, circuit_fn, inputs, rng_seed=rng_seed,
                     debug=debug, mesh=mesh, mesh_axis=mesh_axis)
    try:
        while True:
            next(gen)
    except StopIteration as e:
        return e.value


def _prove_gen(pk: ProvingKey, srs: SRS, circuit_fn, inputs,
               rng_seed: bytes | None = None, debug: bool = False,
               mesh=None, mesh_axis: str = "chips",
               coset_cache_mb: int | None = None):
    """Generator form of prove(): yields at every device-dispatch /
    host-sync boundary — each pause point has already ENQUEUED its device
    work (MSMs, NTTs, term batches) but not yet paid the device->host
    transfer or the transcript hashing that follows it. A scheduler
    advancing several of these round-robin (parallel/pipeline.py
    prove_stream) therefore overlaps proof i's host-side transcript work
    with proof i+1's device compute — the SURVEY.md §2.3
    pipeline-parallel axis (phase pipeline). Driven to completion by
    prove() for the single-proof path; proof bytes are identical either
    way (the yield points change scheduling only, never math)."""
    asm = pk.asm
    k, n, u = asm.k, asm.n, asm.u
    dom = N.Domain.new(k)
    ext_k = k + EXT_FACTOR.bit_length() - 1
    dom_ext = N.Domain.new(ext_k)
    ext_n = dom_ext.n
    delta = pk.vk.delta
    shape = pk.vk.shape

    # blinding randomness: device-side threefry keyed from os.urandom by
    # default; the seeded path exists ONLY for deterministic tests/benches
    # (ADVICE.md round-1 low)
    rngd = _ProofRng(rng_seed)
    nd = 1 if mesh is None else mesh.shape[mesh_axis]
    dstate = _pk_device_state(pk, dom, dom_ext, nd)

    from ..utils.profiling import StageTimer
    _timer = StageTimer("prove", stream=None)

    tr = Transcript()
    # bind the proof to the circuit: vk digest first, then the statement
    tr.common_bytes(vk_digest(pk.vk))
    witgen = make_witgen(circuit_fn)

    # ---- phase 0 -----------------------------------------------------------
    # pruned first pass: only the CTX_P0 trace + the instance are
    # computed (XLA DCEs the rest of the circuit), and only the p0
    # columns are scattered — no full-width advice iNTT before gamma
    values0_p0, instance = make_witgen_p0(circuit_fn)(inputs)
    yield  # witgen dispatched; decode below blocks on it
    inst_ints = F.decode(FR, instance)
    for v in inst_ints:
        tr.common_scalar(v)
    _timer.mark("witgen0")

    scatter_idx = dstate["scatter_idx"]
    blind = rngd.draw(asm.num_advice, n - u)
    p0 = asm.num_p0_cols
    adv_p0 = (_j_advice_p0(p0, n, u, values0_p0, scatter_idx[CTX_P0],
                           blind[:, :p0]) if p0 else None)

    committer = make_committer(srs, n, u, mesh=mesh, mesh_axis=mesh_axis)

    def commit_evals(evals, col_bits=None):
        """Advice commitment (width-tiered main rows + shared blind
        tail); col_bits = STATIC per-column bounds (Assembly.col_bits) so
        tier choice never reads witness magnitudes. Default: the
        fixed-base table MSM; ZKFHE_MSM=scanlag forces the round-1
        bucket-scan Lagrange path, ZKFHE_MSM=scan (or ZKFHE_NO_LAGRANGE=1)
        the coefficient-form scan path."""
        if committer is not None:
            return committer.commit_values(evals, col_bits=col_bits)
        if srs.g1_lag is not None and not os.environ.get("ZKFHE_NO_LAGRANGE"):
            return commit_columns_lagrange(srs.g1_lag, evals, u)
        return commit_columns(srs, N.intt(dom, evals))

    def commit_vals(vals):
        """Full-width evaluation-form columns (lookup helpers, z polys)."""
        if committer is not None:
            return committer.commit_values(vals, split_tail=False)
        return commit_columns(srs, N.intt(dom, vals))

    def commit_coeffs(coeffs):
        """Full-width coefficient-form columns (quotient, W, random)."""
        if committer is not None:
            return committer.commit_coeffs(coeffs, dom)
        return commit_columns(srs, coeffs)

    # async variants: dispatch the MSMs now, defer the transfer+decode to
    # the returned closure — the generator yields between the two so a
    # pipeline scheduler can enqueue another proof's device stages. The
    # non-table fallbacks (A/B knobs) just run eagerly.
    def commit_evals_async(evals, col_bits=None):
        if committer is not None:
            return committer.commit_values(evals, col_bits=col_bits,
                                           sync=False)
        pts = commit_evals(evals, col_bits)
        return lambda: pts

    def commit_vals_async(vals):
        if committer is not None:
            return committer.commit_values(vals, split_tail=False,
                                           sync=False)
        pts = commit_vals(vals)
        return lambda: pts

    def commit_coeffs_async(coeffs):
        if committer is not None:
            return committer.commit_coeffs(coeffs, dom, sync=False)
        pts = commit_coeffs(coeffs)
        return lambda: pts

    fin_p0 = (commit_evals_async(adv_p0, asm.col_bits[:p0]) if p0
              else (lambda: []))
    yield  # phase-0 commit MSMs dispatched
    for pt in fin_p0():
        tr.write_point(pt)

    _log("phase-0 committed")
    _timer.mark("phase0_commit")
    gamma = tr.challenge()

    # ---- full witness with the real challenge ------------------------------
    values1, instance1 = witgen(
        inputs, jnp.asarray(F.encode(FR, [gamma]))[:, 0])
    # instance cells must be challenge-independent (they are absorbed into
    # the transcript before gamma); every phase-0 ADVICE cell too: the
    # phase-0 commitment was produced from run 1's values, while
    # evaluations use run 2's — any gamma-dependence here would silently
    # yield an invalid proof (VERDICT round-1 weak #7). Device-side
    # compare: the host transfer of both trace buffers cost ~220MB per
    # proof. Both equality reductions are dispatched, then checked after
    # the yield.
    eq_inst = jnp.array_equal(instance, instance1)
    eq_p0 = jnp.array_equal(values0_p0, values1[CTX_P0])
    adv, adv_coeffs = _j_advice(dom, asm.num_advice, n, u, values1,
                                scatter_idx, blind)
    fin_p1 = commit_evals_async(adv[:, p0:], asm.col_bits[p0:])
    yield  # witgen1 + phase-1 commit MSMs dispatched
    assert bool(eq_inst), "instance values depend on the challenge"
    assert bool(eq_p0), "phase-0 advice values depend on the challenge"
    _timer.mark("witgen1")
    for pt in fin_p1():
        tr.write_point(pt)

    polys = PolyStore()
    polys.add_stack([f"adv{i}" for i in range(asm.num_advice)], adv_coeffs)
    polys.add_stack([f"fixed{i}" for i in range(pk.fixed_coeffs.shape[1])],
                    pk.fixed_coeffs)
    polys.add_stack([f"sigma{i}" for i in range(pk.sigma_coeffs.shape[1])],
                    pk.sigma_coeffs)

    inst_vals = jnp.zeros((L, n), dtype=jnp.uint32)
    if instance.shape[1]:
        inst_vals = inst_vals.at[:, : instance.shape[1]].set(
            F.to_mont(FR, instance))
    polys["instance"] = N.intt(dom, inst_vals)

    # ---- lookup multiplicities ---------------------------------------------
    nlk = asm.num_lk_cols
    lk_base = asm.num_advice - nlk
    ngroups = PROTO.num_lookup_groups(shape)
    table_vals = dstate["table_vals"]

    h_coeffs = None
    if nlk:
        lk_vals_std = values1[CTX_LK][0]
        counts = jnp.bincount(lk_vals_std.astype(jnp.int32),
                              length=1 << LOOKUP_BITS)
        counts = counts.at[0].add(nlk * u - lk_vals_std.shape[0])
        m_vals_std = jnp.zeros((L, n), dtype=jnp.uint32)
        m_vals_std = m_vals_std.at[0, : 1 << LOOKUP_BITS].set(
            counts.astype(jnp.uint32))
        m_vals_std, _ = F._carry_chain(m_vals_std)
        m_vals = F.to_mont(FR, m_vals_std)
        m_vals = jnp.concatenate(
            [m_vals[:, :u], rngd.draw(1, n - u)[:, 0]], axis=1)
        polys["lookup_m"] = N.intt(dom, m_vals)
        # multiplicity counts are bounded by the number of looked-up cells
        fin_m = commit_evals_async(m_vals[:, None],
                                   np.asarray([(nlk * u).bit_length()]))
        yield  # multiplicity commit dispatched
        for pt in fin_m():
            tr.write_point(pt)

    _log("phase-1 + multiplicities committed")
    _timer.mark("phase1_commit")
    beta_l = tr.challenge()
    beta_lm = _enc_mont_scalar(beta_l)

    if nlk:
        h_all, g_vals, phi_vals, h_coeffs, g_coeffs, phi_coeffs = \
            _j_lookup_aux(
                dom, u, adv[:, lk_base:, :], m_vals, table_vals, beta_lm,
                rngd.draw(ngroups, n - u),
                rngd.draw(1, n - u)[:, 0],
                rngd.draw(1, n - u - 1)[:, 0],
            )
        polys.add_stack([f"lookup_h{g}" for g in range(ngroups)], h_coeffs)
        polys["lookup_g"] = g_coeffs
        polys["lookup_phi"] = phi_coeffs
        aux_vals = jnp.concatenate(
            [h_all, g_vals[:, None], phi_vals[:, None]], axis=1)
        fin_aux = commit_vals_async(aux_vals)
        yield  # lookup-helper commits dispatched
        for pt in fin_aux():
            tr.write_point(pt)

    _log("lookup helpers committed")
    _timer.mark("lookup_commit")
    beta_p = tr.challenge()
    gamma_p = tr.challenge()
    bg_enc = jnp.asarray(F.encode(FR, [beta_p, gamma_p], mont=True))
    beta_pm, gamma_pm = bg_enc[:, 0], bg_enc[:, 1]

    # ---- permutation grand products ----------------------------------------
    P = asm.num_perm_cols
    nz = PROTO.num_perm_chunks(shape)
    perm_vals = jnp.concatenate(
        [adv, dstate["fixed_vals_const"][:, None], inst_vals[:, None]],
        axis=1)

    dpow = dstate["dpow"]
    wpow = dstate["wpow"]

    z_lag, z_coeffs = _j_perm_z(
        dom, u, perm_vals, pk.sigma_vals, dpow, wpow, beta_pm, gamma_pm,
        rngd.draw(nz, n - u - 1),
    )
    rand_coeffs = rngd.draw(1, n)[:, 0]
    polys["random"] = rand_coeffs
    # z products + the random poly commit through ONE call (one decode
    # transfer); point order (z..., random) matches the transcript
    zr_vals = jnp.concatenate([z_lag, N.ntt(dom, rand_coeffs)[:, None]],
                              axis=1)
    fin_zr = commit_vals_async(zr_vals)
    yield  # grand-product + random commits dispatched
    jax.block_until_ready(z_lag)
    _timer.mark("perm_z")
    del perm_vals  # large Lagrange buffer no longer needed
    if not debug:
        del adv  # kept only for the debug on-domain term check below
    polys.add_stack([f"perm_z{j}" for j in range(nz)], z_coeffs)
    for pt in fin_zr():
        tr.write_point(pt)

    _log("permutation products + random committed")
    _timer.mark("perm_commit")
    y = tr.challenge()

    if debug:
        _debug_terms_on_domain(
            pk, dom, adv, inst_vals, gamma, beta_l, beta_p, gamma_p,
            [z_lag[:, j] for j in range(nz)],
            dict(h_all=h_all if nlk else None,
                 g_vals=g_vals if nlk else None,
                 m_vals=m_vals if nlk else None,
                 phi=phi_vals if nlk else None,
                 table_vals=table_vals, dpow=dpow, wpow=wpow))

    # ---- quotient on the extended coset ------------------------------------
    coset_gen = delta
    cpow = dstate["cpow"]
    cpow_inv = dstate["cpow_inv"]
    xcoset = dstate["xcoset"]

    terms = PROTO.build_terms(shape)
    ny = len(terms)
    # term weights y^(ny-1-ti) live on device: ONE scalar upload + a
    # log-depth power scan + one static take against the pk's term plan,
    # instead of a host encode+transfer per term batch (~40 x 25 ms)
    ypows_dev = F.power_series(FR, _enc_mont_scalar(y), ny)
    ws_all = jnp.take(ypows_dev, dstate["term_plan"], axis=1)
    _ws_cursor = [0]

    def y_weight(ti):
        """(L,) device weight y^(ny-1-ti) for singleton/ragged terms."""
        return ypows_dev[:, ny - 1 - ti]

    fixed_names = PROTO.fixed_poly_names(shape)
    fidx = {nm: i for i, nm in enumerate(fixed_names)}

    def fco(nm):
        return polys[f"fixed{fidx[nm]}"]

    gamma_m = _enc_mont_scalar(gamma)
    acc = jnp.zeros((L, ext_n), dtype=jnp.uint32)


    # ---- coset cache: every polynomial's 8n-coset evaluation computed
    # exactly ONCE per prove (batched 8 columns per NTT launch). The
    # inline-coset kernels redid ~900 column NTTs (advice twice — gate
    # terms then permutation chunks — sigma every prove): 14 s of the
    # measured quotient stage. Cost: ~5 MB x #polys device residency,
    # freed right after the quotient accumulation.
    #
    # STATIC polys (fixed{i}, sigma{i} — constant per pk) additionally
    # persist their cosets on the pk across proves, exactly as halo2's
    # ProvingKey stores extended-domain evaluations of fixed/permutation
    # polynomials [dep halo2-axiom plonk/keygen.rs, SURVEY.md §2.2
    # "Keygen (pk/vk)"]: at k=13 they are 342 of the ~580 coset NTTs in
    # the measured 32.7 s quot_terms stage (BENCH r4). First prove fills
    # the cache (lazily, through the same batched kernels); steady-state
    # proves skip those NTTs. Budgeted: k=15's 21 MB/col would need
    # ~7 GB, past the default budget, so it degrades to per-prove NTTs.
    static_key = (ext_n, nd)
    static_budget_mb = int(os.environ.get("ZKFHE_STATIC_COSET_MB", "2200"))
    static_cos = getattr(pk, "_static_cosets", None)
    if static_cos is None or static_cos.get("key") != static_key:
        static_cos = {"key": static_key, "map": {}}
        pk._static_cosets = static_cos
    # all coset storage is BY REFERENCE into whole launch stacks:
    # name -> ((L, COS_B, E) array, lane). Per-name slices (the round-4
    # form) cost one eager dispatch each on materialization AND one per
    # re-stack — ~10 ms apiece over the axon tunnel, which made host-side
    # stacking the bulk of the measured quot_terms stage. Launch stacks
    # mixing static and per-prove columns are retained whole by the
    # static map (bounded waste: a handful of stacks).
    static_map = static_cos["map"]
    static_cap = static_budget_mb * (1 << 20) // (L * ext_n * 4)
    cos_ref = dict(static_map)
    # residency budget: one entry is L*ext_n*4 bytes (5.2 MB at k=13);
    # past the cap, cosets are computed but not retained (k>=15 would
    # otherwise hold ~15 GB of cosets). prove_stream passes an explicit
    # per-proof budget so depth-N pipelining stays within HBM.
    if coset_cache_mb is None:
        coset_cache_mb = int(os.environ.get("ZKFHE_COSET_CACHE_MB", "6000"))
    cos_budget = coset_cache_mb * (1 << 20) // (L * ext_n * 4)

    def fq(nm):
        return f"fixed{fidx[nm]}"

    # under a mesh, coset NTTs run as the sharded four-step (SP axis in
    # the REAL pipeline — VERDICT round-2 weak #4); bit-identical output
    if mesh is None:
        def coset_batch(stack):
            return _j_coset(dom_ext, stack, cpow)
    else:
        from ..parallel import sharding as SH

        def coset_batch(stack):
            return SH.sharded_coset_ntt(dom_ext, stack, cpow, mesh,
                                        mesh_axis)

    # opt-in attribution of the quot_terms stage (syncs after every
    # launch, so NOT for benchmarking the total): ZKFHE_QUOT_PROFILE=1
    # prints coset-NTT vs term-kernel wall time at stage end
    _qprof = {"coset_s": 0.0, "coset_n": 0, "terms_s": 0.0, "terms_n": 0}
    if os.environ.get("ZKFHE_QUOT_PROFILE"):
        _real_coset_batch = coset_batch

        def coset_batch(stack):
            t0 = time.perf_counter()
            out = jax.block_until_ready(_real_coset_batch(stack))
            _qprof["coset_s"] += time.perf_counter() - t0
            _qprof["coset_n"] += 1
            return out

    def coset_fill(names):
        """Compute (and cache refs for) any missing cosets, COS_B names
        per NTT launch; returns a ref map covering `names` (the prove-
        budget overflow entries live only in the returned dict)."""
        extra = {}
        missing = [nm for nm in names
                   if nm not in cos_ref and nm not in extra]
        for s2 in range(0, len(missing), COS_B):
            grp2 = missing[s2:s2 + COS_B]
            stack = polys.gather(grp2)
            if len(grp2) < COS_B:
                stack = jnp.concatenate(
                    [stack, jnp.zeros((L, COS_B - len(grp2), n),
                                      jnp.uint32)], axis=1)
            ev = coset_batch(stack)
            for i2, nm in enumerate(grp2):
                if len(cos_ref) < cos_budget:
                    cos_ref[nm] = (ev, i2)
                else:
                    extra[nm] = (ev, i2)
                if (nm.startswith(("fixed", "sigma"))
                        and len(static_map) < static_cap):
                    static_map[nm] = (ev, i2)
        return extra

    def coset_stack(names, width=None, reshape=None):
        """(L, width, E) stacked cosets via grouped takes (one copy per
        backing-launch run, zero-padded to `width`)."""
        width = len(names) if width is None else width
        extra = coset_fill(names)
        runs = []
        for nm in names:
            a, i = cos_ref.get(nm) or extra[nm]
            if runs and runs[-1][0] is a:
                runs[-1][1].append(i)
            else:
                runs.append([a, [i]])
        pieces = []
        for a, cols in runs:
            if cols == list(range(a.shape[1])):
                pieces.append(a)
            else:
                pieces.append(jnp.take(a, jnp.asarray(cols, jnp.int32),
                                       axis=1))
        if width > len(names):
            pieces.append(jnp.zeros((L, width - len(names), ext_n),
                                    jnp.uint32))
        out = (pieces[0] if len(pieces) == 1
               else jnp.concatenate(pieces, axis=1))
        return out.reshape(reshape) if reshape is not None else out

    def coset_of(names):
        """Per-name (L, E) cosets — singleton/ragged callers only (each
        slice is one eager dispatch)."""
        extra = coset_fill(names)
        out = []
        for nm in names:
            a, i = cos_ref.get(nm) or extra[nm]
            out.append(a[:, i])
        return out

    def ev_stack(names, width):
        return coset_stack(names, width)

    qact_ev = coset_of([fq("q_act")])[0]

    def enc_ws(tis, width):
        """(L, width) device term weights: the next len(tis) entries of
        the pk's static term plan (asserted against tis — the plan and
        this loop share grouping logic and must not drift), zero-padded
        to the batch width."""
        o, m = _ws_cursor[0], len(tis)
        assert np.array_equal(dstate["term_plan_np"][o:o + m],
                              [ny - 1 - ti for ti in tis]), \
            "term plan out of sync with the quotient loop"
        _ws_cursor[0] = o + m
        w = ws_all[:, o:o + m]
        if m < width:
            w = jnp.pad(w, [(0, 0), (0, width - m)])
        return w

    # ---- gate + challenge terms, in fixed-width batches -------------------
    # Under a mesh, batch widths round up to a multiple of the device
    # count so sharded_term_batch can split the term axis evenly; padding
    # lanes carry weight 0 (and zero stacks), contributing nothing.
    GATE_BATCH = -(-8 // nd) * nd
    PERMJ = -(-4 // nd) * nd
    if mesh is not None:
        from ..parallel import sharding as SH

    def batched_acc(acc, jit_fn, partial_fn, static_args, ws, stacks,
                    consts):
        """One term-batch accumulation: single-device jitted kernel, or
        term-axis-sharded partial + combine when a mesh is given."""
        if mesh is None:
            if os.environ.get("ZKFHE_QUOT_PROFILE"):
                t0 = time.perf_counter()
                out = jax.block_until_ready(
                    jit_fn(*static_args, acc, ws, *stacks, *consts))
                _qprof["terms_s"] += time.perf_counter() - t0
                _qprof["terms_n"] += 1
                return out
            return jit_fn(*static_args, acc, ws, *stacks, *consts)
        part = SH.sharded_term_batch(partial_fn, static_args, ws, stacks,
                                     consts, mesh, mesh_axis)
        # pull the replicated partial onto ONE device: otherwise acc (and
        # everything derived from it — quotient coeffs, evals) carries
        # mesh-axis type metadata, retracing every downstream single-
        # device kernel and re-running it replicated on all mesh devices
        part = jax.device_put(part, mesh.devices.flat[0])
        return _j_acc_add(acc, part)

    by_kind = {}
    for ti, (kind, arg) in enumerate(terms):
        by_kind.setdefault(kind, []).append((ti, arg))

    # prefill the coset cache with EVERY poly the term loops will touch:
    # per-term-batch fills ran half-empty NTT launches (8 missing names
    # against COS_B=16 lanes); one bulk fill packs them full. Capped to
    # the residency budget — overflow names fall back to per-batch fills
    # (k>=15 keeps a partial cache instead of thrashing whole launches).
    pre = []
    for _, arg2 in by_kind.get("gate", []):
        pre += [f"adv{arg2}", fq(f"sel_{arg2}")]
    for _, arg2 in by_kind.get("challenge", []):
        pre += [f"adv{arg2}", fq(f"qgamma_{arg2}")]
    for _, g2 in by_kind.get("lookup_h", []):
        pre.append(f"lookup_h{g2}")
        pre += [f"adv{lk_base + i2}" for i2 in
                range(g2 * LOOKUP_GROUP, min((g2 + 1) * LOOKUP_GROUP, nlk))]
    for _, j2 in by_kind.get("perm_chunk", []):
        pre.append(f"perm_z{j2}")
        for i2 in range(j2 * PERM_CHUNK, min((j2 + 1) * PERM_CHUNK, P)):
            pre.append(f"adv{i2}" if i2 < asm.num_advice else
                       (fq("const") if i2 == asm.num_advice else "instance"))
            pre.append(f"sigma{i2}")
    if nlk:
        pre += ["lookup_g", "lookup_m", "lookup_phi", fq("table"),
                fq("q_first"), fq("q_last")]
    pre = [nm for nm in dict.fromkeys(pre) if nm not in cos_ref]
    room = max(0, cos_budget - len(cos_ref))
    coset_fill(pre[:room])

    for s in range(0, len(by_kind.get("gate", [])), GATE_BATCH):
        grp = by_kind["gate"][s:s + GATE_BATCH]
        a_ev = ev_stack([f"adv{arg}" for _, arg in grp], GATE_BATCH)
        sel_ev = ev_stack([fq(f"sel_{arg}") for _, arg in grp], GATE_BATCH)
        acc = batched_acc(
            acc, _j_gate_terms_batch, _gate_terms_partial, (),
            enc_ws([ti for ti, _ in grp], GATE_BATCH),
            [a_ev, sel_ev], [])

    for s in range(0, len(by_kind.get("challenge", [])), GATE_BATCH):
        grp = by_kind["challenge"][s:s + GATE_BATCH]
        a_ev = ev_stack([f"adv{arg}" for _, arg in grp], GATE_BATCH)
        qg_ev = ev_stack([fq(f"qgamma_{arg}") for _, arg in grp],
                         GATE_BATCH)
        acc = batched_acc(
            acc, _j_chal_terms_batch, _chal_terms_partial, (),
            enc_ws([ti for ti, _ in grp], GATE_BATCH),
            [a_ev, qg_ev], [gamma_m])

    # ---- logUp helper terms: all FULL groups in one dispatch --------------
    lk_full, lk_ragged = [], []
    for ti, g in by_kind.get("lookup_h", []):
        cols = list(range(g * LOOKUP_GROUP, min((g + 1) * LOOKUP_GROUP, nlk)))
        (lk_full if len(cols) == LOOKUP_GROUP else lk_ragged).append(
            (ti, g, cols))
    if lk_full:
        ngpad = -(-len(lk_full) // nd) * nd - len(lk_full)
        h_ev = ev_stack([f"lookup_h{g}" for _, g, _ in lk_full],
                        len(lk_full) + ngpad)
        l_ev = coset_stack(
            [f"adv{lk_base + i}" for _, _, cols in lk_full for i in cols],
            width=(len(lk_full) + ngpad) * LOOKUP_GROUP,
            reshape=(L, len(lk_full) + ngpad, LOOKUP_GROUP, ext_n))
        acc = batched_acc(
            acc, _j_lookup_h_terms_batch, _lookup_h_terms_partial, (),
            enc_ws([ti for ti, _, _ in lk_full], len(lk_full) + ngpad),
            [h_ev, l_ev], [qact_ev, beta_lm])
    for ti, g, cols in lk_ragged:
        lstack = polys.gather([f"adv{lk_base + i}" for i in cols])
        acc = _j_lookup_h_term(dom_ext, acc, y_weight(ti),
                               polys[f"lookup_h{g}"], lstack, fco("q_act"),
                               cpow, beta_lm)

    # ---- permutation chunk terms: FULL chunks in batches of PERMJ ---------
    def perm_col_name(i):
        if i < asm.num_advice:
            return f"adv{i}"
        if i == asm.num_advice:
            return fq("const")
        return "instance"

    pc_full = [(ti, j) for ti, j in by_kind.get("perm_chunk", [])
               if min((j + 1) * PERM_CHUNK, P) - j * PERM_CHUNK == PERM_CHUNK]
    pc_ragged = [(ti, j) for ti, j in by_kind.get("perm_chunk", [])
                 if (ti, j) not in pc_full]
    for s in range(0, len(pc_full), PERMJ):
        grp = pc_full[s:s + PERMJ]
        npad = PERMJ - len(grp)

        def chunk_ev(name_fn):
            return coset_stack(
                [name_fn(i) for _, j in grp
                 for i in range(j * PERM_CHUNK, (j + 1) * PERM_CHUNK)],
                width=(len(grp) + npad) * PERM_CHUNK,
                reshape=(L, len(grp) + npad, PERM_CHUNK, ext_n))

        z_ev = ev_stack([f"perm_z{j}" for _, j in grp], PERMJ)
        v_ev = chunk_ev(perm_col_name)
        sig_ev = chunk_ev(lambda i: f"sigma{i}")
        dp_rows = [dpow[:, j * PERM_CHUNK:(j + 1) * PERM_CHUNK]
                   for _, j in grp]
        dp_rows += [jnp.zeros((L, PERM_CHUNK), dtype=jnp.uint32)] * npad
        dpows = jnp.stack(dp_rows, axis=1)
        acc = batched_acc(
            acc, _j_perm_chunks_batch, _perm_chunks_partial, (),
            enc_ws([ti for ti, _ in grp], PERMJ),
            [z_ev, v_ev, sig_ev, dpows],
            [qact_ev, xcoset, beta_pm, gamma_pm])
    for ti, j in pc_ragged:
        idxs = list(range(j * PERM_CHUNK, min((j + 1) * PERM_CHUNK, P)))
        acc = _j_perm_chunk_term(
            dom_ext, acc, y_weight(ti), polys[f"perm_z{j}"],
            polys.gather([perm_col_name(i) for i in idxs]),
            polys.gather([f"sigma{i}" for i in idxs]),
            fco("q_act"), cpow, xcoset, dpow[:, idxs[0]:idxs[-1] + 1],
            beta_pm, gamma_pm)

    # ---- chain terms in batches -------------------------------------------
    qfirst_ev = coset_of([fq("q_first")])[0]
    chains = by_kind.get("perm_chain", [])
    for s in range(0, len(chains), GATE_BATCH):
        grp = chains[s:s + GATE_BATCH]
        zj_ev = ev_stack([f"perm_z{j}" for _, j in grp], GATE_BATCH)
        zp_ev = ev_stack([f"perm_z{j - 1}" for _, j in grp], GATE_BATCH)
        acc = batched_acc(
            acc, _j_perm_chains_batch, _perm_chains_partial, (u,),
            enc_ws([ti for ti, _ in grp], GATE_BATCH),
            [zj_ev, zp_ev], [qfirst_ev])

    # ---- singleton terms ---------------------------------------------------
    for ti, (kind, arg) in enumerate(terms):
        w = y_weight(ti)
        if kind == "lookup_table":
            acc = _j_lookup_table_term(
                dom_ext, acc, w, polys["lookup_g"], fco("table"),
                polys["lookup_m"], fco("q_act"), cpow, beta_lm)
        elif kind == "lookup_acc":
            acc = _j_lookup_acc_term(
                dom_ext, acc, w, polys["lookup_phi"], h_coeffs,
                polys["lookup_g"], fco("q_act"), cpow)
        elif kind == "lookup_first":
            acc = _j_sel_poly_term(dom_ext, acc, w, polys["lookup_phi"],
                                   fco("q_first"), cpow)
        elif kind == "lookup_last":
            acc = _j_sel_poly_term(dom_ext, acc, w, polys["lookup_phi"],
                                   fco("q_last"), cpow)
        elif kind == "perm_first":
            acc = _j_sel_poly_minus_one_term(
                dom_ext, acc, w, polys["perm_z0"], fco("q_first"), cpow)
        elif kind == "perm_last":
            acc = _j_sel_poly_minus_one_term(
                dom_ext, acc, w, polys[f"perm_z{nz - 1}"], fco("q_last"),
                cpow)
        elif kind in ("gate", "challenge", "lookup_h", "perm_chunk",
                      "perm_chain"):
            pass  # handled by the batched kernels above
        else:
            raise AssertionError(kind)

    cos_ref.clear()  # free ~5 MB x #polys of coset residency
    yield  # quotient term batches dispatched
    jax.block_until_ready(acc)
    if os.environ.get("ZKFHE_QUOT_PROFILE"):
        print(f"[quot profile] coset NTT {_qprof['coset_s']:.2f}s "
              f"({_qprof['coset_n']} launches), term kernels "
              f"{_qprof['terms_s']:.2f}s ({_qprof['terms_n']} launches), "
              f"static cosets reused: {len(static_map)}", flush=True)
    _timer.mark("quot_terms")
    zh_inv = dstate["zh_inv"]
    if mesh is None:
        h_coeffs_full = _j_quot_finish(dom_ext, acc, zh_inv, cpow_inv)
    else:
        # same math with the iNTT mesh-sharded (four-step)
        h_ev = _j_elt_mul(acc, zh_inv)
        h_c = SH.sharded_intt(dom_ext, h_ev[:, None], mesh, mesh_axis)
        h_coeffs_full = _j_elt_mul(h_c[:, 0], cpow_inv)
    if debug:
        _dbg_tail = h_coeffs_full[:, PROTO.NUM_QUOT_CHUNKS * n:]
    hq = h_coeffs_full[:, : PROTO.NUM_QUOT_CHUNKS * n].reshape(
        L, PROTO.NUM_QUOT_CHUNKS, n)
    del h_coeffs_full
    polys.add_stack([f"quot{i}" for i in range(PROTO.NUM_QUOT_CHUNKS)], hq)
    fin_q = commit_coeffs_async(hq)
    yield  # quotient commit dispatched
    for pt in fin_q():
        tr.write_point(pt)

    _log("quotient committed")
    _timer.mark("quotient")
    x = tr.challenge()

    # ---- evaluations --------------------------------------------------------
    sched = PROTO.opening_schedule(shape)
    omega = dom.omega
    points = {
        0: x % FR.p,
        1: x * omega % FR.p,
        2: x * pow(omega, 2, FR.p) % FR.p,
        3: x * pow(omega, 3, FR.p) % FR.p,
        PROTO.ROT_LAST: x * pow(omega, u, FR.p) % FR.p,
    }
    # ONE upload for all opening points (and their inverses, used by the
    # SHPLONK exact divisions below) instead of a transfer per rotation
    rot_keys = list(points)
    pts_host = [points[r] for r in rot_keys]
    inv_host = [pow(z, FR.p - 2, FR.p) for z in pts_host]
    pts_enc = jnp.asarray(F.encode(FR, pts_host + inv_host, mont=True))
    enc_pt = {r: pts_enc[:, i] for i, r in enumerate(rot_keys)}
    enc_pt_inv = {r: pts_enc[:, len(rot_keys) + i]
                  for i, r in enumerate(rot_keys)}
    assert rot_keys == PROTO.ROTATIONS  # rot_pows columns line up

    # ALL evaluations as one MXU matmul: (names x n) @ (n x rotations)
    # over Fr (ops/mxu_field.py). The full name x rotation product is
    # cheaper than scheduling per-pair work (0.1 ms on v5e for 300x8192x8
    # vs ~20 ms for the old per-rotation chunked mont_mul+tree_sum, which
    # was 6.4 s in BENCH_r04 before the Pallas substrate); the schedule
    # just gathers the (name, rot) entries it needs.
    names_all = sorted({name for name, _ in sched})
    name_pos = {nm: i for i, nm in enumerate(names_all)}
    # (x*w^r)^j = x^j * w^(rj): one power series, pointwise-scaled by the
    # pk's cached per-rotation twiddle series
    xpow_x = F.power_series(FR, enc_pt[0], n)
    xmat = F.mont_mul(FR, jnp.broadcast_to(xpow_x[:, :, None],
                                           dstate["rot_pows"].shape),
                      dstate["rot_pows"])  # (L, n, R)
    evals = {}
    EV_CHUNK = 128  # bounds the (L, K, n) stack + plane peak memory
    pending_evs = []  # dispatch every chunk, decode after the yield
    for s in range(0, len(names_all), EV_CHUNK):
        chunk = names_all[s:s + EV_CHUNK]
        stack = polys.gather(chunk)
        pending_evs.append(MX.mat_mul_mont(FR, stack, xmat))
        del stack
    yield  # evaluation batches dispatched
    # ONE device->host transfer for every evaluation in the schedule
    all_vals = F.decode(
        FR, jnp.concatenate(pending_evs, axis=1).reshape(L, -1), mont=True)
    nrot = len(rot_keys)
    rot_pos = {r: j for j, r in enumerate(rot_keys)}
    for name, rot in sched:
        evals[(name, rot)] = all_vals[name_pos[name] * nrot + rot_pos[rot]]
    del pending_evs
    for name, rot in sched:
        tr.write_scalar(evals[(name, rot)])

    if debug:
        from . import verifier as VF_mod
        print("DEBUG h tail nonzero limbs:", int(jnp.sum(_dbg_tail != 0)),
              "/", int(np.prod(_dbg_tail.shape)))
        inst_x = VF_mod.instance_eval(inst_ints, x, k)
        acc_x = VF_mod.fold_constraints(
            shape, evals, gamma, beta_l, beta_p, gamma_p, y, x, inst_x,
            delta)
        zh_x = (pow(x, n, FR.p) - 1) % FR.p
        h_x = 0
        for i in range(PROTO.NUM_QUOT_CHUNKS):
            h_x = (h_x + pow(x, n * i, FR.p) * evals[(f"quot{i}", 0)]) % FR.p
        print("DEBUG identity F(x) == Z_H(x)h(x):", acc_x == zh_x * h_x % FR.p)

    _log("evaluations written")
    _timer.mark("evals")

    # ---- SHPLONK multiopen (BDFG20; halo2-axiom's scheme, SURVEY.md §2.2)
    # Polys are grouped by their full rotation SET (protocol.rotation_sets):
    # v folds within a set, y2 folds across sets. The proof carries just
    # TWO opening commitments (H, W) instead of GWC's one per point, and
    # the verifier MSM touches each commitment once instead of once per
    # opening (VERDICT round-2 missing #2).
    v = tr.challenge()
    y2 = tr.challenge()

    sets = PROTO.rotation_sets(shape)
    f_polys = []  # folded poly per set, device (L, n)
    set_pts = []  # opening points per set
    set_evals = []  # folded evals per set (host ints, aligned with pts)
    h_list = []  # (f_i - r_i) / Z_{S_i}
    zero_ce = jnp.zeros((L,), dtype=jnp.uint32)
    CB = 64  # bound the stacked-combination peak memory
    # per-set host math (folded evals + interpolation coefficients) runs
    # up front so ALL its scalars ride ONE upload; v-powers fold on
    # device from a single v scalar
    v_m = _enc_mont_scalar(v)
    vpows_dev = F.power_series(
        FR, v_m, max(len(names) for _, names in sets))
    rc_all, set_rc_span = [], []
    for rots, names in sets:
        vpows_host = [pow(v, j, FR.p) for j in range(len(names))]
        pts = [points[r] for r in rots]
        fe = [sum(vw * evals[(nm, r)] for vw, nm in zip(vpows_host, names))
              % FR.p for r in rots]
        rc = PROTO.lagrange_coeffs(pts, fe, FR.p)
        set_rc_span.append((len(rc_all), len(rc)))
        rc_all += rc
        set_pts.append(pts)
        set_evals.append(fe)
    rc_enc = jnp.asarray(F.encode(FR, rc_all, mont=True))
    for si, (rots, names) in enumerate(sets):
        comb = None
        for s in range(0, len(names), CB):
            chunk = names[s:s + CB]
            stack = polys.gather(chunk)
            part = _j_combine(stack, vpows_dev[:, s:s + len(chunk)])
            del stack
            comb = part if comb is None else _j_acc_add(comb, part)
        off, nrc = set_rc_span[si]
        numer = _j_sub_low(nrc, comb, rc_enc[:, off:off + nrc])
        # exact division by Z_{S_i}(X) = prod (X - pt): the numerator
        # vanishes on S_i, so each linear step divides exactly (ce = 0)
        for r in rots:
            numer = _j_divide_linear(numer, zero_ce, enc_pt[r],
                                     enc_pt_inv[r])
        f_polys.append(comb)
        h_list.append(numer)

    ypows_host = [pow(y2, i, FR.p) for i in range(len(sets))]
    h_poly = _j_combine(
        jnp.stack(h_list, axis=1),
        jnp.asarray(F.encode(FR, ypows_host, mont=True)))
    fin_h = commit_coeffs_async(h_poly[:, None])
    yield  # SHPLONK H commit dispatched
    for pt in fin_h():
        tr.write_point(pt)
    u_pt = tr.challenge()

    # L(X) = sum_i y2^i Z_{T \ S_i}(u) (f_i(X) - r_i(u)) - Z_T(u) h(X);
    # L(u) = 0, so W = [L / (X - u)] closes the argument
    t_vals = []
    for r in PROTO.ROTATIONS:
        if any(r in rots for rots, _ in sets) and points[r] not in t_vals:
            t_vals.append(points[r])
    z_t = PROTO.vanishing_eval(t_vals, u_pt, FR.p)
    scal, c0 = [], 0
    for i, (pts, fe) in enumerate(zip(set_pts, set_evals)):
        z_rest = PROTO.vanishing_eval(
            [t for t in t_vals if t not in pts], u_pt, FR.p)
        w = ypows_host[i] * z_rest % FR.p
        scal.append(w)
        c0 = (c0 + w * PROTO.lagrange_eval(pts, fe, u_pt, FR.p)) % FR.p
    scal.append((-z_t) % FR.p)
    # one upload for the set weights + the division scalars
    tail_enc = jnp.asarray(F.encode(
        FR, scal + [c0, u_pt, pow(u_pt, FR.p - 2, FR.p)], mont=True))
    l_comb = _j_combine(
        jnp.stack(f_polys + [h_poly], axis=1), tail_enc[:, :len(scal)])
    w_poly = _j_divide_linear(
        l_comb, tail_enc[:, len(scal)], tail_enc[:, len(scal) + 1],
        tail_enc[:, len(scal) + 2])
    fin_w = commit_coeffs_async(w_poly[:, None])
    yield  # SHPLONK W commit dispatched
    for pt in fin_w():
        tr.write_point(pt)

    _log("multiopen witnesses committed; proof done")
    _timer.mark("multiopen")
    LAST_STAGES.clear()
    LAST_STAGES.update(_timer.summary())
    return tr.proof_bytes()


def _debug_terms_on_domain(pk, dom, adv, inst_vals, gamma, beta_l, beta_p,
                           gamma_p, z_lagrange, env):
    """Evaluate every constraint term on H from Lagrange values and report
    rows with nonzero residuals (localizes quotient-divisibility bugs)."""
    asm = pk.asm
    shape = pk.vk.shape
    n, u, P = asm.n, asm.u, asm.num_perm_cols
    nlk = asm.num_lk_cols
    lk_base = asm.num_advice - nlk
    fixed_lag = N.ntt(dom, pk.fixed_coeffs)
    fixed_names = PROTO.fixed_poly_names(shape)
    fidx = {nm: i for i, nm in enumerate(fixed_names)}

    def fl(nm):
        return fixed_lag[:, fidx[nm]]

    def roll1(v, r=1):
        return jnp.roll(v, -r, axis=-1)

    gamma_m = _enc_mont_scalar(gamma)
    beta_lm = _enc_mont_scalar(beta_l)
    beta_pm = _enc_mont_scalar(beta_p)
    gamma_pm = _enc_mont_scalar(gamma_p)
    one_m = _enc_mont_scalar(1)
    dpow = env["dpow"]
    wpow = env["wpow"]

    def report(name, res):
        bad = np.asarray(jnp.any(res != 0, axis=0))
        rows = np.nonzero(bad)[0]
        if len(rows):
            print(f"DEBUG term {name}: {len(rows)} bad rows, first {rows[:6]}")

    for kind, arg in PROTO.build_terms(shape):
        if kind == "gate":
            a = adv[:, arg]
            t = F.add(FR, a, F.mont_mul(FR, roll1(a, 1), roll1(a, 2)))
            t = F.sub(FR, t, roll1(a, 3))
            report(f"gate{arg}", F.mont_mul(FR, fl(f"sel_{arg}"), t))
        elif kind == "challenge":
            a = adv[:, arg]
            gb = jnp.broadcast_to(gamma_m[:, None], a.shape)
            report(f"chal{arg}", F.mont_mul(
                FR, fl(f"qgamma_{arg}"), F.sub(FR, a, gb)))
        elif kind == "lookup_h":
            g = arg
            cols = range(g * LOOKUP_GROUP, min((g + 1) * LOOKUP_GROUP, nlk))
            facs = [F.add(FR, adv[:, lk_base + i],
                          jnp.broadcast_to(beta_lm[:, None], (L, n)))
                    for i in cols]
            h = env["h_all"][:, g]
            prod = facs[0]
            for f2 in facs[1:]:
                prod = F.mont_mul(FR, prod, f2)
            lhs = F.mont_mul(FR, h, prod)
            rhs = jnp.zeros_like(lhs)
            for j in range(len(facs)):
                pr = None
                for kk in range(len(facs)):
                    if kk == j:
                        continue
                    pr = facs[kk] if pr is None else F.mont_mul(FR, pr, facs[kk])
                if pr is None:
                    pr = jnp.broadcast_to(one_m[:, None], lhs.shape)
                rhs = F.add(FR, rhs, pr)
            report(f"lookup_h{g}", F.mont_mul(
                FR, fl("q_act"), F.sub(FR, lhs, rhs)))
        elif kind == "lookup_table":
            t0 = F.sub(FR, F.mont_mul(
                FR, env["g_vals"],
                F.add(FR, env["table_vals"],
                      jnp.broadcast_to(beta_lm[:, None], (L, n)))),
                env["m_vals"])
            report("lookup_table", F.mont_mul(FR, fl("q_act"), t0))
        elif kind == "lookup_acc":
            phi = env["phi"]
            hsum = jnp.zeros((L, n), dtype=jnp.uint32)
            for g in range(PROTO.num_lookup_groups(shape)):
                hsum = F.add(FR, hsum, env["h_all"][:, g])
            t0 = F.add(FR, F.sub(FR, F.sub(FR, roll1(phi), phi), hsum),
                       env["g_vals"])
            report("lookup_acc", F.mont_mul(FR, fl("q_act"), t0))
        elif kind == "lookup_first":
            report("lookup_first", F.mont_mul(FR, fl("q_first"), env["phi"]))
        elif kind == "lookup_last":
            report("lookup_last", F.mont_mul(FR, fl("q_last"), env["phi"]))
        elif kind == "perm_first":
            z0 = z_lagrange[0]
            onem = jnp.broadcast_to(one_m[:, None], z0.shape)
            report("perm_first", F.mont_mul(
                FR, fl("q_first"), F.sub(FR, z0, onem)))
        elif kind == "perm_chunk":
            j = arg
            z = z_lagrange[j]
            lhs, rhs = roll1(z), z
            fvc = N.ntt(dom, pk.fixed_coeffs[:, 0])
            for i in range(j * PERM_CHUNK, min((j + 1) * PERM_CHUNK, P)):
                if i < asm.num_advice:
                    v = adv[:, i]
                elif i == asm.num_advice:
                    v = fvc
                else:
                    v = inst_vals
                sig = pk.sigma_vals[:, i]
                bb2 = jnp.broadcast_to(beta_pm[:, None], v.shape)
                gg2 = jnp.broadcast_to(gamma_pm[:, None], v.shape)
                lhs = F.mont_mul(FR, lhs, F.add(
                    FR, v, F.add(FR, F.mont_mul(FR, bb2, sig), gg2)))
                idv = F.mont_mul(
                    FR, jnp.broadcast_to(dpow[:, i][:, None], (L, n)), wpow)
                rhs = F.mont_mul(FR, rhs, F.add(
                    FR, v, F.add(FR, F.mont_mul(FR, bb2, idv), gg2)))
            report(f"perm_chunk{j}", F.mont_mul(
                FR, fl("q_act"), F.sub(FR, lhs, rhs)))
        elif kind == "perm_chain":
            j = arg
            t0 = F.sub(FR, z_lagrange[j], roll1(z_lagrange[j - 1], u))
            report(f"perm_chain{j}", F.mont_mul(FR, fl("q_first"), t0))
        elif kind == "perm_last":
            nz = PROTO.num_perm_chunks(shape)
            onem = jnp.broadcast_to(one_m[:, None], (L, n))
            report("perm_last", F.mont_mul(
                FR, fl("q_last"), F.sub(FR, z_lagrange[nz - 1], onem)))
