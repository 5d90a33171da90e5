"""Batched proving (BASELINE configs item 4: many independent BFV proofs
vmapped across one host/chip).

`prove_batch` runs the WHOLE proving pipeline with a leading proof axis:
witness generation, advice scatter, lookup/permutation helpers, the
quotient accumulation, evaluations and the SHPLONK multiopen are all
`jax.vmap`s of the prover's single-proof stage kernels
(backend/prover.py), and every commitment MSM folds the proof axis into
the column axis so B proofs' columns ride the SAME width-tiered table-MSM
launches (B x fewer dispatches and device->host transfers than a serial
loop — dispatch latency and transfer round trips, not FLOPs, are what the
serial loop wastes on the remote TPU).

Fiat-Shamir stays per proof (independent statements, independent
transcripts, per-proof challenges enter the kernels through the vmapped
axis). With per-proof rng seeds the proof BYTES are identical to serial
`prove(..., rng_seed=seed_i)` — tests/test_backend.py asserts this.

The mesh (multi-chip) path composes at the witgen level only
(parallel/sharding.batched_witgen shards the proof axis); the in-prove
mesh sharding of prover.prove is for single proofs.
"""
from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import field as F
from ..ops import ntt as N
from ..ops.field import FR
from ..trace.builder import CTX_LK, CTX_P0, LOOKUP_BITS, NUM_CTX
from ..trace.compile import make_witgen, run_circuit
from . import protocol as PROTO
from . import prover as PV
from .assembly import EXT_FACTOR, LOOKUP_GROUP, PERM_CHUNK
from .keygen import ProvingKey, make_committer, vk_digest
from .srs import SRS
from .transcript import Transcript

L = F.NLIMBS


# ---------------------------------------------------------------------------
# vmapped kernel cache: one compiled executable per (kernel, axes) pair,
# shared by every batch of the same shape
# ---------------------------------------------------------------------------

_VM_CACHE: dict = {}


def _vm(key, fn, in_axes):
    if key not in _VM_CACHE:
        _VM_CACHE[key] = jax.jit(jax.vmap(fn, in_axes=in_axes))
    return _VM_CACHE[key]


_batched_witgen_cache: dict = {}


def _batched_witgen(circuit_fn):
    if circuit_fn not in _batched_witgen_cache:
        def single(inputs, gamma):
            _, values, instance = run_circuit(circuit_fn, inputs, gamma)
            return values, instance

        _batched_witgen_cache[circuit_fn] = jax.jit(
            jax.vmap(single, in_axes=(0, 0)))
    return _batched_witgen_cache[circuit_fn]


_batched_witgen_p0_cache: dict = {}


def _batched_witgen_p0(circuit_fn):
    """Pruned phase-0 pass (mirrors trace/compile.make_witgen_p0): only
    the CTX_P0 trace + instance leave the executable, so XLA drops every
    gamma-dependent and lookup-decomposition computation from pass 1."""
    if circuit_fn not in _batched_witgen_p0_cache:
        def single(inputs):
            gamma = jnp.zeros((L,), dtype=jnp.uint32)
            _, values, instance = run_circuit(circuit_fn, inputs, gamma)
            return values[CTX_P0], instance

        _batched_witgen_p0_cache[circuit_fn] = jax.jit(
            jax.vmap(single, in_axes=(0,)))
    return _batched_witgen_p0_cache[circuit_fn]


@functools.partial(jax.jit, static_argnums=(0, 1))
def _j_lookup_counts(nlk_u, n, lk_row):
    """(size,) byte values -> (L, n) standard-form multiplicity column
    (mirrors the serial bincount in prover.prove)."""
    counts = jnp.bincount(lk_row.astype(jnp.int32), length=1 << LOOKUP_BITS)
    counts = counts.at[0].add(nlk_u - lk_row.shape[0])
    m_std = jnp.zeros((L, n), dtype=jnp.uint32)
    m_std = m_std.at[0, : 1 << LOOKUP_BITS].set(counts.astype(jnp.uint32))
    m_std, _ = F._carry_chain(m_std)
    return m_std


@jax.jit
def _j_perm_vals(adv_b, inst_b, fixed_const):
    """Per-proof permutation-column value matrix: advice || const-fixed ||
    instance (the batched form of the serial concatenate in prove())."""
    B, L_, _, n = adv_b.shape
    fc = jnp.broadcast_to(fixed_const[None, :, None], (B, L_, 1, n))
    return jnp.concatenate([adv_b, fc, inst_b[:, :, None]], axis=2)


@jax.jit
def _j_fold_proof_axis(x):
    """(B, L, K, n) -> (L, B*K, n), proof-major column order."""
    B, L_, K, n = x.shape
    return jnp.moveaxis(x, 0, 1).reshape(L_, B * K, n)


class _BatchPolyStore:
    """name -> per-proof (B, L, n) arrays; shared (circuit-constant)
    polys are stored once as (L, n) and broadcast on read."""

    def __init__(self, batch: int):
        self.B = batch
        self._direct = {}
        self._stacks = {}  # name -> (arr, i, shared)

    def set_per_proof(self, key, value):  # (B, L, n)
        self._direct[key] = (value, False)

    def add_stack(self, names, arr, shared=False):
        # arr: (B, L, K, n) or shared (L, K, n)
        for i, nm in enumerate(names):
            self._stacks[nm] = (arr, i, shared)

    def get(self, key):  # -> (B, L, n)
        if key in self._direct:
            v, shared = self._direct[key]
        else:
            arr, i, shared = self._stacks[key]
            v = arr[:, i] if shared else arr[:, :, i]
        if shared:
            v = jnp.broadcast_to(v[None], (self.B,) + v.shape)
        return v


def prove_batch(pk: ProvingKey, srs: SRS, circuit_fn, inputs_list,
                rng_seeds=None) -> list[bytes]:
    """Prove B independent instances against one proving key, batched on
    the proof axis end to end. Returns the per-proof proof bytes, byte-
    identical to serial prove() with the same rng_seeds."""
    B = len(inputs_list)
    assert B >= 1
    asm = pk.asm
    k, n, u = asm.k, asm.n, asm.u
    dom = N.Domain.new(k)
    ext_k = k + EXT_FACTOR.bit_length() - 1
    dom_ext = N.Domain.new(ext_k)
    ext_n = dom_ext.n
    delta = pk.vk.delta
    shape = pk.vk.shape

    # device-side blinding (prover._ProofRng): same per-proof draw order
    # as serial prove(), so proof bytes match for equal seeds
    rngds = [PV._ProofRng(None if rng_seeds is None else rng_seeds[i])
             for i in range(B)]
    dstate = PV._pk_device_state(pk, dom, dom_ext, 1)

    from ..utils.profiling import StageTimer
    _timer = StageTimer("prove_batch", stream=None)

    trs = [Transcript() for _ in range(B)]
    digest = vk_digest(pk.vk)
    for tr in trs:
        tr.common_bytes(digest)

    witgen_b = _batched_witgen(circuit_fn)
    batched_inputs = jax.tree.map(
        lambda *xs: jnp.stack(xs), *inputs_list)

    # ---- phase 0 (pruned: CTX_P0 + instance only) ---------------------------
    values0_p0, instances = _batched_witgen_p0(circuit_fn)(batched_inputs)
    inst_np = np.asarray(instances)  # ONE transfer for all proofs
    inst_ints = [F.decode(FR, inst_np[i]) for i in range(B)]
    for i, tr in enumerate(trs):
        for v in inst_ints[i]:
            tr.common_scalar(v)
    _timer.mark("witgen0")

    scatter_idx = dstate["scatter_idx"]
    blind = jnp.stack([rngds[i].draw(asm.num_advice, n - u)
                       for i in range(B)])

    p0 = asm.num_p0_cols
    vm_advice = _vm(("advice", dom, asm.num_advice, n, u),
                    functools.partial(PV._j_advice, dom, asm.num_advice,
                                      n, u),
                    (0, None, 0))
    adv_p0 = None
    if p0:
        vm_advice_p0 = _vm(("advice_p0", p0, n, u),
                           functools.partial(PV._j_advice_p0, p0, n, u),
                           (0, None, 0))
        adv_p0 = vm_advice_p0(values0_p0, scatter_idx[CTX_P0],
                              blind[:, :, :p0])

    committer = make_committer(srs, n, u)
    assert committer is not None, \
        "prove_batch needs the fixed-base table committer (ZKFHE_MSM=tab)"

    def commit_batch(evals_b, col_bits=None, split_tail=True):
        """(B, L, K, n) -> per-proof point lists via ONE folded commit."""
        K = evals_b.shape[2]
        if K == 0:
            return [[] for _ in range(B)]
        folded = _j_fold_proof_axis(evals_b)
        cb = None if col_bits is None else np.tile(np.asarray(col_bits), B)
        pts = committer.commit_values(folded, split_tail=split_tail,
                                      col_bits=cb)
        return [pts[b * K:(b + 1) * K] for b in range(B)]

    def commit_coeffs_batch(coeffs_b):
        K = coeffs_b.shape[2]
        folded = _j_fold_proof_axis(coeffs_b)
        pts = committer.commit_coeffs(folded, dom)
        return [pts[b * K:(b + 1) * K] for b in range(B)]

    if p0:
        for i, pts in enumerate(commit_batch(adv_p0, asm.col_bits[:p0])):
            for pt in pts:
                trs[i].write_point(pt)
    _timer.mark("phase0_commit")
    gammas = [tr.challenge() for tr in trs]
    gammas_m = jnp.moveaxis(
        jnp.asarray(F.encode(FR, gammas, mont=True)), 1, 0)
    gammas_std = jnp.moveaxis(jnp.asarray(F.encode(FR, gammas)), 1, 0)

    # ---- full witness with the real challenges -----------------------------
    values1, instances1 = witgen_b(batched_inputs, gammas_std)
    assert bool(jnp.array_equal(instances, instances1)), \
        "instance values depend on the challenge"
    assert bool(jnp.array_equal(values0_p0, values1[CTX_P0])), \
        "phase-0 advice values depend on the challenge"
    _timer.mark("witgen1")
    adv, adv_coeffs = vm_advice(values1, scatter_idx, blind)
    for i, pts in enumerate(commit_batch(adv[:, :, p0:],
                                         asm.col_bits[p0:])):
        for pt in pts:
            trs[i].write_point(pt)

    polys = _BatchPolyStore(B)
    polys.add_stack([f"adv{i}" for i in range(asm.num_advice)], adv_coeffs)
    polys.add_stack([f"fixed{i}" for i in range(pk.fixed_coeffs.shape[1])],
                    pk.fixed_coeffs, shared=True)
    polys.add_stack([f"sigma{i}" for i in range(pk.sigma_coeffs.shape[1])],
                    pk.sigma_coeffs, shared=True)

    vm_mont = _vm(("to_mont",), functools.partial(F.to_mont, FR), (0,))
    inst_vals = jnp.zeros((B, L, n), dtype=jnp.uint32)
    ilen = instances.shape[2]
    if ilen:
        inst_vals = inst_vals.at[:, :, :ilen].set(vm_mont(instances))
    vm_intt = _vm(("intt", dom), functools.partial(N.intt, dom), (0,))
    polys.set_per_proof("instance", vm_intt(inst_vals))

    # ---- lookup multiplicities ---------------------------------------------
    nlk = asm.num_lk_cols
    lk_base = asm.num_advice - nlk
    ngroups = PROTO.num_lookup_groups(shape)
    table_vals = dstate["table_vals"]

    if nlk:
        vm_counts = _vm(("lk_counts", nlk * u, n),
                        functools.partial(_j_lookup_counts, nlk * u, n),
                        (0,))
        m_std = vm_counts(values1[CTX_LK][:, 0])  # (B, L, n)
        m_vals = vm_mont(m_std)
        m_tail = jnp.stack([rngds[i].draw(1, n - u)[:, 0]
                            for i in range(B)])
        m_vals = jnp.concatenate([m_vals[:, :, :u], m_tail], axis=2)
        polys.set_per_proof("lookup_m", vm_intt(m_vals))
        mb = np.asarray([(nlk * u).bit_length()])
        for i, pts in enumerate(commit_batch(m_vals[:, :, None], mb)):
            for pt in pts:
                trs[i].write_point(pt)
    _timer.mark("phase1_commit")
    betas_l = [tr.challenge() for tr in trs]
    betas_lm = jnp.moveaxis(
        jnp.asarray(F.encode(FR, betas_l, mont=True)), 1, 0)

    h_coeffs = None
    if nlk:
        vm_lookup_aux = _vm(("lookup_aux", dom, u),
                            functools.partial(PV._j_lookup_aux, dom, u),
                            (0, 0, None, 0, 0, 0, 0))
        rand_h = jnp.stack([rngds[i].draw(ngroups, n - u)
                            for i in range(B)])
        rand_g = jnp.stack([rngds[i].draw(1, n - u)[:, 0]
                            for i in range(B)])
        rand_phi = jnp.stack([rngds[i].draw(1, n - u - 1)[:, 0]
                              for i in range(B)])
        h_all, g_vals, phi_vals, h_coeffs, g_coeffs, phi_coeffs = \
            vm_lookup_aux(adv[:, :, lk_base:, :], m_vals, table_vals,
                          betas_lm, rand_h, rand_g, rand_phi)
        polys.add_stack([f"lookup_h{g}" for g in range(ngroups)], h_coeffs)
        polys.set_per_proof("lookup_g", g_coeffs)
        polys.set_per_proof("lookup_phi", phi_coeffs)
        aux_vals = jnp.concatenate(
            [h_all, g_vals[:, :, None], phi_vals[:, :, None]], axis=2)
        for i, pts in enumerate(commit_batch(aux_vals, split_tail=False)):
            for pt in pts:
                trs[i].write_point(pt)
    _timer.mark("lookup_commit")
    betas_p = [tr.challenge() for tr in trs]
    gammas_p = [tr.challenge() for tr in trs]
    bg_enc = jnp.asarray(F.encode(FR, betas_p + gammas_p, mont=True))
    betas_pm = jnp.moveaxis(bg_enc[:, :B], 1, 0)
    gammas_pm = jnp.moveaxis(bg_enc[:, B:], 1, 0)

    # ---- permutation grand products ----------------------------------------
    P = asm.num_perm_cols
    nz = PROTO.num_perm_chunks(shape)
    perm_vals = _j_perm_vals(adv, inst_vals, dstate["fixed_vals_const"])

    dpow = dstate["dpow"]
    wpow = dstate["wpow"]

    rand_z = jnp.stack([rngds[i].draw(nz, n - u - 1) for i in range(B)])
    vm_perm_z = _vm(("perm_z", dom, u),
                    functools.partial(PV._j_perm_z, dom, u),
                    (0, None, None, None, 0, 0, 0))
    z_lag, z_coeffs = vm_perm_z(perm_vals, pk.sigma_vals, dpow, wpow,
                                betas_pm, gammas_pm, rand_z)
    jax.block_until_ready(z_lag)
    _timer.mark("perm_z")
    del perm_vals
    polys.add_stack([f"perm_z{j}" for j in range(nz)], z_coeffs)
    rand_coeffs = jnp.stack([rngds[i].draw(1, n) for i in range(B)])
    polys.set_per_proof("random", rand_coeffs[:, :, 0])
    # z products + random poly through ONE folded commit (one transfer);
    # per-proof point order (z..., random) matches the transcript
    vm_ntt = _vm(("ntt", dom), functools.partial(N.ntt, dom), (0,))
    zr_vals = jnp.concatenate([z_lag, vm_ntt(rand_coeffs)], axis=2)
    for i, pts in enumerate(commit_batch(zr_vals, split_tail=False)):
        for pt in pts:
            trs[i].write_point(pt)
    _timer.mark("perm_commit")
    ys = [tr.challenge() for tr in trs]

    # ---- quotient on the extended coset ------------------------------------
    cpow = dstate["cpow"]
    cpow_inv = dstate["cpow_inv"]
    xcoset = dstate["xcoset"]

    terms = PROTO.build_terms(shape)
    ny = len(terms)
    # per-proof term weights on device: ONE upload of the B challenges,
    # vmapped power scan, one static take against the pk's term plan
    ys_enc = jnp.asarray(F.encode(FR, ys, mont=True))  # (L, B)
    vm_ypows = _vm(("ypows", ny),
                   functools.partial(lambda c, b: F.power_series(FR, b, c),
                                     ny), (0,))
    ypows_b = vm_ypows(jnp.moveaxis(ys_enc, 1, 0))  # (B, L, ny)
    ws_all_b = jnp.take(ypows_b, dstate["term_plan"], axis=2)
    _ws_cursor = [0]

    def yb_weight(ti):
        """(B, L) device weight y_i^(ny-1-ti)."""
        return ypows_b[:, :, ny - 1 - ti]

    fixed_names = PROTO.fixed_poly_names(shape)
    fidx = {nm: i for i, nm in enumerate(fixed_names)}

    def fq(nm):
        return f"fixed{fidx[nm]}"

    acc = jnp.zeros((B, L, ext_n), dtype=jnp.uint32)
    zero_col = jnp.zeros((B, L, n), dtype=jnp.uint32)
    zero_ev = jnp.zeros((B, L, ext_n), dtype=jnp.uint32)

    vm_coset = _vm(("coset", dom_ext),
                   functools.partial(PV._coset, dom_ext), (0, None))

    cos_cache = {}
    cos_budget = int(os.environ.get("ZKFHE_COSET_CACHE_MB", "6000")) \
        * (1 << 20) // (L * ext_n * 4 * B)

    def coset_of(names):
        missing = [nm for nm in names if nm not in cos_cache]
        out = {}
        for s2 in range(0, len(missing), PV.COS_B):
            grp2 = missing[s2:s2 + PV.COS_B]
            stack = jnp.stack([polys.get(nm) for nm in grp2]
                              + [zero_col] * (PV.COS_B - len(grp2)), axis=2)
            ev = vm_coset(stack, cpow)
            for i2, nm in enumerate(grp2):
                out[nm] = ev[:, :, i2]
                if len(cos_cache) < cos_budget:
                    cos_cache[nm] = out[nm]
        return [cos_cache.get(nm) if cos_cache.get(nm) is not None
                else out[nm] for nm in names]

    def ev_stack(names, width):
        evs = coset_of(names)
        return jnp.stack(evs + [zero_ev] * (width - len(names)), axis=2)

    qact_ev = coset_of([fq("q_act")])[0]

    def enc_ws(tis, width):
        """(B, L, width) device term weights from the static plan (see
        prover._term_plan; the cursor assert keeps the two groupings in
        lockstep)."""
        o, m = _ws_cursor[0], len(tis)
        assert np.array_equal(dstate["term_plan_np"][o:o + m],
                              [ny - 1 - ti for ti in tis]), \
            "term plan out of sync with the batched quotient loop"
        _ws_cursor[0] = o + m
        w = ws_all_b[:, :, o:o + m]
        if m < width:
            w = jnp.pad(w, [(0, 0), (0, 0), (0, width - m)])
        return w

    vm_acc_add = _vm(("acc_add",), functools.partial(F.add, FR), (0, 0))

    by_kind = {}
    for ti, (kind, arg) in enumerate(terms):
        by_kind.setdefault(kind, []).append((ti, arg))

    GATE_BATCH = 8
    vm_gate = _vm(("gate_terms",), PV._gate_terms_partial, (0, 0, 0))
    for s in range(0, len(by_kind.get("gate", [])), GATE_BATCH):
        grp = by_kind["gate"][s:s + GATE_BATCH]
        a_ev = ev_stack([f"adv{arg}" for _, arg in grp], GATE_BATCH)
        sel_ev = ev_stack([fq(f"sel_{arg}") for _, arg in grp], GATE_BATCH)
        acc = vm_acc_add(acc, vm_gate(
            enc_ws([ti for ti, _ in grp], GATE_BATCH), a_ev, sel_ev))

    vm_chal = _vm(("chal_terms",), PV._chal_terms_partial, (0, 0, 0, 0))
    for s in range(0, len(by_kind.get("challenge", [])), GATE_BATCH):
        grp = by_kind["challenge"][s:s + GATE_BATCH]
        a_ev = ev_stack([f"adv{arg}" for _, arg in grp], GATE_BATCH)
        qg_ev = ev_stack([fq(f"qgamma_{arg}") for _, arg in grp],
                         GATE_BATCH)
        acc = vm_acc_add(acc, vm_chal(
            enc_ws([ti for ti, _ in grp], GATE_BATCH), a_ev, qg_ev,
            gammas_m))

    # logUp helper terms: FULL groups in one dispatch, ragged singletons
    lk_full, lk_ragged = [], []
    for ti, g in by_kind.get("lookup_h", []):
        cols = list(range(g * LOOKUP_GROUP, min((g + 1) * LOOKUP_GROUP, nlk)))
        (lk_full if len(cols) == LOOKUP_GROUP else lk_ragged).append(
            (ti, g, cols))
    if lk_full:
        h_ev = ev_stack([f"lookup_h{g}" for _, g, _ in lk_full],
                        len(lk_full))
        l_ev = jnp.stack(
            [jnp.stack(coset_of([f"adv{lk_base + i}" for i in cols]),
                       axis=2)
             for _, _, cols in lk_full], axis=2)
        # qact_ev is per-proof batched here (coset_of returns (B, L, E)),
        # so map it over axis 0 rather than broadcasting
        vm_lk_h = _vm(("lookup_h_terms_b",), PV._lookup_h_terms_partial,
                      (0, 0, 0, 0, 0))
        acc = vm_acc_add(acc, vm_lk_h(
            enc_ws([ti for ti, _, _ in lk_full], len(lk_full)),
            h_ev, l_ev, qact_ev, betas_lm))
    for ti, g, cols in lk_ragged:
        lstack = jnp.stack([polys.get(f"adv{lk_base + i}") for i in cols],
                           axis=2)
        vm_lk1 = _vm(("lookup_h_term", dom_ext),
                     functools.partial(PV._j_lookup_h_term, dom_ext),
                     (0, 0, 0, 0, 0, None, 0))
        acc = vm_lk1(acc, yb_weight(ti), polys.get(f"lookup_h{g}"),
                     lstack, polys.get(fq("q_act")), cpow, betas_lm)

    # permutation chunk terms
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
    PERMJ = 4
    vm_perm = _vm(("perm_chunks",), PV._perm_chunks_partial,
                  (0, 0, 0, 0, None, 0, None, 0, 0))
    for s in range(0, len(pc_full), PERMJ):
        grp = pc_full[s:s + PERMJ]
        npad = PERMJ - len(grp)
        zero_grp_p = jnp.zeros((B, L, PERM_CHUNK, ext_n), dtype=jnp.uint32)

        def chunk_ev(name_fn):
            rows = [jnp.stack(
                coset_of([name_fn(i) for i in range(j * PERM_CHUNK,
                                                    (j + 1) * PERM_CHUNK)]),
                axis=2) for _, j in grp]
            return jnp.stack(rows + [zero_grp_p] * npad, axis=2)

        z_ev = ev_stack([f"perm_z{j}" for _, j in grp], PERMJ)
        v_ev = chunk_ev(perm_col_name)
        sig_ev = chunk_ev(lambda i: f"sigma{i}")
        dp_rows = [dpow[:, j * PERM_CHUNK:(j + 1) * PERM_CHUNK]
                   for _, j in grp]
        dp_rows += [jnp.zeros((L, PERM_CHUNK), dtype=jnp.uint32)] * npad
        dpows = jnp.stack(dp_rows, axis=1)
        acc = vm_acc_add(acc, vm_perm(
            enc_ws([ti for ti, _ in grp], PERMJ),
            z_ev, v_ev, sig_ev, dpows, qact_ev, xcoset, betas_pm,
            gammas_pm))
    for ti, j in pc_ragged:
        idxs = list(range(j * PERM_CHUNK, min((j + 1) * PERM_CHUNK, P)))
        vm_pc1 = _vm(("perm_chunk_term", dom_ext, len(idxs)),
                     functools.partial(PV._j_perm_chunk_term, dom_ext),
                     (0, 0, 0, 0, 0, 0, None, None, None, 0, 0))
        acc = vm_pc1(acc, yb_weight(ti), polys.get(f"perm_z{j}"),
                     jnp.stack([polys.get(perm_col_name(i)) for i in idxs],
                               axis=2),
                     jnp.stack([polys.get(f"sigma{i}") for i in idxs],
                               axis=2),
                     polys.get(fq("q_act")), cpow, xcoset,
                     dpow[:, idxs[0]:idxs[-1] + 1], betas_pm, gammas_pm)

    # chain terms
    qfirst_ev = coset_of([fq("q_first")])[0]
    chains = by_kind.get("perm_chain", [])
    if chains:
        vm_chain = _vm(("perm_chains", u),
                       functools.partial(PV._perm_chains_partial, u),
                       (0, 0, 0, 0))
        for s in range(0, len(chains), GATE_BATCH):
            grp = chains[s:s + GATE_BATCH]
            zj_ev = ev_stack([f"perm_z{j}" for _, j in grp], GATE_BATCH)
            zp_ev = ev_stack([f"perm_z{j - 1}" for _, j in grp], GATE_BATCH)
            acc = vm_acc_add(acc, vm_chain(
                enc_ws([ti for ti, _ in grp], GATE_BATCH), zj_ev, zp_ev,
                qfirst_ev))

    # singleton terms
    for ti, (kind, arg) in enumerate(terms):
        w = yb_weight(ti)
        if kind == "lookup_table":
            fn = _vm(("lookup_table_term", dom_ext),
                     functools.partial(PV._j_lookup_table_term, dom_ext),
                     (0, 0, 0, None, 0, None, None, 0))
            acc = fn(acc, w, polys.get("lookup_g"),
                     pk.fixed_coeffs[:, fidx["table"]],
                     polys.get("lookup_m"),
                     pk.fixed_coeffs[:, fidx["q_act"]], cpow, betas_lm)
        elif kind == "lookup_acc":
            fn = _vm(("lookup_acc_term", dom_ext),
                     functools.partial(PV._j_lookup_acc_term, dom_ext),
                     (0, 0, 0, 0, 0, None, None))
            acc = fn(acc, w, polys.get("lookup_phi"), h_coeffs,
                     polys.get("lookup_g"),
                     pk.fixed_coeffs[:, fidx["q_act"]], cpow)
        elif kind in ("lookup_first", "lookup_last", "perm_first",
                      "perm_last"):
            sel = {"lookup_first": "q_first", "lookup_last": "q_last",
                   "perm_first": "q_first", "perm_last": "q_last"}[kind]
            poly = {"lookup_first": "lookup_phi",
                    "lookup_last": "lookup_phi",
                    "perm_first": "perm_z0",
                    "perm_last": f"perm_z{nz - 1}"}[kind]
            base = (PV._j_sel_poly_term if kind.startswith("lookup")
                    else PV._j_sel_poly_minus_one_term)
            fn = _vm((f"sel_poly_{kind.startswith('perm')}", dom_ext),
                     functools.partial(base, dom_ext),
                     (0, 0, 0, None, None))
            acc = fn(acc, w, polys.get(poly),
                     pk.fixed_coeffs[:, fidx[sel]], cpow)
        elif kind in ("gate", "challenge", "lookup_h", "perm_chunk",
                      "perm_chain"):
            pass
        else:
            raise AssertionError(kind)

    cos_cache.clear()
    jax.block_until_ready(acc)
    _timer.mark("quot_terms")
    zh_inv = dstate["zh_inv"]
    vm_finish = _vm(("quot_finish", dom_ext),
                    functools.partial(PV._j_quot_finish, dom_ext),
                    (0, None, None))
    h_full = vm_finish(acc, zh_inv, cpow_inv)
    hq = h_full[:, :, : PROTO.NUM_QUOT_CHUNKS * n].reshape(
        B, L, PROTO.NUM_QUOT_CHUNKS, n)
    del h_full
    polys.add_stack([f"quot{i}" for i in range(PROTO.NUM_QUOT_CHUNKS)], hq)
    for i, pts in enumerate(commit_coeffs_batch(hq)):
        for pt in pts:
            trs[i].write_point(pt)
    _timer.mark("quotient")
    xs = [tr.challenge() for tr in trs]

    # ---- evaluations --------------------------------------------------------
    sched = PROTO.opening_schedule(shape)
    omega = dom.omega
    points_b = [{
        0: x % FR.p,
        1: x * omega % FR.p,
        2: x * pow(omega, 2, FR.p) % FR.p,
        3: x * pow(omega, 3, FR.p) % FR.p,
        PROTO.ROT_LAST: x * pow(omega, u, FR.p) % FR.p,
    } for x in xs]
    vm_pows = _vm(("power_series", n),
                  lambda b: F.power_series(FR, b, n), (0,))
    # ONE upload for all B x |rotations| opening points (+ inverses for
    # the SHPLONK divisions below)
    flat_pts = [points_b[i][r] for r in PROTO.ROTATIONS for i in range(B)]
    inv_pts = [pow(z, FR.p - 2, FR.p) for z in flat_pts]
    pe = jnp.asarray(F.encode(FR, flat_pts + inv_pts, mont=True))
    nflat = len(flat_pts)
    enc_pt_b = {r: jnp.moveaxis(pe[:, ri * B:(ri + 1) * B], 1, 0)
                for ri, r in enumerate(PROTO.ROTATIONS)}  # (B, L)
    enc_pt_inv_b = {
        r: jnp.moveaxis(pe[:, nflat + ri * B: nflat + (ri + 1) * B], 1, 0)
        for ri, r in enumerate(PROTO.ROTATIONS)}
    xpows = {r: vm_pows(enc_pt_b[r]) for r in PROTO.ROTATIONS}

    vm_evals = _vm(("evals_batch",), PV._j_evals_batch, (0, 0))
    by_rot = {}
    for name, rot in sched:
        by_rot.setdefault(rot, []).append(name)
    evals = [dict() for _ in range(B)]
    EV_CHUNK = 64
    pend = []  # dispatch all chunks; decode through ONE transfer
    for rot, names in by_rot.items():
        for s in range(0, len(names), EV_CHUNK):
            chunk = names[s:s + EV_CHUNK]
            stack = jnp.stack([polys.get(nm) for nm in chunk], axis=2)
            pend.append((rot, chunk, vm_evals(stack, xpows[rot])))
            del stack
    all_np = np.asarray(jnp.concatenate([e for _, _, e in pend], axis=2))
    for i in range(B):
        vals = F.decode(FR, all_np[i], mont=True)
        pos = 0
        for rot, chunk, _ in pend:
            for nm in chunk:
                evals[i][(nm, rot)] = vals[pos]
                pos += 1
    del pend
    for i, tr in enumerate(trs):
        for name, rot in sched:
            tr.write_scalar(evals[i][(name, rot)])
    _timer.mark("evals")

    # ---- SHPLONK multiopen --------------------------------------------------
    vs = [tr.challenge() for tr in trs]
    y2s = [tr.challenge() for tr in trs]

    sets = PROTO.rotation_sets(shape)
    vm_combine = _vm(("combine",), PV._j_combine, (0, 0))
    vm_div = _vm(("divide_linear",), PV._j_divide_linear, (0, 0, 0, 0))
    zero_ce = jnp.zeros((B, L), dtype=jnp.uint32)

    f_polys, set_pts, set_evals, h_list = [], [], [], []
    CB = 64
    # host math for every (set, proof) first, so the interpolation
    # coefficients ride ONE upload; v-powers fold on device from one
    # upload of the B challenges
    max_names = max(len(names) for _, names in sets)
    vs_enc = jnp.asarray(F.encode(FR, vs, mont=True))  # (L, B)
    vm_vpows = _vm(("vpows", max_names),
                   functools.partial(lambda c, b: F.power_series(FR, b, c),
                                     max_names), (0,))
    vpows_dev_b = vm_vpows(jnp.moveaxis(vs_enc, 1, 0))  # (B, L, max)
    vpows_host = [[pow(vs[i], j, FR.p) for j in range(max_names)]
                  for i in range(B)]
    rc_flat, rc_base = [], []
    for rots, names in sets:
        pts_b = [[points_b[i][r] for r in rots] for i in range(B)]
        fe_b = [[sum(vw * evals[i][(nm, r)]
                     for vw, nm in zip(vpows_host[i], names)) % FR.p
                 for r in rots] for i in range(B)]
        rc_base.append(len(rc_flat))
        for i in range(B):
            rc_flat += PROTO.lagrange_coeffs(pts_b[i], fe_b[i], FR.p)
        set_pts.append(pts_b)
        set_evals.append(fe_b)
    rc_enc = jnp.asarray(F.encode(FR, rc_flat, mont=True))
    for si, (rots, names) in enumerate(sets):
        comb = None
        for s in range(0, len(names), CB):
            chunk = names[s:s + CB]
            stack = jnp.stack([polys.get(nm) for nm in chunk], axis=2)
            part = vm_combine(stack, vpows_dev_b[:, :, s:s + len(chunk)])
            del stack
            comb = part if comb is None else vm_acc_add(comb, part)
        m = len(rots)
        base = rc_base[si]
        rc_b = jnp.stack([rc_enc[:, base + i * m: base + (i + 1) * m]
                          for i in range(B)])
        vm_sub_low = _vm(("sub_low", m),
                         functools.partial(PV._j_sub_low, m), (0, 0))
        numer = vm_sub_low(comb, rc_b)
        for ri, r in enumerate(rots):
            numer = vm_div(numer, zero_ce, enc_pt_b[r], enc_pt_inv_b[r])
        f_polys.append(comb)
        h_list.append(numer)

    ypows_host = [[pow(y2s[i], si, FR.p) for si in range(len(sets))]
                  for i in range(B)]
    y2_enc = jnp.asarray(F.encode(
        FR, [w for row in ypows_host for w in row], mont=True))
    ns = len(sets)
    h_poly = vm_combine(
        jnp.stack(h_list, axis=2),
        jnp.stack([y2_enc[:, i * ns:(i + 1) * ns] for i in range(B)]))
    for i, pts in enumerate(commit_coeffs_batch(h_poly[:, :, None])):
        trs[i].write_point(pts[0])
    us = [tr.challenge() for tr in trs]

    t_vals_b = []
    for i in range(B):
        tv = []
        for r in PROTO.ROTATIONS:
            if any(r in rots for rots, _ in sets) \
                    and points_b[i][r] not in tv:
                tv.append(points_b[i][r])
        t_vals_b.append(tv)
    scal_b, c0_b = [[] for _ in range(B)], [0] * B
    for si, (pts_b, fe_b) in enumerate(zip(set_pts, set_evals)):
        for i in range(B):
            z_rest = PROTO.vanishing_eval(
                [t for t in t_vals_b[i] if t not in pts_b[i]], us[i], FR.p)
            w = ypows_host[i][si] * z_rest % FR.p
            scal_b[i].append(w)
            c0_b[i] = (c0_b[i] + w * PROTO.lagrange_eval(
                pts_b[i], fe_b[i], us[i], FR.p)) % FR.p
    for i in range(B):
        scal_b[i].append(
            (-PROTO.vanishing_eval(t_vals_b[i], us[i], FR.p)) % FR.p)
    # one upload: per-proof set weights + the three division scalars
    ts = len(scal_b[0])
    tail_flat = []
    for i in range(B):
        tail_flat += scal_b[i] + [c0_b[i], us[i],
                                  pow(us[i], FR.p - 2, FR.p)]
    tail_enc = jnp.asarray(F.encode(FR, tail_flat, mont=True))
    stride = ts + 3
    l_comb = vm_combine(
        jnp.stack(f_polys + [h_poly], axis=2),
        jnp.stack([tail_enc[:, i * stride: i * stride + ts]
                   for i in range(B)]))
    w_poly = vm_div(
        l_comb,
        jnp.stack([tail_enc[:, i * stride + ts] for i in range(B)]),
        jnp.stack([tail_enc[:, i * stride + ts + 1] for i in range(B)]),
        jnp.stack([tail_enc[:, i * stride + ts + 2] for i in range(B)]))
    for i, pts in enumerate(commit_coeffs_batch(w_poly[:, :, None])):
        trs[i].write_point(pts[0])
    _timer.mark("multiopen")

    PV.LAST_STAGES.clear()
    PV.LAST_STAGES.update(_timer.summary())
    return [tr.proof_bytes() for tr in trs]

