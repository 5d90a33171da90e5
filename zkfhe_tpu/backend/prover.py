"""The proving pipeline (SURVEY.md §3.3, rebuilt TPU-native).

create_proof stages, mirroring halo2's protocol with a logUp lookup and
GWC-style multiopen (see backend/protocol.py for the exact schedule):

  1. jitted witness generation (phase 0), column scatter, blinding,
     phase-0 commitments                         -> squeeze gamma
  2. full witness with gamma, phase-1 + lookup-advice commitments,
     lookup multiplicities                       -> squeeze beta_l
  3. logUp helpers h_g, g_t, accumulator phi     -> squeeze beta_p, gamma_p
  4. permutation grand products (chunked)        -> squeeze y
  5. quotient: fold all constraint terms on the 8n coset with y powers,
     divide by Z_H, split/commit                 -> squeeze x
  6. evaluations of every opened polynomial      -> squeeze v
  7. GWC witness polys per opening point (synthetic division) -> proof

Every heavy step is vectorized limb math on device; the host only runs
the transcript and orchestration.
"""
from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import curve as C
from ..ops import field as F
from ..ops import msm as M
from ..ops import ntt as N
from ..ops.field import FR
from ..trace.builder import CTX_LK, CTX_P0, CTX_P1, LOOKUP_BITS, NUM_CTX
from ..trace.compile import make_witgen
from . import protocol as PROTO
from .assembly import EXT_FACTOR, LOOKUP_GROUP, PERM_CHUNK
from .keygen import ProvingKey, commit_columns
from .srs import SRS
from .transcript import Transcript

L = F.NLIMBS


def _rand_field_rows(rng, rows, cols):
    vals = [rng.randrange(FR.p) for _ in range(rows * cols)]
    return F.encode_ints_np([FR.to_mont_int(v) for v in vals]).reshape(
        L, rows, cols
    )


def _enc_mont_scalar(x: int):
    return jnp.asarray(F.encode(FR, [x % FR.p], mont=True))[:, 0]


class ProverState:
    """Device-array bag for one proof."""


def prove(pk: ProvingKey, srs: SRS, circuit_fn, inputs,
          rng_seed: bytes | None = None, debug: bool = False) -> bytes:
    asm = pk.asm
    k, n, u = asm.k, asm.n, asm.u
    dom = N.Domain.new(k)
    ext_k = k + EXT_FACTOR.bit_length() - 1
    dom_ext = N.Domain.new(ext_k)
    ext_n = dom_ext.n
    delta = pk.vk.delta

    import random as _random
    rng = _random.Random(rng_seed or os.urandom(16))

    tr = Transcript()
    witgen = make_witgen(circuit_fn)

    # ---- phase 0 -----------------------------------------------------------
    zero_gamma = jnp.zeros((L,), dtype=jnp.uint32)
    values0, instance = witgen(inputs, zero_gamma)
    inst_ints = F.decode(FR, instance)
    for v in inst_ints:
        tr.common_scalar(v)

    # scatter helper: cells -> (L, A, n) advice matrix (standard form)
    scatter_idx = {}
    for ctx in range(NUM_CTX):
        pos = (asm.cell_col[ctx].astype(np.int64) * n
               + asm.cell_row[ctx].astype(np.int64))
        scatter_idx[ctx] = jnp.asarray(pos)

    def build_advice(values):
        flat = jnp.zeros((L, asm.num_advice * n), dtype=jnp.uint32)
        for ctx in range(NUM_CTX):
            if values[ctx].shape[1]:
                flat = flat.at[:, scatter_idx[ctx]].set(values[ctx])
        return flat.reshape(L, asm.num_advice, n)

    # blinding rows u..n-1 for every advice column
    blind = _rand_field_rows(rng, asm.num_advice, n - u)  # (L, A, n-u)

    def finish_advice(values):
        adv = F.to_mont(FR, build_advice(values))
        return jnp.concatenate([adv[:, :, :u], blind], axis=2)

    adv = finish_advice(values0)
    adv_coeffs = N.intt(dom, adv)
    p0 = asm.num_p0_cols
    commits_p0 = commit_columns(srs, adv_coeffs[:, :p0] if p0 else
                                jnp.zeros((L, 0, n), dtype=jnp.uint32))
    for pt in commits_p0:
        tr.write_point(pt)

    gamma = tr.challenge()

    # ---- full witness with the real challenge ------------------------------
    values1, instance1 = witgen(inputs, jnp.asarray(F.encode(FR, [gamma]))[:, 0])
    # instance cells must be challenge-independent (they are absorbed into
    # the transcript before gamma): guard against circuits exposing
    # phase-1 values
    assert np.array_equal(np.asarray(instance), np.asarray(instance1)), \
        "instance values depend on the challenge"
    adv = finish_advice(values1)
    adv_coeffs = N.intt(dom, adv)
    commits_p1 = commit_columns(srs, adv_coeffs[:, p0:])
    for pt in commits_p1:
        tr.write_point(pt)

    polys = {}  # name -> (L, n) coeffs (Montgomery)
    for i in range(asm.num_advice):
        polys[f"adv{i}"] = adv_coeffs[:, i]

    # fixed + sigma from pk
    for i in range(pk.fixed_coeffs.shape[1]):
        polys[f"fixed{i}"] = pk.fixed_coeffs[:, i]
    for i in range(pk.sigma_coeffs.shape[1]):
        polys[f"sigma{i}"] = pk.sigma_coeffs[:, i]

    # instance polynomial (not committed; used in permutation terms)
    inst_vals = jnp.zeros((L, n), dtype=jnp.uint32)
    if instance.shape[1]:
        inst_vals = inst_vals.at[:, : instance.shape[1]].set(
            F.to_mont(FR, instance)
        )
    polys["instance"] = N.intt(dom, inst_vals)

    # ---- lookup: multiplicities -------------------------------------------
    shape = pk.vk.shape
    nlk = asm.num_lk_cols
    lk_base = asm.num_advice - nlk
    if nlk:
        lk_vals_std = values1[CTX_LK][0]  # byte values fit in limb 0
        counts = jnp.bincount(lk_vals_std.astype(jnp.int32),
                              length=1 << LOOKUP_BITS)
        pad_zeros = nlk * u - lk_vals_std.shape[0]
        counts = counts.at[0].add(pad_zeros)
        m_vals_std = jnp.zeros((L, n), dtype=jnp.uint32)
        m_vals_std = m_vals_std.at[0, : 1 << LOOKUP_BITS].set(
            counts.astype(jnp.uint32)
        )
        # counts can exceed 2^13; renormalize limbs
        m_vals_std, _ = F._carry_chain(m_vals_std)
        m_vals = F.to_mont(FR, m_vals_std)
        m_vals = jnp.concatenate(
            [m_vals[:, :u], _rand_field_rows(rng, 1, n - u)[:, 0]], axis=1
        )
        polys["lookup_m"] = N.intt(dom, m_vals)
        for pt in commit_columns(srs, polys["lookup_m"][:, None]):
            tr.write_point(pt)

    beta_l = tr.challenge()
    beta_lm = _enc_mont_scalar(beta_l)  # Montgomery of beta_l

    # table values (Montgomery Lagrange)
    table_std = np.zeros(n, dtype=np.uint64)
    table_std[: 1 << LOOKUP_BITS] = np.arange(1 << LOOKUP_BITS)
    table_vals = F.to_mont(FR, jnp.asarray(
        F.encode_ints_np(list(table_std))))

    lookup_aux_names = []
    if nlk:
        # h_g = sum_{i in group} 1/(beta + l_i) on active rows
        lk_cols = adv[:, lk_base:, :]  # (L, nlk, n) Montgomery values
        bcast = jnp.broadcast_to(beta_lm[:, None, None], lk_cols.shape)
        denoms = F.add(FR, lk_cols, bcast)
        inv = F.batch_inv(FR, denoms.reshape(L, -1)).reshape(denoms.shape)
        ngroups = PROTO.num_lookup_groups(shape)
        hs = []
        for g in range(ngroups):
            sl = inv[:, g * LOOKUP_GROUP:(g + 1) * LOOKUP_GROUP, :]
            hs.append(F.tree_sum_mod(FR, sl, axis=1))
        h_all = jnp.stack(hs, axis=1)  # (L, ngroups, n)
        # g_t = M / (beta + T)
        tden = F.add(FR, table_vals,
                     jnp.broadcast_to(beta_lm[:, None], table_vals.shape))
        tinv = F.batch_inv(FR, tden)
        g_vals = F.mont_mul(FR, m_vals, tinv)
        # phi: prefix sums of S = sum_g h_g - g_t over active rows
        s_vals = F.sub(FR, F.tree_sum_mod(FR, h_all, axis=1), g_vals)
        act_mask = (jnp.arange(n) < u)
        s_vals = jnp.where(act_mask[None], s_vals, jnp.zeros_like(s_vals))
        moved = jnp.moveaxis(s_vals, -1, 0)[:, :, None]

        def addop(x, y):
            return jnp.moveaxis(
                F.add(FR, jnp.moveaxis(x, 1, 0), jnp.moveaxis(y, 1, 0)), 0, 1
            )

        pref = jax.lax.associative_scan(addop, moved)[..., 0]  # (n, L)
        pref = jnp.moveaxis(pref, 0, -1)  # phi(r+1) values
        phi = jnp.concatenate(
            [jnp.zeros((L, 1), dtype=jnp.uint32), pref[:, :-1]], axis=1
        )
        # rows > u random; row u must stay = phi(u) (boundary constraint)
        phi = jnp.concatenate(
            [phi[:, : u + 1], _rand_field_rows(rng, 1, n - u - 1)[:, 0]],
            axis=1,
        )
        # blind h/g rows >= u
        h_all = jnp.concatenate(
            [h_all[:, :, :u],
             _rand_field_rows(rng, ngroups, n - u)], axis=2)
        g_vals = jnp.concatenate(
            [g_vals[:, :u], _rand_field_rows(rng, 1, n - u)[:, 0]], axis=1)

        for g in range(ngroups):
            polys[f"lookup_h{g}"] = N.intt(dom, h_all[:, g])
            lookup_aux_names.append(f"lookup_h{g}")
        polys["lookup_g"] = N.intt(dom, g_vals)
        polys["lookup_phi"] = N.intt(dom, phi)
        lookup_aux_names += ["lookup_g", "lookup_phi"]
        aux = jnp.stack([polys[nm] for nm in lookup_aux_names], axis=1)
        for pt in commit_columns(srs, aux):
            tr.write_point(pt)

    beta_p = tr.challenge()
    gamma_p = tr.challenge()
    beta_pm = _enc_mont_scalar(beta_p)
    gamma_pm = _enc_mont_scalar(gamma_p)

    # ---- permutation grand products ----------------------------------------
    P = asm.num_perm_cols
    nz = PROTO.num_perm_chunks(shape)
    # permutation column values: advice cols ++ const fixed col ++ instance
    fixed_vals_const = N.ntt(dom, pk.fixed_coeffs[:, 0])  # const column
    perm_vals = jnp.concatenate(
        [adv, fixed_vals_const[:, None], inst_vals[:, None]], axis=1
    )  # (L, P, n)

    # id and sigma factors on active rows
    delta_pows = [1] * P
    for i in range(1, P):
        delta_pows[i] = delta_pows[i - 1] * delta % FR.p
    dpow = jnp.asarray(F.encode(FR, delta_pows, mont=True))  # (L, P)
    wpow = F.power_series(FR, _enc_mont_scalar(dom.omega), n)
    idv = F.mont_mul(
        FR,
        jnp.broadcast_to(dpow[:, :, None], (L, P, n)),
        jnp.broadcast_to(wpow[:, None, :], (L, P, n)),
    )
    bb = jnp.broadcast_to(beta_pm[:, None, None], (L, P, n))
    gg = jnp.broadcast_to(gamma_pm[:, None, None], (L, P, n))
    num = F.add(FR, perm_vals, F.add(FR, F.mont_mul(FR, bb, idv), gg))
    den = F.add(FR, perm_vals,
                F.add(FR, F.mont_mul(FR, bb, pk.sigma_vals), gg))
    den_inv = F.batch_inv(FR, den.reshape(L, -1)).reshape(den.shape)
    ratio = F.mont_mul(FR, num, den_inv)  # (L, P, n)
    # chunk products over columns
    chunk_ratios = []
    for j in range(nz):
        sl = ratio[:, j * PERM_CHUNK:(j + 1) * PERM_CHUNK, :u]
        prod = sl[:, 0]
        for i in range(1, sl.shape[1]):
            prod = F.mont_mul(FR, prod, sl[:, i])
        chunk_ratios.append(prod)
    # running products: Z_j(0) = chain, Z_j(r+1) = Z_j(r) * R_j(r)
    one_m = _enc_mont_scalar(1)
    z_polys = []
    z_lagrange = []
    chain = jnp.broadcast_to(one_m[:, None], (L, 1))[:, 0]

    def mulop(x, y):
        return jnp.moveaxis(
            F.mont_mul(FR, jnp.moveaxis(x, 1, 0), jnp.moveaxis(y, 1, 0)), 0, 1
        )

    for j in range(nz):
        moved = jnp.moveaxis(chunk_ratios[j], -1, 0)[:, :, None]
        pref = jax.lax.associative_scan(mulop, moved)[..., 0]
        pref = jnp.moveaxis(pref, 0, -1)  # (L, u): products up to r+1
        zvals = jnp.concatenate(
            [jnp.broadcast_to(one_m[:, None], (L, 1)), pref], axis=1
        )  # rows 0..u
        zvals = F.mont_mul(
            FR, zvals, jnp.broadcast_to(chain[:, None], zvals.shape)
        )
        chain = zvals[:, -1]  # Z_j(u)
        zvals = jnp.concatenate(
            [zvals, _rand_field_rows(rng, 1, n - u - 1)[:, 0]], axis=1
        )
        if debug:
            z_lagrange.append(zvals)
        z_polys.append(N.intt(dom, zvals))
    # final boundary: Z_{nz-1}(u) must be 1 (whole permutation telescopes)
    for j in range(nz):
        polys[f"perm_z{j}"] = z_polys[j]
    if nz:
        zc = commit_columns(srs, jnp.stack(z_polys, axis=1))
        for pt in zc:
            tr.write_point(pt)

    # random blinding poly (vanishing argument zk)
    rand_coeffs = _rand_field_rows(rng, 1, n)[:, 0]
    polys["random"] = rand_coeffs
    for pt in commit_columns(srs, rand_coeffs[:, None]):
        tr.write_point(pt)

    y = tr.challenge()

    if debug:
        _debug_terms_on_domain(
            pk, dom, adv, inst_vals, gamma, beta_l, beta_p, gamma_p,
            z_lagrange, locals())

    # ---- quotient on the extended coset ------------------------------------
    coset_gen = delta
    cpow = F.power_series(FR, _enc_mont_scalar(coset_gen), ext_n)
    cpow_inv = F.power_series(
        FR, _enc_mont_scalar(pow(coset_gen, FR.p - 2, FR.p)),
        ext_n,
    )
    # the literal polynomial X evaluated over the coset: g * omega_ext^j
    xcoset = F.mont_mul(
        FR,
        F.power_series(FR, _enc_mont_scalar(dom_ext.omega), ext_n),
        jnp.broadcast_to(_enc_mont_scalar(coset_gen)[:, None],
                         (L, ext_n)),
    )

    def coset_eval(coeffs):
        """(L, ..., n) coeffs -> (L, ..., ext_n) coset evaluations."""
        pad = [(0, 0)] * (coeffs.ndim - 1) + [(0, ext_n - coeffs.shape[-1])]
        cp = jnp.pad(coeffs, pad)
        shaped = cpow.reshape((L,) + (1,) * (coeffs.ndim - 2) + (ext_n,))
        return N.ntt(dom_ext, F.mont_mul(FR, cp, jnp.broadcast_to(shaped, cp.shape)))

    terms = PROTO.build_terms(shape)
    ny = len(terms)
    y_pows_host = [1] * ny
    for i in range(1, ny):
        y_pows_host[i] = y_pows_host[i - 1] * y % FR.p
    # folding acc = sum_i y^(ny-1-i) * term_i
    y_w = [y_pows_host[ny - 1 - i] for i in range(ny)]

    fixed_names = PROTO.fixed_poly_names(shape)
    fixed_index = {nm: i for i, nm in enumerate(fixed_names)}

    def fixed_coset(nm):
        return coset_eval(pk.fixed_coeffs[:, fixed_index[nm]])

    def rolled(ev, rot):
        return jnp.roll(ev, -EXT_FACTOR * rot, axis=-1)

    acc = jnp.zeros((L, ext_n), dtype=jnp.uint32)

    def fold(acc, term_ev, w):
        wm = _enc_mont_scalar(w)
        return F.add(FR, acc, F.mont_mul(
            FR, term_ev, jnp.broadcast_to(wm[:, None], term_ev.shape)))

    # cache the advice coset evals we need twice (gates + permutation):
    # compute on the fly, batched per chunk to bound memory.
    gamma_m = _enc_mont_scalar(gamma)

    ti = 0
    for kind, arg in terms:
        w = y_w[ti]
        ti += 1
        if kind == "gate":
            col = arg
            a = coset_eval(polys[f"adv{col}"])
            sel = fixed_coset(f"sel_{col}")
            t = F.add(FR, a, F.mont_mul(FR, rolled(a, 1), rolled(a, 2)))
            t = F.sub(FR, t, rolled(a, 3))
            acc = fold(acc, F.mont_mul(FR, sel, t), w)
        elif kind == "challenge":
            col = arg
            a = coset_eval(polys[f"adv{col}"])
            sel = fixed_coset(f"qgamma_{col}")
            gb = jnp.broadcast_to(gamma_m[:, None], a.shape)
            acc = fold(acc, F.mont_mul(FR, sel, F.sub(FR, a, gb)), w)
        elif kind == "lookup_h":
            g = arg
            qact = fixed_coset("q_act")
            cols = range(g * LOOKUP_GROUP,
                         min((g + 1) * LOOKUP_GROUP, nlk))
            ls = [coset_eval(polys[f"adv{lk_base + i}"]) for i in cols]
            bb2 = jnp.broadcast_to(beta_lm[:, None], ls[0].shape)
            facs = [F.add(FR, x, bb2) for x in ls]
            h = coset_eval(polys[f"lookup_h{g}"])
            prod_all = facs[0]
            for f2 in facs[1:]:
                prod_all = F.mont_mul(FR, prod_all, f2)
            lhs = F.mont_mul(FR, h, prod_all)
            # sum of products-of-others
            rhs = jnp.zeros_like(lhs)
            for j in range(len(facs)):
                pr = None
                for kk in range(len(facs)):
                    if kk == j:
                        continue
                    pr = facs[kk] if pr is None else F.mont_mul(FR, pr, facs[kk])
                if pr is None:
                    pr = jnp.broadcast_to(
                        _enc_mont_scalar(1)[:, None], lhs.shape)
                rhs = F.add(FR, rhs, pr)
            acc = fold(acc, F.mont_mul(FR, qact, F.sub(FR, lhs, rhs)), w)
        elif kind == "lookup_table":
            qact = fixed_coset("q_act")
            g_ev = coset_eval(polys["lookup_g"])
            t_ev = fixed_coset("table")
            m_ev = coset_eval(polys["lookup_m"])
            bb2 = jnp.broadcast_to(beta_lm[:, None], t_ev.shape)
            t0 = F.sub(FR, F.mont_mul(FR, g_ev, F.add(FR, t_ev, bb2)), m_ev)
            acc = fold(acc, F.mont_mul(FR, qact, t0), w)
        elif kind == "lookup_acc":
            qact = fixed_coset("q_act")
            phi = coset_eval(polys["lookup_phi"])
            sh = F.sub(FR, rolled(phi, 1), phi)
            hsum = jnp.zeros_like(phi)
            for g in range(PROTO.num_lookup_groups(shape)):
                hsum = F.add(FR, hsum, coset_eval(polys[f"lookup_h{g}"]))
            g_ev = coset_eval(polys["lookup_g"])
            t0 = F.add(FR, F.sub(FR, sh, hsum), g_ev)
            acc = fold(acc, F.mont_mul(FR, qact, t0), w)
        elif kind == "lookup_first":
            acc = fold(acc, F.mont_mul(
                FR, fixed_coset("q_first"),
                coset_eval(polys["lookup_phi"])), w)
        elif kind == "lookup_last":
            acc = fold(acc, F.mont_mul(
                FR, fixed_coset("q_last"),
                coset_eval(polys["lookup_phi"])), w)
        elif kind == "perm_first":
            z0 = coset_eval(polys["perm_z0"])
            onem = jnp.broadcast_to(_enc_mont_scalar(1)[:, None], z0.shape)
            acc = fold(acc, F.mont_mul(
                FR, fixed_coset("q_first"), F.sub(FR, z0, onem)), w)
        elif kind == "perm_chunk":
            j = arg
            qact = fixed_coset("q_act")
            z = coset_eval(polys[f"perm_z{j}"])
            zr = rolled(z, 1)
            lhs, rhs = zr, z
            for i in range(j * PERM_CHUNK, min((j + 1) * PERM_CHUNK, P)):
                if i < asm.num_advice:
                    v = coset_eval(polys[f"adv{i}"])
                elif i == asm.num_advice:
                    v = fixed_coset("const")
                else:
                    v = coset_eval(polys["instance"])
                sig = coset_eval(polys[f"sigma{i}"])
                bb2 = jnp.broadcast_to(beta_pm[:, None], v.shape)
                gg2 = jnp.broadcast_to(gamma_pm[:, None], v.shape)
                lhs = F.mont_mul(FR, lhs, F.add(
                    FR, v, F.add(FR, F.mont_mul(FR, bb2, sig), gg2)))
                did = F.mont_mul(
                    FR, jnp.broadcast_to(dpow[:, i][:, None], xcoset.shape),
                    xcoset)
                rhs = F.mont_mul(FR, rhs, F.add(
                    FR, v, F.add(FR, F.mont_mul(FR, bb2, did), gg2)))
            acc = fold(acc, F.mont_mul(FR, qact, F.sub(FR, lhs, rhs)), w)
        elif kind == "perm_chain":
            j = arg
            zj = coset_eval(polys[f"perm_z{j}"])
            zprev = coset_eval(polys[f"perm_z{j - 1}"])
            zprev_u = jnp.roll(zprev, -EXT_FACTOR * u, axis=-1)
            acc = fold(acc, F.mont_mul(
                FR, fixed_coset("q_first"), F.sub(FR, zj, zprev_u)), w)
        elif kind == "perm_last":
            zl = coset_eval(polys[f"perm_z{nz - 1}"])
            onem = jnp.broadcast_to(_enc_mont_scalar(1)[:, None], zl.shape)
            acc = fold(acc, F.mont_mul(
                FR, fixed_coset("q_last"), F.sub(FR, zl, onem)), w)
        else:
            raise AssertionError(kind)

    # divide by Z_H on the coset: Z_H(coset_j) = g^n * w_ext^(n*j) - 1
    zh_cycle = []
    gn = pow(coset_gen, n, FR.p)
    for j in range(EXT_FACTOR):
        val = (gn * pow(dom_ext.omega, n * j, FR.p) - 1) % FR.p
        zh_cycle.append(pow(val, FR.p - 2, FR.p))
    zh_inv = jnp.tile(
        jnp.asarray(F.encode(FR, zh_cycle, mont=True)), (1, ext_n // EXT_FACTOR)
    )
    h_ev = F.mont_mul(FR, acc, zh_inv)
    h_coeffs_full = N.intt(dom_ext, h_ev)
    shaped = cpow_inv.reshape((L, ext_n))
    h_coeffs_full = F.mont_mul(FR, h_coeffs_full, shaped)
    h_chunks = [
        h_coeffs_full[:, i * n:(i + 1) * n]
        for i in range(PROTO.NUM_QUOT_CHUNKS)
    ]
    for i, hc in enumerate(h_chunks):
        polys[f"quot{i}"] = hc
    hq = jnp.stack(h_chunks, axis=1)
    for pt in commit_columns(srs, hq):
        tr.write_point(pt)

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
    xpows = {r: F.power_series(FR, _enc_mont_scalar(z), n)
             for r, z in points.items()}

    def eval_poly(coeffs, rot):
        prods = F.mont_mul(FR, coeffs, xpows[rot])
        return F.tree_sum_mod(FR, prods, axis=-1)

    evals = {}
    for name, rot in sched:
        ev = eval_poly(polys[name], rot)
        val = F.decode(FR, ev[:, None], mont=True)[0]
        evals[(name, rot)] = val
        tr.write_scalar(val)

    if debug:
        from . import verifier as VF_mod
        tail = h_coeffs_full[:, PROTO.NUM_QUOT_CHUNKS * n:]
        print("DEBUG h tail nonzero limbs:", int(jnp.sum(tail != 0)),
              "/", int(np.prod(tail.shape)))
        inst_x = VF_mod.instance_eval(inst_ints, x, k)
        acc_x = VF_mod.fold_constraints(
            pk.vk.shape, evals, gamma, beta_l, beta_p, gamma_p, y, x,
            inst_x, delta)
        zh_x = (pow(x, n, FR.p) - 1) % FR.p
        h_x = 0
        for i in range(PROTO.NUM_QUOT_CHUNKS):
            h_x = (h_x + pow(x, n * i, FR.p) * evals[(f"quot{i}", 0)]) % FR.p
        print("DEBUG identity F(x) == Z_H(x)h(x):", acc_x == zh_x * h_x % FR.p)

    v = tr.challenge()

    # ---- GWC multiopen: one witness poly per opening point -----------------
    w_commits = []
    for rot in PROTO.ROTATIONS:
        group = [(nm, r) for (nm, r) in sched if r == rot]
        if not group:
            continue
        comb = jnp.zeros((L, n), dtype=jnp.uint32)
        vw = 1
        combined_eval = 0
        for nm, r in group:
            wm = _enc_mont_scalar(vw)
            comb = F.add(FR, comb, F.mont_mul(
                FR, polys[nm], jnp.broadcast_to(wm[:, None], (L, n))))
            combined_eval = (combined_eval + vw * evals[(nm, r)]) % FR.p
            vw = vw * v % FR.p
        # subtract combined eval from constant term, divide by (X - z)
        ce = _enc_mont_scalar(combined_eval)
        comb = comb.at[:, 0].set(
            F.sub(FR, comb[:, 0:1], ce[:, None])[:, 0])
        z = points[rot]
        wpoly = _divide_linear(comb, z)
        w_commits.append(commit_columns(srs, wpoly[:, None])[0])
    for pt in w_commits:
        tr.write_point(pt)

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
    fixed_lag = N.ntt(dom, pk.fixed_coeffs)  # (L, NF, n)
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
            from .assembly import LOOKUP_GROUP as LG
            cols = range(g * LG, min((g + 1) * LG, nlk))
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
            from .assembly import PERM_CHUNK as PC
            z = z_lagrange[j]
            lhs, rhs = roll1(z), z
            fvc = N.ntt(dom, pk.fixed_coeffs[:, 0])
            for i in range(j * PC, min((j + 1) * PC, P)):
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


def _divide_linear(coeffs, z: int):
    """(f(X) - f(z))/(X - z) assuming f(z)'s constant adjustment already
    applied (i.e. coeffs encodes f with f(z) subtracted). Synthetic
    division: b_j = sum_{i > j} a_i z^(i-j-1), computed log-depth as
    b_j = z^(-j-1) * suffix_sum(a_i z^i)."""
    n = coeffs.shape[-1]
    zm = _enc_mont_scalar(z)
    zim = _enc_mont_scalar(pow(z, FR.p - 2, FR.p))
    zp = F.power_series(FR, zm, n)         # z^i
    zip_ = F.power_series(FR, zim, n + 1)  # z^-i
    azi = F.mont_mul(FR, coeffs, zp)
    # suffix sums S_j = sum_{i >= j} a_i z^i
    moved = jnp.moveaxis(azi, -1, 0)[:, :, None]

    def addop(xx, yy):
        return jnp.moveaxis(
            F.add(FR, jnp.moveaxis(xx, 1, 0), jnp.moveaxis(yy, 1, 0)), 0, 1
        )

    suf = jax.lax.associative_scan(addop, moved, reverse=True)[..., 0]
    suf = jnp.moveaxis(suf, 0, -1)  # (L, n)
    # b_j = z^{-(j+1)} * S_{j+1}; S_n = 0
    s_next = jnp.concatenate(
        [suf[:, 1:], jnp.zeros((L, 1), dtype=jnp.uint32)], axis=1
    )
    return F.mont_mul(FR, s_next, zip_[:, 1:])
