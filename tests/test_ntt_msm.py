"""NTT vs naive DFT and Pippenger MSM vs naive host sum (SURVEY.md §4)."""
import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zkfhe_tpu.ops import curve as C
from zkfhe_tpu.ops import field as F
from zkfhe_tpu.ops import msm as M
from zkfhe_tpu.ops import ntt as N

random.seed(4)
FR = F.FR


def test_root_of_unity():
    d = N.Domain.new(4)
    assert pow(d.omega, 16, FR.p) == 1
    assert pow(d.omega, 8, FR.p) != 1


def test_ntt_matches_naive_dft():
    k = 4
    n = 1 << k
    d = N.Domain.new(k)
    coeffs = [random.randrange(FR.p) for _ in range(n)]
    a = F.encode(FR, coeffs, mont=True)
    evals = F.decode(FR, N.ntt(d, a), mont=True)
    for i in [0, 1, 5, n - 1]:
        x = pow(d.omega, i, FR.p)
        want = sum(c * pow(x, j, FR.p) for j, c in enumerate(coeffs)) % FR.p
        assert evals[i] == want


def test_intt_roundtrip():
    d = N.Domain.new(5)
    coeffs = [random.randrange(FR.p) for _ in range(32)]
    a = F.encode(FR, coeffs, mont=True)
    back = F.decode(FR, N.intt(d, N.ntt(d, a)), mont=True)
    assert back == coeffs


def test_coset_roundtrip():
    d = N.Domain.new(4)
    g = 7
    coeffs = [random.randrange(FR.p) for _ in range(16)]
    a = F.encode(FR, coeffs, mont=True)
    ev = N.coset_ntt(d, a, g)
    # spot-check one coset evaluation
    evals = F.decode(FR, ev, mont=True)
    x = g * pow(d.omega, 3, FR.p) % FR.p
    want = sum(c * pow(x, j, FR.p) for j, c in enumerate(coeffs)) % FR.p
    assert evals[3] == want
    back = F.decode(FR, N.coset_intt(d, ev, g), mont=True)
    assert back == coeffs


def test_poly_mul():
    d = N.Domain.new(5)
    fa = [random.randrange(1 << 29) for _ in range(16)]
    fb = [random.randrange(1 << 29) for _ in range(16)]
    a = F.encode(FR, fa + [0] * 16, mont=True)
    b = F.encode(FR, fb + [0] * 16, mont=True)
    got = F.decode(FR, N.poly_mul(d, a, b), mont=True)
    want = [0] * 32
    for i, x in enumerate(fa):
        for j, y in enumerate(fb):
            want[i + j] += x * y
    assert got[:31] == [w for w in want[:31]]


def test_signed_digits():
    c = 8
    xs = [0, 1, 255, 256, ((1 << 254) - 3) % FR.p, FR.p - 1]
    s = jnp.asarray(F.encode(FR, xs))
    d = np.asarray(M.signed_digits(s, c))  # (W, n)
    for j, x in enumerate(xs):
        val = sum(int(d[w, j]) * (1 << (c * w)) for w in range(d.shape[0]))
        assert val == x, (j, x, val)
        assert np.abs(d[:, j]).max(initial=0) <= 1 << (c - 1)


def test_msm_small():
    n, K = 13, 3
    pts = [C.G1_GEN.mul(random.randrange(1, FR.p)) for _ in range(n)]
    scalars = [[random.randrange(FR.p) for _ in range(n)] for _ in range(K)]
    # include edge scalars
    scalars[0][0] = 0
    scalars[1][1] = FR.p - 1
    P = C.encode_points(pts)
    PX, PY = P[0], P[1]
    sc = jnp.stack([jnp.asarray(F.encode(FR, row)) for row in scalars], axis=1)
    out = M.msm((PX, PY), sc, c=8)
    got = C.decode_points(out)
    want = [M.msm_host(pts, row) for row in scalars]
    assert got == want


def test_msm_width_tiers():
    """Width-limited MSM (max_bits tiers) matches the full-width result
    for narrow scalars, across every tier."""
    n, K = 40, 2
    pts = [C.G1_GEN.mul(random.randrange(1, FR.p)) for _ in range(n)]
    P = C.encode_points(pts)
    PX, PY = P[0], P[1]
    for bits, _r in M.WIDTH_TIERS[:-1]:
        scalars = [[random.randrange(1 << bits) for _ in range(n)]
                   for _ in range(K)]
        scalars[0][0] = (1 << bits) - 1  # tier boundary value
        sc = jnp.stack([jnp.asarray(F.encode(FR, row)) for row in scalars],
                       axis=1)
        got = C.decode_points(M.msm((PX, PY), sc, max_bits=bits))
        want = [M.msm_host(pts, row) for row in scalars]
        assert got == want, f"tier {bits}"


def test_column_max_bits():
    vals = [[5, 1 << 30, 0], [0, 0, 0], [FR.p - 1, 1, 2]]
    sc = jnp.stack([jnp.asarray(F.encode(FR, row)) for row in vals], axis=1)
    mb = M.column_max_bits(sc)
    assert mb[0] >= 31 and mb[0] <= 39      # limb granularity
    assert mb[1] == 1                        # all-zero column
    assert mb[2] >= 254


@pytest.mark.slow
def test_msm_tab_matches_host():
    """Fixed-base table MSM (gather + tree reduce) vs naive host sum,
    across width tiers, edge scalars, and row offsets."""
    n, K = 24, 3
    pts = [C.G1_GEN.mul(random.randrange(1, FR.p)) for _ in range(n)]
    P = C.encode_points(pts)
    tab = M.build_table((P[0], P[1]))
    assert tab.windows == M.num_windows(tab.c, 256)

    for bits in M.TAB_TIERS:
        bound = FR.p if bits == 256 else (1 << bits)
        scalars = [[random.randrange(bound) for _ in range(n)]
                   for _ in range(K)]
        scalars[0][0] = 0
        scalars[1][1] = bound - 1
        sc = jnp.stack([jnp.asarray(F.encode(FR, row)) for row in scalars],
                       axis=1)
        got = C.decode_points(jnp.stack(M.msm_tab(tab, sc, max_bits=bits)))
        want = [M.msm_host(pts, row) for row in scalars]
        assert got == want, f"tier {bits}"


@pytest.mark.slow
def test_msm_tab_row_offset():
    """Sub-range commits (row_offset) match the host MSM over the slice,
    and main+tail splits recompose to the full-range commitment."""
    n = 16
    off, rows = 10, 6
    pts = [C.G1_GEN.mul(random.randrange(1, FR.p)) for _ in range(n)]
    P = C.encode_points(pts)
    tab = M.build_table((P[0], P[1]))
    scalars = [random.randrange(FR.p) for _ in range(n)]
    sc_tail = jnp.asarray(F.encode(FR, scalars[off:off + rows]))[:, None, :]
    got = C.decode_points(
        jnp.stack(M.msm_tab(tab, sc_tail, row_offset=off)))[0]
    want = M.msm_host(pts[off:off + rows], scalars[off:off + rows])
    assert got == want
    # main [0, off) + tail [off, n) == full
    sc_main = jnp.asarray(F.encode(FR, scalars[:off]))[:, None, :]
    main = C.decode_points(jnp.stack(M.msm_tab(tab, sc_main)))[0]
    sc_tail2 = jnp.asarray(F.encode(FR, scalars[off:]))[:, None, :]
    tail = C.decode_points(
        jnp.stack(M.msm_tab(tab, sc_tail2, row_offset=off)))[0]
    assert main.add(tail) == M.msm_host(pts, scalars)


@pytest.mark.slow
def test_msm_tab_affine_tree_matches_jacobian():
    """The batch-inverted affine tree reduction (ops/curve.
    tree_reduce_affine, the default table-MSM reducer) matches the
    complete-Jacobian tree bit for bit, including zero scalars
    (infinity lanes), p-1 (negation) and narrow tiers."""
    import random
    from zkfhe_tpu.ops import msm as M
    random.seed(31)
    pts = [C.G1_GEN.mul(i + 5) for i in range(11)]
    P_ = C.encode_points(pts)
    tab = M.build_table((P_[0], P_[1]), max_bits=256)
    scal = [random.randrange(FR.p) for _ in range(11)]
    scal[2] = 0
    scal[5] = FR.p - 1
    sc = jnp.asarray(F.encode(FR, scal)).reshape(F.NLIMBS, 1, 11)
    for mb, ss in ((256, scal), (32, [s % (1 << 32) for s in scal])):
        sa = jnp.asarray(F.encode(FR, ss)).reshape(F.NLIMBS, 1, 11)
        jac = M._j_msm_tab(tab.XY, sa, tab.c, tab.windows, mb, 0)
        got = C.decode_points(
            (np.asarray(jac[0]), np.asarray(jac[1]), np.asarray(jac[2])))[0]
        assert got == M.msm_host(pts, ss)
    # A/B: affine vs jacobian reducer produce the same group elements
    jac2 = M._j_msm_tab(tab.XY, sc, tab.c, tab.windows, 256, 0, "jacobian")
    gj = C.decode_points((np.asarray(jac2[0]), np.asarray(jac2[1]),
                          np.asarray(jac2[2])))[0]
    assert gj == M.msm_host(pts, scal)
