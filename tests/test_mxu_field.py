"""MXU modular matmul vs host-int ground truth (runs on CPU: the int8
dot_general path is backend-agnostic; on TPU it rides the MXU)."""
import numpy as np
import jax.numpy as jnp

from zkfhe_tpu.ops import field as F
from zkfhe_tpu.ops import mxu_field as MX
from zkfhe_tpu.ops.field import FR


def _rand_mat(rng, rows, cols):
    vals = [[int.from_bytes(rng.bytes(32), "little") % FR.p
             for _ in range(cols)] for _ in range(rows)]
    enc = np.stack(
        [F.encode_ints_np(row) for row in vals], axis=1)  # (L, rows, cols)
    return vals, jnp.asarray(enc)


def test_mat_mul_mont_matches_host_ints():
    rng = np.random.default_rng(7)
    M, K, N = 3, 50, 4
    av, A = _rand_mat(rng, M, K)
    bv, B = _rand_mat(rng, K, N)
    out = np.asarray(MX.mat_mul_mont(FR, A, B))
    rinv = pow(1 << (F.LIMB_BITS * F.NLIMBS), FR.p - 2, FR.p)
    for m in range(M):
        for n_ in range(N):
            want = sum(av[m][k] * bv[k][n_] for k in range(K)) * rinv % FR.p
            got = F.limbs_to_int(out[:, m, n_])
            assert got == want, (m, n_)


def test_mat_mul_mont_equals_mont_mul_chain():
    """Montgomery semantics line up with mont_mul + tree_sum_mod."""
    rng = np.random.default_rng(8)
    M, K = 2, 33
    _, A = _rand_mat(rng, M, K)
    _, x = _rand_mat(rng, K, 1)
    got = np.asarray(MX.mat_vec_mont(FR, A, x[:, :, 0]))
    prods = F.mont_mul(FR, A, jnp.broadcast_to(x[:, None, :, 0], A.shape))
    ref = np.asarray(F.tree_sum_mod(FR, prods, axis=-1))
    assert np.array_equal(got, ref)


def test_planes_roundtrip():
    rng = np.random.default_rng(9)
    vals = [int.from_bytes(rng.bytes(32), "little") % FR.p
            for _ in range(17)]
    a = jnp.asarray(F.encode_ints_np(vals))
    planes = np.asarray(MX.to_planes7(a)).astype(np.uint64)
    for j, v in enumerate(vals):
        got = sum(int(planes[t, j]) << (7 * t)
                  for t in range(MX.NPLANES))
        assert got == v


def test_mont_reduce_wide_large_value():
    """Top-limb folding path: a value near the 2^546 design bound."""
    rng = np.random.default_rng(10)
    big = int.from_bytes(rng.bytes(68), "little") % (1 << 544)
    nl = 44
    limbs = np.zeros((nl, 1), np.uint32)
    t = big
    for i in range(nl):
        limbs[i, 0] = t & F.LIMB_MASK
        t >>= F.LIMB_BITS
    assert t == 0
    out = np.asarray(MX.mont_reduce_wide(FR, jnp.asarray(limbs)))
    rinv = pow(1 << (F.LIMB_BITS * F.NLIMBS), FR.p - 2, FR.p)
    assert F.limbs_to_int(out[:, 0]) == big * rinv % FR.p
