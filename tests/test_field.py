"""Field arithmetic vs python-int ground truth (SURVEY.md §4: per-kernel
unit tests the reference lacks)."""
import random

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from zkfhe_tpu.ops import field as F

FIELDS = [F.FR, F.FQ]
random.seed(1234)


def rand_elems(field, n):
    return [random.randrange(field.p) for _ in range(n)]


@pytest.mark.parametrize("fld", FIELDS, ids=lambda f: f.name)
def test_limb_roundtrip(fld):
    xs = rand_elems(fld, 16) + [0, 1, fld.p - 1]
    arr = F.ints_to_array(xs)
    assert F.array_to_ints(arr) == xs


@pytest.mark.parametrize("fld", FIELDS, ids=lambda f: f.name)
def test_add_sub(fld):
    n = 64
    xs, ys = rand_elems(fld, n), rand_elems(fld, n)
    a, b = F.encode(fld, xs), F.encode(fld, ys)
    got_add = F.decode(fld, jax.jit(F.add, static_argnums=0)(fld, a, b))
    got_sub = F.decode(fld, jax.jit(F.sub, static_argnums=0)(fld, a, b))
    assert got_add == [(x + y) % fld.p for x, y in zip(xs, ys)]
    assert got_sub == [(x - y) % fld.p for x, y in zip(xs, ys)]


@pytest.mark.parametrize("fld", FIELDS, ids=lambda f: f.name)
def test_mont_mul(fld):
    n = 64
    xs, ys = rand_elems(fld, n), rand_elems(fld, n)
    # edge cases
    xs[:4] = [0, 1, fld.p - 1, fld.p - 1]
    ys[:4] = [fld.p - 1, fld.p - 1, fld.p - 1, 1]
    a = F.encode(fld, xs, mont=True)
    b = F.encode(fld, ys, mont=True)
    got = F.decode(fld, jax.jit(F.mont_mul, static_argnums=0)(fld, a, b), mont=True)
    assert got == [(x * y) % fld.p for x, y in zip(xs, ys)]


@pytest.mark.parametrize("fld", FIELDS, ids=lambda f: f.name)
def test_mont_roundtrip(fld):
    xs = rand_elems(fld, 32)
    a = F.encode(fld, xs)
    m = F.to_mont(fld, a)
    back = F.from_mont(fld, m)
    assert F.decode(fld, back) == xs
    assert F.decode(fld, m) == [fld.to_mont_int(x) for x in xs]


def test_inv():
    fld = F.FR
    xs = rand_elems(fld, 16) + [1, fld.p - 1, 0]
    a = F.encode(fld, xs, mont=True)
    got = F.decode(fld, jax.jit(F.inv, static_argnums=0)(fld, a), mont=True)
    want = [pow(x, fld.p - 2, fld.p) if x else 0 for x in xs]
    assert got == want


def test_batch_inv():
    fld = F.FR
    xs = rand_elems(fld, 33) + [0, 1, 0]  # include zeros mid-array
    a = F.encode(fld, xs, mont=True)
    got = F.decode(fld, jax.jit(F.batch_inv, static_argnums=0)(fld, a), mont=True)
    want = [pow(x, fld.p - 2, fld.p) if x else 0 for x in xs]
    assert got == want


def test_pow():
    fld = F.FR
    xs = rand_elems(fld, 8)
    e = 123456789
    bits = jnp.asarray([(e >> i) & 1 for i in range(e.bit_length())], dtype=jnp.uint32)
    a = F.encode(fld, xs, mont=True)
    got = F.decode(fld, F.mont_pow(fld, a, bits), mont=True)
    assert got == [pow(x, e, fld.p) for x in xs]


def test_select_iszero():
    fld = F.FR
    xs = [0, 5, 0, 7]
    a = F.encode(fld, xs)
    mask = np.asarray(F.is_zero(a))
    assert mask.tolist() == [True, False, True, False]


@pytest.mark.parametrize("fld", FIELDS, ids=lambda f: f.name)
def test_mont_reduce(fld):
    """mont_reduce(t) == t * R^-1 mod p for double-width 13-bit-limb
    inputs (the reduction half of mont_mul, used standalone by the
    device-side blinding sampler)."""
    rs = np.random.RandomState(7)
    t = rs.randint(0, 1 << F.LIMB_BITS,
                   size=(2 * F.NLIMBS, 33)).astype(np.uint32)
    t[-1] = 0  # precondition: t < p * R
    out = np.asarray(F.mont_reduce(fld, jnp.asarray(t)))
    r_inv = pow(1 << (F.LIMB_BITS * F.NLIMBS), fld.p - 2, fld.p)
    for j in range(t.shape[1]):
        u = sum(int(t[i, j]) << (F.LIMB_BITS * i)
                for i in range(2 * F.NLIMBS))
        got = sum(int(out[i, j]) << (F.LIMB_BITS * i)
                  for i in range(F.NLIMBS))
        assert got == u * r_inv % fld.p


def test_rand_mont():
    """Device-side uniform sampling: reduced, deterministic per key,
    distinct across keys/draws (backs prover._ProofRng)."""
    k1 = jax.random.key(11)
    a = np.asarray(F.rand_mont(F.FR, k1, (2, 3)))
    b = np.asarray(F.rand_mont(F.FR, k1, (2, 3)))
    c = np.asarray(F.rand_mont(F.FR, jax.random.key(12), (2, 3)))
    assert np.array_equal(a, b), "same key must reproduce"
    assert not np.array_equal(a, c)
    vals = [sum(int(a[i, r, s]) << (F.LIMB_BITS * i)
                for i in range(F.NLIMBS))
            for r in range(2) for s in range(3)]
    assert all(v < F.FR.p for v in vals)
    assert len(set(vals)) == len(vals)
