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
