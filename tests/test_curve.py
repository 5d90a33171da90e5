"""G1 curve ops vs host python-int ground truth."""
import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zkfhe_tpu.ops import curve as C
from zkfhe_tpu.ops import field as F

random.seed(99)


def rand_points(n):
    return [C.G1_GEN.mul(random.randrange(1, F.FR.p)) for _ in range(n)]


def test_host_arith():
    g = C.G1_GEN
    assert g.on_curve()
    assert g.add(g).on_curve()
    assert g.mul(7).add(g.mul(5)) == g.mul(12)
    assert g.add(g.neg()).infinity
    assert g.mul(F.FR.p).infinity  # order of the group


def test_device_add():
    pts = rand_points(8)
    qts = rand_points(8)
    P = C.encode_points(pts)
    Q = C.encode_points(qts)
    R = jax.jit(C.point_add)(P, Q)
    got = C.decode_points(R)
    want = [a.add(b) for a, b in zip(pts, qts)]
    assert got == want


def test_device_add_edge_cases():
    g = C.G1_GEN
    pts = [g, g, C.AffinePoint(), g.mul(5), C.AffinePoint()]
    qts = [g, g.neg(), g.mul(3), C.AffinePoint(), C.AffinePoint()]
    P, Q = C.encode_points(pts), C.encode_points(qts)
    got = C.decode_points(jax.jit(C.point_add)(P, Q))
    want = [a.add(b) for a, b in zip(pts, qts)]
    assert got == want  # double, cancel-to-inf, inf+P, P+inf, inf+inf


def test_device_double():
    pts = rand_points(4) + [C.AffinePoint()]
    P = C.encode_points(pts)
    got = C.decode_points(jax.jit(C.point_double)(P))
    assert got == [a.add(a) for a in pts]


def test_mixed_add():
    pts = rand_points(6) + [C.G1_GEN, C.AffinePoint()]
    qts = rand_points(6) + [C.G1_GEN, C.G1_GEN]
    P = C.encode_points(pts)
    Q = C.encode_points(qts)  # affine with Z as validity flag
    got = C.decode_points(jax.jit(C.point_add_mixed)(P, Q))
    assert got == [a.add(b) for a, b in zip(pts, qts)]


def test_scalar_mul():
    pts = [C.G1_GEN, C.G1_GEN.mul(3), C.AffinePoint(), C.G1_GEN]
    scalars = [0, 12345, 7, F.FR.p - 1]
    nbits = 20
    bits = np.zeros((nbits, len(scalars)), dtype=np.uint32)
    small = [0, 12345, 7, 99]
    for j, s in enumerate(small):
        for i in range(nbits):
            bits[i, j] = (s >> i) & 1
    P = C.encode_points(pts)
    got = C.decode_points(C.scalar_mul(P, jnp.asarray(bits)))
    assert got == [p.mul(s) for p, s in zip(pts, small)]


def test_tree_reduce():
    pts = rand_points(13) + [C.AffinePoint()] * 3  # non-power-of-2 + infs
    P = C.encode_points(pts)
    got = C.decode_points(jax.jit(C.tree_reduce_points)(P))
    want = C.AffinePoint()
    for p in pts:
        want = want.add(p)
    assert got[0] == want
