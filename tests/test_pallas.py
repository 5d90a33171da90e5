"""Pallas field-kernel bit-identity vs the jnp path (interpret mode).

On TPU these kernels are the default substrate (ops/pallas_field.py);
tests run on CPU, so correctness is pinned in pallas interpret mode on
small odd-sized batches (distinct shapes so jit caches can't alias the
non-interpret traces used by other tests).
"""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from zkfhe_tpu.ops import field as F
from zkfhe_tpu.ops import pallas_field as PF
from zkfhe_tpu.ops.field import FR


@pytest.fixture
def interp_env():
    os.environ["ZKFHE_PALLAS_INTERPRET"] = "1"
    yield
    os.environ.pop("ZKFHE_PALLAS_INTERPRET", None)


def _rand_pair(n, seed):
    rng = np.random.default_rng(seed)
    a = [int.from_bytes(rng.bytes(32), "little") % FR.p for _ in range(n)]
    b = [int.from_bytes(rng.bytes(32), "little") % FR.p for _ in range(n)]
    return (jnp.asarray(F.encode_ints_np(a)),
            jnp.asarray(F.encode_ints_np(b)))


N_ODD = 8193  # not a TILE multiple: exercises the pad/unpad path


def test_pallas_binary_ops_match_jnp(interp_env):
    a, b = _rand_pair(N_ODD, 0)
    got_mul = np.asarray(PF.mont_mul_pallas(FR, a, b))
    got_add = np.asarray(PF.add_pallas(FR, a, b))
    got_sub = np.asarray(PF.sub_pallas(FR, a, b))
    os.environ["ZKFHE_PALLAS"] = "0"
    try:
        ref_mul = np.asarray(F.mont_mul.__wrapped__(FR, a, b))
        ref_add = np.asarray(F.add.__wrapped__(FR, a, b))
        ref_sub = np.asarray(F.sub.__wrapped__(FR, a, b))
    finally:
        os.environ.pop("ZKFHE_PALLAS")
    assert np.array_equal(got_mul, ref_mul)
    assert np.array_equal(got_add, ref_add)
    assert np.array_equal(got_sub, ref_sub)


def test_pallas_butterfly_matches_composed(interp_env):
    u, v = _rand_pair(4097, 1)
    tw, _ = _rand_pair(4097, 2)
    hi, lo = PF.butterfly_pallas(FR, u, v, tw)
    os.environ["ZKFHE_PALLAS"] = "0"
    try:
        vw = F.mont_mul.__wrapped__(FR, v, tw)
        ref_hi = np.asarray(F.add.__wrapped__(FR, u, vw))
        ref_lo = np.asarray(F.sub.__wrapped__(FR, u, vw))
    finally:
        os.environ.pop("ZKFHE_PALLAS")
    assert np.array_equal(np.asarray(hi), ref_hi)
    assert np.array_equal(np.asarray(lo), ref_lo)


def test_dispatch_thresholds():
    # tiny batches never dispatch to pallas; big ones only on TPU/interp
    assert not PF.should_use(16)
    on = PF.should_use(1 << 20)
    assert on == PF.enabled()
