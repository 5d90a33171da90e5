"""BFV encryption circuit end-to-end in mock mode (SURVEY.md §7 step 4:
the minimum slice — the flagship model running on the trace IR)."""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from zkfhe_tpu.models import bfv
from zkfhe_tpu.models.poly import Poly
from zkfhe_tpu.ops import field as F
from zkfhe_tpu.trace import compile as TC

FR = F.FR
DATA = os.path.join(os.path.dirname(__file__), "..", "data", "bfv")

SMALL = bfv.BfvParams(n=16, q=536870909, t=7, b=19)


import functools


@functools.lru_cache(maxsize=4)
def _compiled(params):
    """Share circuit closure / layout / jitted witgen across tests (the
    compile is the dominant cost on CPU)."""
    circuit = bfv.make_bfv_circuit(params)
    return circuit, {}


def run_mock(params, cin, tamper=None):
    inputs = cin.to_arrays(params)
    if tamper:
        inputs = dict(inputs)
        inputs[tamper] = inputs[tamper].at[0, 0].add(1)
    circuit, cache = _compiled(params)
    if "layout" not in cache:
        cache["layout"] = TC.trace_layout(circuit, inputs)
        cache["witgen"] = TC.make_witgen(circuit)
    layout = cache["layout"]
    gamma = jnp.asarray(F.encode(FR, [0x1234567890ABCDEF]))[:, 0]
    values, instance = cache["witgen"](inputs, gamma)
    res = TC.mock_check(layout, values, gamma, verbose=False)
    nbad = sum(len(v) for v in res.values())
    return layout, values, instance, nbad


def test_small_params_mock_passes():
    cin = bfv.generate_input(SMALL, seed=3)
    layout, values, instance, nbad = run_mock(SMALL, cin)
    assert nbad == 0
    # instance = pk0 | pk1 | c0 | c1 | cyclo
    inst = F.decode(FR, instance)
    assert len(inst) == 4 * SMALL.n + SMALL.n + 1
    assert inst[: SMALL.n] == [int(x) for x in cin.pk0]
    assert inst[-(SMALL.n + 1):] == [int(x) for x in cin.cyclo]


def test_small_params_mock_catches_bad_ciphertext():
    cin = bfv.generate_input(SMALL, seed=4)
    # corrupt c0's leading coefficient
    cin.c0[0] = str((int(cin.c0[0]) + 1) % SMALL.q)
    _, _, _, nbad = run_mock(SMALL, cin)
    assert nbad > 0


def test_small_params_mock_catches_bad_u_distribution():
    cin = bfv.generate_input(SMALL, seed=5)
    cin.u[0] = "2"  # not in {0, 1, q-1}
    # recompute nothing: even if ciphertext matched, chi-key must fail
    _, _, _, nbad = run_mock(SMALL, cin)
    assert nbad > 0


def test_overflow_guard_fires():
    # a parameter set whose growth formulas overflow the field must raise
    # at layout time (keygen-fails behavior, reference README.md:67)
    bad = bfv.BfvParams(n=1024, q=(1 << 126) - 137, t=7, b=19)
    cin = bfv.generate_input(bfv.BfvParams(n=4, q=17, t=3, b=2), seed=0)
    circuit = bfv.make_bfv_circuit(bad)
    with pytest.raises(AssertionError):
        # inputs don't matter; the static max_bits asserts fire during trace
        inputs = {
            k: jnp.zeros((F.NLIMBS, bad.n), dtype=jnp.uint32)
            for k in ("pk0", "pk1", "m", "u", "e0", "e1", "c0", "c1")
        }
        inputs["cyclo"] = jnp.zeros((F.NLIMBS, bad.n + 1), dtype=jnp.uint32)
        TC.trace_layout(circuit, inputs)


def test_host_poly_parity():
    # divide_by_cyclo vs device fold on random data
    import random
    random.seed(11)
    n, q = 8, 536870909
    qb = q.bit_length()
    d = [random.randrange(q) for _ in range(2 * n - 1)]
    cyclo = Poly.from_ints([1] + [0] * (n - 1) + [1], qb)
    quot, rem = Poly.from_ints(d, qb).divide_by_cyclo(cyclo, q)
    dd = jnp.asarray(F.ints_to_array(d))
    qd, rd = bfv.divide_by_cyclo_device(dd, n, q)
    assert F.decode(FR, qd) == quot.coefficients
    assert F.decode(FR, rd) == rem.coefficients
    # and the defining identity holds: d = q*cyclo + r (mod Q)
    qc = quot.mul(cyclo)
    recon = [
        (a + b) % q
        for a, b in zip(qc.coefficients, rem.coefficients)
    ]
    assert recon[2:] == [x % q for x in d]


@pytest.mark.slow
def test_reference_vector_mock():
    """Golden vector from the reference repo (data/bfv/bfv.in): full
    N=1024 circuit satisfied in mock mode."""
    cin = bfv.CircuitInput.from_json(os.path.join(DATA, "bfv.in"))
    params = bfv.BfvParams()
    layout, values, instance, nbad = run_mock(params, cin)
    assert nbad == 0
    assert layout.num_instance == 5121  # examples/bfv.rs:118-122


def test_larger_params_mock():
    """Bigger ring + 61-bit modulus (BASELINE item 3 direction: parameters
    beyond the reference's compile-time N=1024/Q=2^29-3). Q up to ~121
    bits fits the single-limb growth budget (2*q_bits + log2(n) < 254);
    beyond that needs RNS limbs (future work)."""
    big = bfv.BfvParams(n=64, q=(1 << 61) - 1, t=7, b=19)
    cin = bfv.generate_input(big, seed=9)
    _, _, _, nbad = run_mock(big, cin)
    assert nbad == 0


@pytest.mark.slow
def test_120bit_q_mock():
    """The k=15 bench configuration's modulus (scripts/bench_k15.py:
    N=2048, Q=2^120-119) at a CPU-tractable ring size: the widest
    div_mod/range paths (252-bit products, 133-bit quotients) and their
    static tier bounds all hold."""
    big = bfv.BfvParams(n=256, q=(1 << 120) - 119, t=7, b=19)
    cin = bfv.generate_input(big, seed=12)
    layout, values, _, nbad = run_mock(big, cin)
    assert nbad == 0
    for ctx in range(len(values)):
        if not values[ctx].shape[1]:
            continue
        bits = layout.cell_bits[ctx]
        dec = F.decode(FR, values[ctx])
        assert all(v < (1 << int(bits[i])) for i, v in enumerate(dec))
