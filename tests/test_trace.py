"""Trace IR: gate ops, range ops, mock checker — positive and negative."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from zkfhe_tpu.ops import field as F
from zkfhe_tpu.trace import builder as B
from zkfhe_tpu.trace import compile as TC
from zkfhe_tpu.trace import range_ops as R

FR = F.FR


def enc(xs):
    return jnp.asarray(F.encode(FR, xs))


def circuit_arith(bld, inputs):
    x = bld.load_witness(inputs["x"])
    y = bld.load_witness(inputs["y"])
    s = bld.add(x, y)
    d = bld.sub(x, y)
    p = bld.mul(x, y)
    e = bld.is_equal(x, y)
    n = bld.not_(e)
    o = bld.or_(e, n)
    bld.assert_const(o, 1)
    bld.expose_public(s)
    bld.expose_public(p)
    return s, d, p


def test_arith_circuit_mock():
    xs = [3, 5, 0, FR.p - 1]
    ys = [4, 5, 0, 1]
    inputs = {"x": enc(xs), "y": enc(ys)}
    layout = TC.trace_layout(circuit_arith, inputs)
    gamma = jnp.zeros((F.NLIMBS,), dtype=jnp.uint32)
    _, values, instance = TC.run_circuit(circuit_arith, inputs, gamma)
    TC.assert_satisfied(layout, values, gamma)
    inst = F.decode(FR, instance)
    assert inst[:4] == [(a + b) % FR.p for a, b in zip(xs, ys)]
    assert inst[4:] == [(a * b) % FR.p for a, b in zip(xs, ys)]


def test_mock_catches_bad_witness():
    xs, ys = [3], [4]
    inputs = {"x": enc(xs), "y": enc(ys)}
    layout = TC.trace_layout(circuit_arith, inputs)
    gamma = jnp.zeros((F.NLIMBS,), dtype=jnp.uint32)
    _, values, _ = TC.run_circuit(circuit_arith, inputs, gamma)
    # corrupt one phase-1 cell
    v1 = values[B.CTX_P1]
    v1 = v1.at[0, 3].add(1)
    tampered = (values[0], v1) + tuple(values[2:])
    res = TC.mock_check(layout, tampered, gamma, verbose=False)
    assert sum(len(v) for v in res.values()) > 0


def circuit_range(bld, inputs):
    x = bld.load_witness(inputs["x"])
    R.range_check(bld, x, 29)
    R.check_less_than_safe(bld, x, 536870909)
    lt = R.is_less_than(bld, x, 20, 32)
    bld.expose_public(lt)
    q, r = R.div_mod(bld, x, 7, 29)
    bld.expose_public(q)
    bld.expose_public(r)


def test_range_circuit():
    xs = [0, 19, 20, 536870908, 12345]
    inputs = {"x": enc(xs)}
    layout = TC.trace_layout(circuit_range, inputs)
    gamma = jnp.zeros((F.NLIMBS,), dtype=jnp.uint32)
    _, values, instance = TC.run_circuit(circuit_range, inputs, gamma)
    TC.assert_satisfied(layout, values, gamma)
    inst = F.decode(FR, instance)
    n = len(xs)
    assert inst[:n] == [1 if x < 20 else 0 for x in xs]
    assert inst[n:2 * n] == [x // 7 for x in xs]
    assert inst[2 * n:] == [x % 7 for x in xs]


def test_range_rejects_out_of_range():
    # value >= 2^29 must violate constraints when forced through
    xs = [1 << 29]
    inputs = {"x": enc(xs)}

    def circ(bld, inputs):
        x = bld.load_witness(inputs["x"])
        R.range_check(bld, x, 29)

    layout = TC.trace_layout(circ, inputs)
    gamma = jnp.zeros((F.NLIMBS,), dtype=jnp.uint32)
    _, values, _ = TC.run_circuit(circ, inputs, gamma)
    res = TC.mock_check(layout, values, gamma, verbose=False)
    assert sum(len(v) for v in res.values()) > 0


def circuit_rlc(bld, inputs):
    coeffs = bld.load_witness(inputs["a"])
    gamma_cell = bld.challenge_cell()
    pows = bld.powers(gamma_cell, coeffs.m)
    ev = bld.rlc_eval(coeffs, pows)
    bld.expose_public(ev)


def test_rlc_eval():
    coeffs = [5, 0, 3, 2]  # descending: 5x^3 + 3x + 2
    gamma_int = 11
    inputs = {"a": enc(coeffs)}
    layout = TC.trace_layout(circuit_rlc, inputs)
    gamma = jnp.asarray(F.encode(FR, [gamma_int]))[:, 0]
    _, values, instance = TC.run_circuit(circuit_rlc, inputs, gamma)
    TC.assert_satisfied(layout, values, gamma)
    want = (5 * gamma_int**3 + 3 * gamma_int + 2) % FR.p
    assert F.decode(FR, instance) == [want]


def test_challenge_pin_checked():
    inputs = {"a": enc([1, 2])}
    layout = TC.trace_layout(circuit_rlc, inputs)
    gamma = jnp.asarray(F.encode(FR, [11]))[:, 0]
    _, values, _ = TC.run_circuit(circuit_rlc, inputs, gamma)
    wrong = jnp.asarray(F.encode(FR, [12]))[:, 0]
    res = TC.mock_check(layout, values, wrong, verbose=False)
    assert len(res["challenge"]) > 0


def test_static_cell_bits_bound_witness():
    """Every cell's STATIC bit bound (CellVec.bits -> Layout.cell_bits,
    the witness-independent commitment-tier driver, VERDICT round-2
    weak #7) must upper-bound the actual witness value, on the full BFV
    circuit (n=16) with a real challenge."""
    import numpy as np
    from zkfhe_tpu.models import bfv

    params = bfv.BfvParams(n=16)
    cin = bfv.generate_input(params, seed=2)
    inputs = cin.to_arrays(params)
    circ = bfv.make_bfv_circuit(params)
    layout = TC.trace_layout(circ, inputs)
    gamma = jnp.asarray(F.encode(FR, [987654321]))[:, 0]
    _, values, _ = TC.run_circuit(circ, inputs, gamma)
    TC.assert_satisfied(layout, values, gamma)
    for ctx in range(B.NUM_CTX):
        if not values[ctx].shape[1]:
            continue
        bits = layout.cell_bits[ctx]
        dec = F.decode(FR, values[ctx])
        bad = [(i, v, int(bits[i])) for i, v in enumerate(dec)
               if v >= (1 << int(bits[i]))]
        assert not bad, f"ctx {ctx}: {bad[:5]}"


def test_assembly_col_bits():
    """Per-column bounds are the max over the column's cells and drive
    homogeneous commitment tiers."""
    import numpy as np
    from zkfhe_tpu.backend.assembly import assemble
    from zkfhe_tpu.models import bfv

    params = bfv.BfvParams(n=16)
    cin = bfv.generate_input(params, seed=2)
    inputs = cin.to_arrays(params)
    circ = bfv.make_bfv_circuit(params)
    layout = TC.trace_layout(circ, inputs)
    asm = assemble(layout, 10)
    assert asm.col_bits.shape == (asm.num_advice,)
    # phase-0 columns hold 29-bit BFV witnesses and <=68-bit hints
    assert all(0 < b <= 68 for b in asm.col_bits[:asm.num_p0_cols])
    # lookup columns hold bytes
    nlk = asm.num_lk_cols
    assert all(b == 8 for b in asm.col_bits[asm.num_advice - nlk:])
