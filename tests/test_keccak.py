"""KeccakChip tests: host model vs canonical digests, single-round chip
vs host model (fast), full keccak256 circuit vs host model (slow), and a
negative mock check. Mirrors the reference's chip surface
(/root/reference/examples/bfv.rs:1,66; configs/bfv.json:17)."""
import numpy as np
import jax.numpy as jnp
import pytest

from zkfhe_tpu.models import keccak_host as KH
from zkfhe_tpu.models.keccak import KeccakChip
from zkfhe_tpu.ops import field as F
from zkfhe_tpu.trace import compile as TC


def test_host_model_golden():
    assert KH.keccak256(b"").hex() == (
        "c5d2460186f7233c927e7db2dcc703c0"
        "e500b653ca82273b7bfad8045d85a470")
    assert KH.keccak256(b"abc").hex() == (
        "4e03657aea45a94fc7d47ba826c8d667"
        "c0d1e6e33a64a036ec44f58fa12d6c45")
    # multi-block (200 bytes > 136-byte rate) exercises absorb chaining
    assert len(KH.keccak256(b"x" * 200)) == 32


def _run(circuit_fn, inputs):
    layout = TC.trace_layout(circuit_fn, inputs)
    gamma = jnp.zeros((F.NLIMBS,), dtype=jnp.uint32)
    _, values, instance = TC.run_circuit(circuit_fn, inputs, gamma)
    return layout, values, instance


def test_keccak_single_round_chip():
    rng = np.random.RandomState(7)
    lanes = [int.from_bytes(rng.bytes(8), "little") for _ in range(25)]
    bits = np.asarray(KH.bits_of_lanes(lanes))
    want = KH.keccak_round(lanes, KH.RC[0])

    def circuit(bld, inputs):
        chip = KeccakChip(bld)
        st = chip.load_bits(inputs["bits"])
        out = chip.keccak_round(st, KH.RC[0])
        bld.expose_public(out)

    layout, values, instance = _run(
        circuit, {"bits": jnp.asarray(bits, dtype=jnp.uint32)})
    TC.assert_satisfied(layout, values, gamma=jnp.zeros(
        (F.NLIMBS,), dtype=jnp.uint32))
    got = KH.lanes_of_bits([int(x) for x in np.asarray(instance[0])])
    assert got == want


def test_keccak_round_mock_catches_tamper():
    rng = np.random.RandomState(8)
    lanes = [int.from_bytes(rng.bytes(8), "little") for _ in range(25)]
    bits = np.asarray(KH.bits_of_lanes(lanes))

    def circuit(bld, inputs):
        chip = KeccakChip(bld)
        st = chip.load_bits(inputs["bits"])
        bld.expose_public(chip.keccak_round(st, KH.RC[3]))

    from zkfhe_tpu.trace.builder import CTX_P1
    layout, values, _ = _run(
        circuit, {"bits": jnp.asarray(bits, dtype=jnp.uint32)})
    # flip one trace cell: some gate/copy/constant must fire
    values = list(values)
    values[CTX_P1] = values[CTX_P1].at[0, 12345].add(1)
    res = TC.mock_check(layout, tuple(values),
                        jnp.zeros((F.NLIMBS,), dtype=jnp.uint32),
                        verbose=False)
    assert any(len(v) for v in res.values())


@pytest.mark.slow
def test_keccak256_empty_message_circuit():
    want = KH.keccak256(b"")
    want_words = [int.from_bytes(want[4 * w:4 * w + 4], "little")
                  for w in range(8)]

    def circuit(bld, inputs):
        chip = KeccakChip(bld)
        _, words = chip.keccak256(None, 0)
        bld.expose_public(words)

    layout, values, instance = _run(circuit, {})
    TC.assert_satisfied(layout, values, gamma=jnp.zeros(
        (F.NLIMBS,), dtype=jnp.uint32))
    got_words = F.decode(F.FR, instance)
    assert [int(w) for w in got_words] == want_words
