"""End-to-end SNARK backend: keygen -> prove -> verify on a small circuit
exercising every argument (gates, challenge/RLC, lookups, permutation)."""
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.e2e

from zkfhe_tpu.backend import keygen as KG
from zkfhe_tpu.backend import prover as PV
from zkfhe_tpu.backend import srs as SRS
from zkfhe_tpu.backend import verifier as VF
from zkfhe_tpu.ops import field as F
from zkfhe_tpu.trace import compile as TC
from zkfhe_tpu.trace import range_ops as R

FR = F.FR
K = 9


def circuit(bld, inputs):
    x = bld.load_witness(inputs["x"])       # phase 0
    y = bld.load_witness(inputs["y"])
    s = bld.add(x, y)
    p = bld.mul(x, y)
    R.range_check(bld, s, 29)               # lookup path
    q, _r = R.div_mod(bld, p, 97, 58)
    g = bld.challenge_cell()                # challenge + RLC path
    pows = bld.powers(g, x.m)
    ev = bld.rlc_eval(x, pows)              # constrained but not exposed:
    # instance cells must be challenge-independent (they are hashed into
    # the transcript before gamma is squeezed), as in the reference where
    # all publics are phase-0 polynomials (examples/bfv.rs:118-122)
    bld.expose_public(s)
    bld.expose_public(q)


def make_inputs(xs, ys):
    return {
        "x": jnp.asarray(F.encode(FR, xs)),
        "y": jnp.asarray(F.encode(FR, ys)),
    }


@pytest.fixture(scope="module")
def setup():
    inputs = make_inputs([3, 5, 250000000], [4, 6, 260000000])
    srs = SRS.generate(K)
    pk = KG.keygen(circuit, inputs, K, srs)
    proof = PV.prove(pk, srs, circuit, inputs, rng_seed=b"test-seed")
    gamma0 = jnp.zeros((F.NLIMBS,), dtype=jnp.uint32)
    _, _, instance = TC.run_circuit(circuit, inputs, gamma0)
    inst = F.decode(FR, instance)
    return inputs, srs, pk, proof, inst


def test_keygen_shapes(setup):
    _, _, pk, _, _ = setup
    assert pk.vk.shape["num_advice"] >= 2
    assert pk.vk.shape["num_lk_cols"] >= 1
    assert len(pk.vk.fixed_commits) == len(
        __import__("zkfhe_tpu.backend.protocol", fromlist=["x"]
                   ).fixed_poly_names(pk.vk.shape))


def test_prove_verify_roundtrip(setup):
    _, _, pk, proof, inst = setup
    assert VF.verify(pk.vk, proof, inst)


def test_verify_rejects_tampered_proof(setup):
    _, _, pk, proof, inst = setup
    bad = bytearray(proof)
    bad[100] ^= 1
    assert not VF.verify(pk.vk, bytes(bad), inst)


def test_verify_rejects_wrong_instance(setup):
    _, _, pk, proof, inst = setup
    bad_inst = list(inst)
    bad_inst[0] = (bad_inst[0] + 1) % FR.p
    assert not VF.verify(pk.vk, proof, bad_inst)


def test_prove_batch(setup):
    """The vmapped batched prover (backend/batch.py: the whole pipeline
    carries a proof axis; commitments fold proofs into the MSM column
    axis) produces proofs BYTE-IDENTICAL to the serial prover with the
    same rng seeds, and both verify."""
    from zkfhe_tpu.backend import batch as BT
    inputs, srs, pk, proof_serial, inst = setup
    inputs2 = make_inputs([7, 9, 11], [13, 15, 17])
    proofs = BT.prove_batch(pk, srs, circuit, [inputs, inputs2],
                            rng_seeds=[b"test-seed", b"b"])
    assert len(proofs) == 2 and proofs[0] != proofs[1]
    # proof 0 reuses the setup fixture's seed: must match serial bytes
    assert proofs[0] == proof_serial
    assert VF.verify(pk.vk, proofs[0], inst)
    gamma0 = jnp.zeros((F.NLIMBS,), dtype=jnp.uint32)
    _, _, instance2 = TC.run_circuit(circuit, inputs2, gamma0)
    assert VF.verify(pk.vk, proofs[1], F.decode(FR, instance2))


def test_prove_stream(setup):
    """The pipeline-parallel prover (parallel/pipeline.py: a depth-2
    round-robin over prover._prove_gen generators, overlapping one
    proof's commit MSMs/transcript hashing with the next proof's device
    stages) is a pure scheduling change: proof bytes are identical to
    serial prove() with the same rng seeds, and all proofs verify."""
    from zkfhe_tpu.parallel.pipeline import prove_stream
    inputs, srs, pk, proof_serial, inst = setup
    inputs2 = make_inputs([8, 10, 12], [14, 16, 18])
    proofs = prove_stream(pk, srs, circuit, [inputs, inputs2],
                          rng_seeds=[b"test-seed", b"s2"], depth=2)
    assert len(proofs) == 2 and proofs[0] != proofs[1]
    # proof 0 reuses the setup fixture's seed: must match serial bytes
    assert proofs[0] == proof_serial
    assert VF.verify(pk.vk, proofs[0], inst)
    gamma0 = jnp.zeros((F.NLIMBS,), dtype=jnp.uint32)
    _, _, instance2 = TC.run_circuit(circuit, inputs2, gamma0)
    assert VF.verify(pk.vk, proofs[1], F.decode(FR, instance2))


def test_commit_lagrange_matches_coefficient(setup):
    """Evaluation-form (Lagrange-basis, width-tiered) commitment produces
    the same group elements as coefficient-form commitment."""
    from zkfhe_tpu.ops import ntt as N
    import random as _r
    rng = _r.Random(7)
    _, srs, _, _, _ = setup
    n = 1 << K
    u = n - 10
    # 8 narrow columns (one width-sorted narrow-tier group) + 2 full-width
    # columns (full-tier group), all with full-width blinding tails: covers
    # both MSM tiers, the width sort, and the shared blind-tail MSM.
    cols = []
    for width in (8, 29, 40, 52, 13, 29, 40, 52, 254, 254):
        col = [rng.randrange(1 << width) % FR.p for _ in range(u)]
        col += [rng.randrange(FR.p) for _ in range(n - u)]
        cols.append(col)
    evals = F.to_mont(FR, jnp.stack(
        [jnp.asarray(F.encode(FR, c)) for c in cols], axis=1))
    dom = N.Domain.new(K)
    want = KG.commit_columns(srs, N.intt(dom, evals))
    got = KG.commit_columns_lagrange(srs.g1_lag, evals, u)
    assert got == want


def test_commit_table_matches_coefficient(setup):
    """Fixed-base table commits (the default path) produce the same group
    elements as coefficient-form scan commits, including the width-tier
    grouping and the shared blind-tail launch."""
    from zkfhe_tpu.ops import ntt as N
    import random as _r
    rng = _r.Random(11)
    _, srs, pk, _, _ = setup
    n = 1 << K
    u = pk.asm.u
    cols = []
    for width in (8, 29, 40, 52, 13, 29, 254, 254, 60, 200):
        col = [rng.randrange(1 << width) % FR.p for _ in range(u)]
        col += [rng.randrange(FR.p) for _ in range(n - u)]
        cols.append(col)
    evals = F.to_mont(FR, jnp.stack(
        [jnp.asarray(F.encode(FR, c)) for c in cols], axis=1))
    dom = N.Domain.new(K)
    want = KG.commit_columns(srs, N.intt(dom, evals))
    committer = KG.Committer(srs, n, u)
    assert committer.commit_values(evals) == want
    # coefficient-form entry point (used for quotient/W/random polys)
    coeffs = N.intt(dom, evals)
    assert committer.commit_coeffs(coeffs, dom) == want


def test_verify_rejects_wrong_vk(setup):
    """The vk digest is bound into the transcript: a proof must not
    verify against a different circuit's vk (VERDICT round-1 weak #8)."""
    import dataclasses as _dc
    from zkfhe_tpu.ops import curve as C
    _, _, pk, proof, inst = setup
    vk2 = _dc.replace(pk.vk, fixed_commits=list(pk.vk.fixed_commits))
    vk2.fixed_commits[0] = C.G1_GEN  # valid point, wrong circuit
    assert not VF.verify(vk2, proof, inst)


def test_verify_rejects_malformed_proofs(setup):
    """Strict deserialization: trailing bytes, truncation, non-canonical
    coordinates and off-curve points are all rejected (ADVICE.md round-1
    high/medium). Points are 32-byte compressed (x + parity/infinity
    flag bits), so "off-curve" means x^3 + 3 is a non-residue."""
    q = F.BN254_FQ
    _, _, pk, proof, inst = setup
    assert not VF.verify(pk.vk, proof + b"\x00", inst)
    assert not VF.verify(pk.vk, proof[:-10], inst)
    # non-canonical x coordinate (x = q) in the first commitment
    bad = bytearray(proof)
    bad[0:32] = q.to_bytes(32, "little")
    assert not VF.verify(pk.vk, bytes(bad), inst)
    # x whose x^3 + 3 is a quadratic non-residue (no curve point)
    x = next(x for x in range(2, 100)
             if pow(x**3 + 3, (q - 1) // 2, q) != 1)
    bad = bytearray(proof)
    bad[0:32] = x.to_bytes(32, "little")
    assert not VF.verify(pk.vk, bytes(bad), inst)
    # malformed infinity encoding (infinity flag with nonzero x)
    bad = bytearray(proof)
    bad[0:31] = (1).to_bytes(31, "little")
    bad[31] = 0x40
    assert not VF.verify(pk.vk, bytes(bad), inst)


def test_fault_injection_ladder(setup):
    """bench.py's retry ladder depends on two facts kept true here:
    (1) ZKFHE_FAULT=commit makes the default-config prove fail,
    (2) setting ZKFHE_MSM_TREE explicitly — exactly what the ladder's
    retry does — clears the fault and yields a verifying proof
    (VERDICT r3 next #6: kill-test the recovery path)."""
    import os
    inputs, srs, pk, _, inst = setup
    if KG.make_committer(srs, pk.asm.n, pk.asm.u) is None:
        pytest.skip("table committer disabled in this configuration")
    old_fault = os.environ.get("ZKFHE_FAULT")
    old_tree = os.environ.get("ZKFHE_MSM_TREE")
    try:
        os.environ["ZKFHE_FAULT"] = "commit"
        os.environ.pop("ZKFHE_MSM_TREE", None)
        with pytest.raises(RuntimeError, match="injected commit fault"):
            PV.prove(pk, srs, circuit, inputs, rng_seed=b"fault")
        os.environ["ZKFHE_MSM_TREE"] = "jacobian"
        proof = PV.prove(pk, srs, circuit, inputs, rng_seed=b"fault")
        assert VF.verify(pk.vk, proof, inst)
    finally:
        for key, val in (("ZKFHE_FAULT", old_fault),
                         ("ZKFHE_MSM_TREE", old_tree)):
            if val is None:
                os.environ.pop(key, None)
            else:
                os.environ[key] = val
