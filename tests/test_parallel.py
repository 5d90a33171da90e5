"""Multi-chip paths on the virtual 8-device CPU mesh (conftest forces
xla_force_host_platform_device_count=8): sharded MSM, distributed NTT,
batched witness generation."""
import random

import numpy as np
import jax
import jax.numpy as jnp
import pytest

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
        for ctx in range(3):
            assert np.array_equal(np.asarray(values[ctx][i]),
                                  np.asarray(v_single[ctx])), (i, ctx)
        assert np.array_equal(np.asarray(instance[i]),
                              np.asarray(inst_single))
