"""Multi-chip parallelism (SURVEY.md §2.3 — the framework's DP/TP/SP):

  * batched proving      — "data parallel": vmapped witness generation /
    constraint checking over a batch of independent BFV instances, batch
    axis sharded over the mesh (BASELINE configs item 4);
  * sharded MSM          — "tensor parallel": SRS points and scalars split
    across chips, per-chip Pippenger partials combined with an all_gather
    + local Jacobian tree-reduction over ICI (BASELINE configs item 5);
  * distributed NTT      — "sequence parallel": Cooley-Tukey four-step
    with local column NTTs and one all_to_all transpose per stage.

All collectives are XLA collectives under shard_map over a
jax.sharding.Mesh — the TPU-native equivalent of the NCCL layer the
reference never had (it is rayon-only, SURVEY.md §2.3).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.8
    from jax import shard_map as _shard_map
    shard_map = functools.partial(_shard_map)
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..ops import curve as C
from ..ops import field as F
from ..ops import msm as M
from ..ops import ntt as N
from ..ops.field import FR

L = F.NLIMBS


def default_mesh(axis: str = "chips", devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


# ---------------------------------------------------------------------------
# Sharded MSM
# ---------------------------------------------------------------------------

def sharded_msm(points, scalars, mesh: Mesh, axis: str = "chips",
                c: int = M.DEFAULT_C):
    """MSM with the POINT axis sharded across the mesh.

    points: (X, Y) affine (L, n); scalars (L, K, n). Each chip runs a
    local Pippenger over its point shard; the K Jacobian partials are
    all_gathered and tree-reduced locally (EC addition is not a psum, so
    the combine is an explicit gather + log-depth point_add tree).
    """
    nd = mesh.shape[axis]

    def local(px, py, sc):
        part = M.msm((px[0], py[0]), sc[0], c=c)  # (L, K) jacobian
        stacked = jnp.stack(part, axis=0)  # (3, L, K)
        allp = jax.lax.all_gather(stacked, axis)  # (nd, 3, L, K)
        acc = tuple(allp[0, i] for i in range(3))
        for d in range(1, nd):
            acc = C.point_add(acc, tuple(allp[d, i] for i in range(3)))
        return jnp.stack(acc, axis=0)[None]

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(None, None, axis), P(None, None, axis),
                  P(None, None, None, axis)),
        out_specs=P(None),
        # the all_gather + identical tree-reduce replicates the result on
        # every chip, but the vma checker can't infer that through the
        # branch-free EC adds
        check_vma=False,
    )
    # add a leading wrapper axis so each shard sees [0]-indexable blocks
    out = fn(points[0][None], points[1][None], scalars[None])
    return tuple(out[0, i] for i in range(3))


# ---------------------------------------------------------------------------
# Distributed four-step NTT
# ---------------------------------------------------------------------------

def _twiddle_matrix(field, n1: int, n2: int, omega: int):
    """(L, n1, n2) Montgomery twiddles w^(i*j) for the four-step NTT."""
    rows = []
    for i in range(n1):
        base = pow(omega, i, field.p)
        row = [1] * n2
        for j in range(1, n2):
            row[j] = row[j - 1] * base % field.p
        rows.append([field.to_mont_int(v) for v in row])
    flat = [v for row in rows for v in row]
    return F.encode_ints_np(flat).reshape(L, n1, n2)


def distributed_ntt(x, k: int, mesh: Mesh, axis: str = "chips"):
    """NTT of size 2^k sharded over the mesh (Bailey four-step).

    Derivation: view x as A[i1][i2] with i = i1*n2 + i2. For
    j = j2*n1 + j1:
        NTT(x)[j2*n1 + j1]
          = sum_{i2} w^{j1*i2} * w_{n2}^{i2*j2} * sum_{i1} A[i1][i2] w_{n1}^{i1*j1}
    i.e. (1) size-n1 NTTs over COLUMNS (local when i2 is the sharded
    axis), (2) twiddle w^{j1*i2}, (3) one all_to_all transpose so each
    chip owns full rows, (4) size-n2 NTTs over ROWS. One cross-chip
    exchange total. x: (L, n) Montgomery; returns natural-order evals
    (bit-identical to ops/ntt.ntt — see tests/test_parallel.py).
    """
    n = 1 << k
    nd = mesh.shape[axis]
    k1 = max(k // 2, (nd - 1).bit_length())
    assert (1 << k1) % nd == 0 and (n >> k1) % nd == 0
    n1 = 1 << k1
    n2 = n // n1
    dom = N.Domain.new(k)
    dom1 = N.Domain.new(k1)
    dom2 = N.Domain.new(k - k1)
    tw = jnp.asarray(_twiddle_matrix(FR, n1, n2, dom.omega))  # tw[j1][i2]

    A = x.reshape(L, n1, n2)  # A[i1][i2]
    n1l, n2l = n1 // nd, n2 // nd

    def local(a, tws):
        a = a[0]  # (L, n1, n2/nd): full columns, i2-shard
        b = N.ntt(dom1, a.transpose(0, 2, 1)).transpose(0, 2, 1)
        c = F.mont_mul(FR, b, tws[0])  # B[j1][i2] * w^(j1*i2)
        # transpose: send row-block s to chip s
        c = c.reshape(L, nd, n1l, n2l)
        r = jax.lax.all_to_all(c, axis, split_axis=1, concat_axis=0,
                               tiled=False)
        # r: (nd_src, L, n1l, n2l); source chip d held columns block d
        r = jnp.moveaxis(r, 0, 2)  # (L, n1l, nd, n2l)
        r = r.reshape(L, n1l, n2)  # full rows j1 for this chip
        d = N.ntt(dom2, r)  # rows: out[j1][j2]
        return d[None]

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(None, None, None, axis), P(None, None, None, axis)),
        out_specs=P(None, None, axis, None),
    )
    O = fn(A[None], tw[None])[0]  # (L, n1, n2), O[j1][j2] = X[j2*n1+j1]
    return O.transpose(0, 2, 1).reshape(L, n)


# ---------------------------------------------------------------------------
# Batched (data-parallel) proving primitives
# ---------------------------------------------------------------------------

def batched_witgen(circuit_fn, mesh: Mesh, axis: str = "chips"):
    """vmapped witness generator with the batch axis sharded on the mesh.
    Returns a jitted fn: (batched_inputs, batched_gamma) -> batched trace
    values. 64-proof batches on one host = BASELINE configs item 4."""
    from ..trace.compile import run_circuit

    def single(inputs, gamma):
        _, values, instance = run_circuit(circuit_fn, inputs, gamma)
        return values, instance

    vm = jax.vmap(single, in_axes=(0, 0))

    def sharded(batched_inputs, batched_gamma):
        spec_in = jax.tree.map(lambda _: P(axis), batched_inputs)
        batched_inputs = jax.lax.with_sharding_constraint(
            batched_inputs,
            jax.tree.map(lambda s: NamedSharding(mesh, s), spec_in),
        )
        return vm(batched_inputs, batched_gamma)

    return jax.jit(sharded)
