"""Batched proving (BASELINE configs item 4: many independent BFV proofs
on one host).

Each proof keeps its own Fiat-Shamir transcript (they are independent
statements), so the batch dimension lives INSIDE the device kernels:
after the first proof compiles every stage executable, subsequent proofs
are pure warm device calls. `prove_batch` amortizes exactly that; the
deeper cross-proof fusion (vmapping whole stages over the proof axis) is
layered on the same stage kernels via parallel.sharding.batched_witgen.
"""
from __future__ import annotations

from . import prover as PV
from .keygen import ProvingKey
from .srs import SRS


def prove_batch(pk: ProvingKey, srs: SRS, circuit_fn, inputs_list,
                rng_seeds=None) -> list[bytes]:
    """Prove a batch of independent instances against one proving key.

    The first call compiles all stage kernels; the rest reuse them. With
    a data-parallel mesh, combine with parallel.sharding.batched_witgen.
    """
    proofs = []
    for i, inputs in enumerate(inputs_list):
        seed = None if rng_seeds is None else rng_seeds[i]
        proofs.append(PV.prove(pk, srs, circuit_fn, inputs, rng_seed=seed))
    return proofs
