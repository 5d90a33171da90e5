"""Pipeline-parallel proving (SURVEY.md §2.3 "Pipeline parallel analog":
overlap the commitment MSMs of one unit of work with the witness
generation of the next).

The reference has no pipeline axis at all — rayon only data-parallelizes
within each serial halo2 phase (SURVEY.md §2.3). On TPU the serial
structure that wants pipelining is different: between transcript
challenges the PROVER alternates device bursts (MSM/NTT/term batches)
with host bursts (point decode over the remote-tunnel transfer, Blake2b
hashing, challenge derivation) — and during every host burst the chip is
idle. For a single proof that bubble is protocol-inherent (the next
phase's device work depends on the challenge). For a STREAM of proofs it
is not: proof i+1's witness generation and MSMs can occupy the chip
while proof i's transcript is hashed.

`prove_stream` exploits exactly that: `backend/prover._prove_gen` yields
at every dispatch/sync boundary with its device work ENQUEUED but its
transfers unpaid, and the scheduler here advances up to `depth` proof
generators round-robin. Because XLA dispatch is async, stepping proof
i+1 up to its next yield point enqueues its kernels behind proof i's —
the chip drains one proof's MSMs while the host hashes the other's
points. No math changes: proof bytes are byte-identical to serial
prove() with the same rng seeds (tests/test_backend.py
test_prove_stream).

vs. backend/batch.prove_batch (the DP axis): batching folds same-shaped
proofs into shared kernels — strictly better utilization when all
proofs share one circuit AND the batch fits in HBM. The pipeline
composes where batching can't: heterogeneous proving keys in one
stream, and memory — depth-2 pipelining holds ~1 extra proof's
working set instead of B of them.
"""
from __future__ import annotations

import os
from collections import deque

from ..backend import prover as PV


def prove_stream(pk, srs, circuit_fn, inputs_list, rng_seeds=None,
                 depth: int = 2, skew: int = 4, mesh=None,
                 mesh_axis: str = "chips"):
    """Prove independent instances as a `depth`-deep software pipeline.

    inputs_list: list of input dicts (each as for prover.prove), or a
    list of (pk, srs, circuit_fn, inputs) tuples for heterogeneous
    streams when pk is None.
    skew: a new proof is only admitted once the youngest live proof has
    advanced this many stages — keeps pipelined proofs half a phase
    apart so their peak-memory stages (quotient coset caches, advice
    buffers) don't coincide. The per-proof coset-cache budget is also
    divided by `depth` so depth-N pipelining respects the same
    ZKFHE_COSET_CACHE_MB HBM envelope as a serial prove.
    Returns per-proof bytes in input order, byte-identical to serial
    prove() with the same rng_seeds.
    """
    jobs = list(inputs_list)
    nj = len(jobs)
    assert nj >= 1
    if rng_seeds is not None:
        assert len(rng_seeds) == nj
    depth = max(1, depth)
    cache_mb = int(os.environ.get("ZKFHE_COSET_CACHE_MB", "6000")) // depth
    results: list = [None] * nj
    next_job = 0
    live: deque = deque()  # [index, generator, steps]
    last_admitted: list | None = None  # the youngest entry (by reference)

    def start(i):
        if pk is None:
            pk_i, srs_i, cf_i, inp_i = jobs[i]
        else:
            pk_i, srs_i, cf_i, inp_i = pk, srs, circuit_fn, jobs[i]
        seed = None if rng_seeds is None else rng_seeds[i]
        return PV._prove_gen(pk_i, srs_i, cf_i, inp_i, rng_seed=seed,
                             mesh=mesh, mesh_axis=mesh_axis,
                             coset_cache_mb=cache_mb)

    while next_job < nj or live:
        youngest_ok = last_admitted is None or last_admitted[2] >= skew
        if next_job < nj and len(live) < depth and youngest_ok:
            last_admitted = [next_job, start(next_job), 0]
            live.append(last_admitted)
            next_job += 1
        if not live:
            continue
        # round-robin: step each live proof one stage. Each step returns
        # with its device work enqueued; the NEXT proof's step then
        # enqueues more device work before anyone blocks on a transfer.
        for _ in range(len(live)):
            entry = live.popleft()
            try:
                next(entry[1])
            except StopIteration as e:
                results[entry[0]] = e.value
                if entry is last_admitted:
                    last_admitted = None  # never gate admission on a
                    # finished proof (defensive: any real prove yields
                    # more than `skew` times)
                continue
            entry[2] += 1
            live.append(entry)
    return results
