#!/usr/bin/env python
"""Batched-proving throughput evidence (BASELINE configs item 4:
independent BFV proofs vmapped across a single chip).

Measures serial prove() vs backend/batch.prove_batch at the same k/N and
writes data/batch_result.json (surfaced by bench.py into the round JSON).

Run: python scripts/bench_batch.py            (TPU)
     ZKFHE_BATCH_B=8 ZKFHE_BATCH_K=13 ZKFHE_BATCH_N=1024 to override.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print("[batch]", *a, file=sys.stderr, flush=True)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/zkfhe_jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    import jax.numpy as jnp
    from zkfhe_tpu.models import bfv
    from zkfhe_tpu.ops import field as F
    from zkfhe_tpu.trace import compile as TC
    from zkfhe_tpu.backend import batch as BT
    from zkfhe_tpu.backend import keygen as KG
    from zkfhe_tpu.backend import prover as PV
    from zkfhe_tpu.backend import srs as SRS
    from zkfhe_tpu.backend import verifier as VF

    B = int(os.environ.get("ZKFHE_BATCH_B", "8"))
    k = int(os.environ.get("ZKFHE_BATCH_K", "13"))
    n = int(os.environ.get("ZKFHE_BATCH_N", "1024"))
    log("devices:", jax.devices())

    params = bfv.BfvParams(n=n)
    cins = [bfv.generate_input(params, seed=100 + i) for i in range(B)]
    inputs_list = [c.to_arrays(params) for c in cins]
    circuit = bfv.make_bfv_circuit(params)
    srs = SRS.load_or_generate(k, "params")
    pk = KG.keygen(circuit, inputs_list[0], k, srs)
    log("keygen done")

    # serial reference: warm up, then one timed proof
    PV.prove(pk, srs, circuit, inputs_list[0], rng_seed=b"warm")
    t0 = time.time()
    proof_serial = PV.prove(pk, srs, circuit, inputs_list[0],
                            rng_seed=b"s0")
    serial_s = time.time() - t0
    log(f"serial prove: {serial_s:.2f}s")

    seeds = [b"s%d" % i for i in range(B)]
    t0 = time.time()
    proofs = BT.prove_batch(pk, srs, circuit, inputs_list, rng_seeds=seeds)
    batch_cold_s = time.time() - t0
    log(f"batch cold (B={B}): {batch_cold_s:.2f}s")
    t0 = time.time()
    proofs = BT.prove_batch(pk, srs, circuit, inputs_list, rng_seeds=seeds)
    batch_s = time.time() - t0
    log(f"batch warm (B={B}): {batch_s:.2f}s "
        f"= {batch_s / B:.2f}s/proof vs serial {serial_s:.2f}s")

    assert proofs[0] == proof_serial, "batch[0] != serial bytes"
    gamma0 = jnp.zeros((F.NLIMBS,), dtype=jnp.uint32)
    _, inst1 = TC.make_witgen(circuit)(inputs_list[-1], gamma0)
    ok = VF.verify(pk.vk, proofs[-1], F.decode(F.FR, inst1))
    assert ok, "batch proof failed verification"

    # pipeline-parallel axis (parallel/pipeline.prove_stream): depth-2
    # round-robin of prove generators — overlaps one proof's transcript
    # hashing/transfers with the next proof's device stages
    from zkfhe_tpu.parallel.pipeline import prove_stream
    PB = min(4, B)
    t0 = time.time()
    pproofs = prove_stream(pk, srs, circuit, inputs_list[:PB],
                           rng_seeds=seeds[:PB], depth=2)
    pipe_s = time.time() - t0
    log(f"pipeline depth=2 (B={PB}): {pipe_s:.2f}s "
        f"= {pipe_s / PB:.2f}s/proof vs serial {serial_s:.2f}s")
    assert pproofs[0] == proof_serial, "pipeline[0] != serial bytes"

    result = {
        "B": B, "k": k, "n": n,
        "serial_prove_s": round(serial_s, 2),
        "batch_prove_s": round(batch_s, 2),
        "batch_per_proof_s": round(batch_s / B, 3),
        "speedup_vs_serial": round(serial_s * B / batch_s, 2),
        "pipeline_B": PB,
        "pipeline_per_proof_s": round(pipe_s / PB, 3),
        "pipeline_speedup_vs_serial": round(serial_s * PB / pipe_s, 2),
        "byte_identical_to_serial": True,
        "verified": True,
    }
    with open(os.path.join("data", "batch_result.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
