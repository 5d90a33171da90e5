#!/usr/bin/env python
"""Large-parameter end-to-end run (BASELINE configs item 3):

    N=2048, Q = 2^120 - 119 (120-bit prime), T=7, B=19 at k=15
    (generate_input -> keygen -> prove -> verify on the TPU).

Writes data/k15_result.json, which bench.py surfaces in the round JSON.

Q is 120-bit, not the BASELINE's aspirational 128-bit: the reference's
own overflow rule (src/poly_chip.rs:94 — constrain_mul requires
2*q_bits + ceil(log2(2N)) < 254) caps Q below 122 bits at N=2048, for
the reference exactly as for this framework.

Run: python scripts/bench_k15.py   (TPU; several-minute cold compiles)
     ZKFHE_K15_K=15 ZKFHE_K15_N=2048 to override shapes.
"""
import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

Q120 = (1 << 120) - 119


def log(*a):
    print("[k15]", *a, file=sys.stderr, flush=True)


def main():
    # k=15 residency is tight (table 2.7 GB; the first attempt ran the
    # v5e out of HBM by 4.7 MB): skip the static coset cache by default
    os.environ.setdefault("ZKFHE_STATIC_COSET_MB", "0")
    # c=4 table (1.4 GB packed) — k=15 residency is the binding constraint
    os.environ.setdefault("ZKFHE_TAB_MB", "1200")
    # cap per-prove coset residency well below the 16 GB HBM: the ref-
    # based cache pins whole 16-wide launch stacks (336 MB each at
    # ext_n=262144), and the default 6 GB cap OOM'd by a hair on the
    # first round-5 attempt (2026-08-20)
    os.environ.setdefault("ZKFHE_COSET_CACHE_MB", "3500")
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/zkfhe_jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    import jax.numpy as jnp
    from zkfhe_tpu.models import bfv
    from zkfhe_tpu.ops import field as F
    from zkfhe_tpu.trace import compile as TC
    from zkfhe_tpu.backend import keygen as KG
    from zkfhe_tpu.backend import prover as PV
    from zkfhe_tpu.backend import srs as SRS
    from zkfhe_tpu.backend import verifier as VF

    k = int(os.environ.get("ZKFHE_K15_K", "15"))
    n = int(os.environ.get("ZKFHE_K15_N", "2048"))
    log("devices:", jax.devices())

    result = {"k": k, "n": n, "q_bits": Q120.bit_length()}
    t_all = time.time()

    params = bfv.BfvParams(n=n, q=Q120)
    t0 = time.time()
    cin = bfv.generate_input(params, seed=15)
    inputs = cin.to_arrays(params)
    circuit = bfv.make_bfv_circuit(params)
    result["input_s"] = round(time.time() - t0, 2)
    log(f"inputs {result['input_s']}s")

    t0 = time.time()
    srs = SRS.load_or_generate(k, "params")
    result["srs_s"] = round(time.time() - t0, 2)
    log(f"srs {result['srs_s']}s")

    t0 = time.time()
    pk = KG.keygen(circuit, inputs, k, srs)
    result["keygen_s"] = round(time.time() - t0, 2)
    result["advice_cols"] = pk.vk.shape["num_advice"]
    log(f"keygen {result['keygen_s']}s advice={result['advice_cols']}")

    t0 = time.time()
    proof = PV.prove(pk, srs, circuit, inputs, rng_seed=b"k15-warm")
    result["prove_cold_s"] = round(time.time() - t0, 2)
    log(f"cold prove {result['prove_cold_s']}s ({len(proof)} bytes)")

    t0 = time.time()
    proof = PV.prove(pk, srs, circuit, inputs, rng_seed=b"k15")
    result["prove_s"] = round(time.time() - t0, 2)
    result["proof_bytes"] = len(proof)
    result["stages"] = {nm: round(dt, 2) for nm, dt in
                        PV.LAST_STAGES.items()}
    log(f"warm prove {result['prove_s']}s")

    gamma0 = jnp.zeros((F.NLIMBS,), dtype=jnp.uint32)
    _, instance = TC.make_witgen(circuit)(inputs, gamma0)
    inst = F.decode(F.FR, instance)
    t0 = time.time()
    ok = VF.verify(pk.vk, proof, inst, verbose=True)
    result["verify_s"] = round(time.time() - t0, 2)
    result["verify_ok"] = bool(ok)
    log(f"verify {ok} {result['verify_s']}s")

    result["peak_rss_mb"] = round(
        resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024, 1)
    result["total_s"] = round(time.time() - t_all, 2)
    with open(os.path.join("data", "k15_result.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
