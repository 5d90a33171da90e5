#!/usr/bin/env python
"""Round benchmark: one JSON line on stdout.

Headline metric (BASELINE.md): BFV encryption proof time at k=13,
N=1024, Q=2^29-3 — reference: 10.2 s on an Apple M2 (single proof,
keygen excluded). vs_baseline = baseline_seconds / measured_seconds
(>1 means faster than the reference).

Falls back to the MSM throughput metric if the full pipeline fails, so
the driver always records a data point. All progress goes to stderr;
stdout carries exactly one JSON line.
"""
import json
import os
import sys
import time
import traceback


def log(*a):
    print("[bench]", *a, file=sys.stderr, flush=True)


def _kernel_metrics(k, log):
    """The BASELINE.json metric: MSM pts/s/chip and NTT butterflies/s,
    measured on the REAL hot kernels (fixed-base table MSM commit, coset
    NTT) at the bench shapes, warm."""
    import time
    import jax
    import jax.numpy as jnp
    from zkfhe_tpu.backend import srs as SRS
    from zkfhe_tpu.ops import field as F
    from zkfhe_tpu.ops import msm as M
    from zkfhe_tpu.ops import ntt as N

    n = 1 << k
    srs = SRS.load_or_generate(k, "params")
    out = {}
    if srs.g1_lag is not None:
        tab = M.build_table((srs.g1_lag[0][:, :n], srs.g1_lag[1][:, :n]))
        K = 8
        sc = jnp.asarray(
            __import__("numpy").random.RandomState(0).randint(
                0, 1 << 13, size=(F.NLIMBS, K, n)).astype("uint32"))
        jax.block_until_ready(jnp.stack(M.msm_tab(tab, sc, max_bits=32)))
        t0 = time.time()
        jax.block_until_ready(jnp.stack(M.msm_tab(tab, sc, max_bits=32)))
        dt = time.time() - t0
        out["msm_pts_per_s_per_chip"] = round(K * n / dt, 1)
        log(f"table MSM (32-bit tier, K={K}, n={n}): {K*n/dt:.0f} pts/s")
    dom = N.Domain.new(k + 3)
    K = 8
    a = jnp.asarray(
        __import__("numpy").random.RandomState(1).randint(
            0, 1 << 13, size=(F.NLIMBS, K, dom.n)).astype("uint32"))
    ntt_j = jax.jit(N.ntt, static_argnums=0)
    jax.block_until_ready(ntt_j(dom, a))
    t0 = time.time()
    jax.block_until_ready(ntt_j(dom, a))
    dt = time.time() - t0
    bflies = K * (dom.n // 2) * (k + 3)
    out["ntt_butterflies_per_s"] = round(bflies / dt, 1)
    log(f"coset-size NTT (K={K}, n={dom.n}): {bflies/dt:.3g} butterflies/s")
    return out


def main():
    os.environ.setdefault("ZKFHE_BENCH", "1")
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/zkfhe_jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from zkfhe_tpu.models import bfv
    from zkfhe_tpu.ops import field as F
    from zkfhe_tpu.trace import compile as TC
    from zkfhe_tpu.backend import keygen as KG
    from zkfhe_tpu.backend import prover as PV
    from zkfhe_tpu.backend import srs as SRS
    from zkfhe_tpu.backend import verifier as VF

    log("devices:", jax.devices())

    # Wedged-worker watchdog: the axon TPU worker can get into a state
    # where every dispatch hangs forever (observed after back-to-back
    # heavy sessions). Probe with a trivial op under an alarm so the
    # driver gets a failure JSON instead of an indefinite hang.
    import signal

    def _probe_timeout(signum, frame):
        print(json.dumps({"metric": "bench_failed_tpu_wedged", "value": 0,
                          "unit": "", "vs_baseline": 0.0}), flush=True)
        os._exit(2)

    signal.signal(signal.SIGALRM, _probe_timeout)
    signal.alarm(180)
    np.asarray(jnp.arange(4) + 1)
    signal.alarm(0)
    log("device probe OK")

    k = int(os.environ.get("ZKFHE_BENCH_K", "13"))
    n = int(os.environ.get("ZKFHE_BENCH_N", "1024"))
    baseline_s = 10.2

    try:
        params = bfv.BfvParams(n=n)
        t0 = time.time()
        cin_path = os.path.join("data", "bfv", "bfv.in")
        if n == 1024 and os.path.exists(cin_path):
            cin = bfv.CircuitInput.from_json(cin_path)
        else:
            cin = bfv.generate_input(params, seed=1)
        inputs = cin.to_arrays(params)
        circuit = bfv.make_bfv_circuit(params)
        log(f"inputs ready ({time.time()-t0:.1f}s)")

        t0 = time.time()
        srs = SRS.load_or_generate(k, "params")
        log(f"srs ready ({time.time()-t0:.1f}s)")

        t0 = time.time()
        vk_path = os.path.join("data", f"bench_k{k}_n{n}.vk.npz")
        pk_path = os.path.join("data", f"bench_k{k}_n{n}.pk.npz")
        if os.path.exists(vk_path) and os.path.exists(pk_path):
            vk = KG.load_vk(vk_path)
            pk = KG.load_pk(pk_path, vk, circuit, inputs)
            log(f"pk/vk loaded from cache ({time.time()-t0:.1f}s)")
        else:
            pk = KG.keygen(circuit, inputs, k, srs)
            KG.save_vk(pk.vk, vk_path)
            KG.save_pk(pk, pk_path)
        log(f"keygen done ({time.time()-t0:.1f}s); "
            f"advice={pk.vk.shape['num_advice']} "
            f"perm={pk.vk.shape['num_perm_cols']}")

        # warm-up proof compiles everything; second proof is the measure
        t0 = time.time()
        proof = PV.prove(pk, srs, circuit, inputs, rng_seed=b"warmup")
        log(f"warmup prove done ({time.time()-t0:.1f}s), "
            f"{len(proof)} bytes")

        t0 = time.time()
        proof = PV.prove(pk, srs, circuit, inputs, rng_seed=b"bench")
        prove_s = time.time() - t0
        log(f"bench prove: {prove_s:.3f}s")
        stages = dict(PV.LAST_STAGES)
        log(f"stages: {stages}")

        gamma0 = jnp.zeros((F.NLIMBS,), dtype=jnp.uint32)
        _, instance = TC.make_witgen(circuit)(inputs, gamma0)
        inst = F.decode(F.FR, instance)
        t0 = time.time()
        ok = VF.verify(pk.vk, proof, inst, verbose=True)
        verify_cold_s = time.time() - t0
        t0 = time.time()
        ok2 = VF.verify(pk.vk, proof, inst)
        verify_s = time.time() - t0
        log(f"verify: {ok} (cold {verify_cold_s:.3f}s, warm {verify_s:.3f}s)")
        assert ok and ok2, "proof did not verify"

        extras = {}
        try:
            extras = _kernel_metrics(k, log)
        except Exception:
            log("kernel metrics failed:\n" + traceback.format_exc())

        print(json.dumps({
            "metric": f"bfv_proof_time_k{k}",
            "value": round(prove_s, 4),
            "unit": "s",
            "vs_baseline": round(baseline_s / prove_s, 3),
            "verify_s": round(verify_s, 4),
            "verify_cold_s": round(verify_cold_s, 4),
            "proof_bytes": len(proof),
            "stages": {nm: round(dt, 3) for nm, dt in stages.items()},
            **extras,
        }))
        return 0
    except Exception:
        log("full pipeline failed:\n" + traceback.format_exc())

    # fallback: MSM throughput (points/s/chip)
    try:
        from zkfhe_tpu.ops import curve as C
        from zkfhe_tpu.ops import msm as M
        import random
        random.seed(0)
        npts, K = 8192, 8
        pts = [C.G1_GEN.mul(random.randrange(1, F.FR.p)) for _ in range(64)]
        pts = pts * (npts // 64)
        P_ = C.encode_points(pts)
        sc = jnp.asarray(np.random.randint(
            0, 1 << 13, size=(F.NLIMBS, K, npts), dtype=np.uint32))
        run = jax.jit(lambda s: jnp.stack(M.msm((P_[0], P_[1]), s), 0))
        run(sc)[0].block_until_ready()
        t0 = time.time()
        run(sc)[0].block_until_ready()
        dt = time.time() - t0
        rate = npts * K / dt
        log(f"msm fallback: {rate:.0f} pts/s")
        print(json.dumps({
            "metric": "msm_points_per_s_per_chip",
            "value": round(rate, 1),
            "unit": "pts/s",
            "vs_baseline": 0.0,
        }))
        return 0
    except Exception:
        log("msm fallback failed:\n" + traceback.format_exc())
        print(json.dumps({
            "metric": "bench_failed", "value": 0, "unit": "",
            "vs_baseline": 0.0}))
        return 1


if __name__ == "__main__":
    sys.exit(main())
