#!/usr/bin/env python
"""Round benchmark: one JSON line on stdout, ALWAYS.

Headline metric (BASELINE.md): BFV encryption proof time at k=13,
N=1024, Q=2^29-3 — reference: 10.2 s on an Apple M2 (single proof,
keygen excluded). vs_baseline = baseline_seconds / measured_seconds
(>1 means faster than the reference).

Failure containment (VERDICT round-2 weak #1 — the round-2 bench died
inside jax.devices() before any watchdog armed and recorded nothing):

  * the SIGALRM watchdog is armed BEFORE the first device-touching call
    and re-armed with a per-stage budget around every stage; on fire it
    emits the best partial JSON collected so far and exits;
  * backend-init failure falls back to CPU and still measures a
    (reduced-k) proof, clearly labeled, vs_baseline 0.0;
  * a top-level except emits a parseable failure JSON for anything else.

All progress goes to stderr; stdout carries exactly one JSON line.
"""
import json
import os
import signal
import sys
import time
import traceback

BASELINE_S = 10.2

# best-known results, emitted by the watchdog/exception paths if the
# process cannot finish normally
STATE = {"emitted": False}


def log(*a):
    print("[bench]", *a, file=sys.stderr, flush=True)


def emit(obj):
    if STATE.get("emitted"):
        return
    STATE["emitted"] = True
    print(json.dumps(obj), flush=True)


def emit_best(reason: str):
    """Emit the most useful JSON we can from partial results."""
    if "prove_s" in STATE:
        prove_s = STATE["prove_s"]
        emit({
            "metric": f"bfv_proof_time_{STATE.get('suffix', 'k?')}",
            "value": round(prove_s, 4),
            "unit": "s",
            "vs_baseline": (round(BASELINE_S / prove_s, 3)
                            if not STATE.get("cpu_fallback") else 0.0),
            "partial": reason,
            **STATE.get("extras", {}),
        })
    else:
        emit({"metric": f"bench_failed_{reason}", "value": 0, "unit": "",
              "vs_baseline": 0.0, "stage": STATE.get("stage", "init")})


def _on_alarm(signum, frame):
    log(f"WATCHDOG fired in stage '{STATE.get('stage')}'")
    emit_best("timeout_" + str(STATE.get("stage", "init")))
    os._exit(2)


def stage(name: str, budget_s: int):
    """Mark the current stage and (re-)arm the watchdog for it."""
    STATE["stage"] = name
    signal.alarm(budget_s)
    log(f"stage {name} (budget {budget_s}s)")


def _rand_narrow_scalars(np, F, K, n, bits=32, seed=0):
    """(L, K, n) standard-form scalars < 2^bits — the benchmarked MSM is
    then also a CORRECT one under its max_bits contract (ADVICE.md r2:
    full-width random limbs silently violated the tier bound)."""
    rs = np.random.RandomState(seed)
    sc = np.zeros((F.NLIMBS, K, n), dtype=np.uint32)
    full, rem = divmod(bits, F.LIMB_BITS)
    for li in range(full):
        sc[li] = rs.randint(0, 1 << F.LIMB_BITS, size=(K, n))
    if rem:
        sc[full] = rs.randint(0, 1 << rem, size=(K, n))
    return sc


def _kernel_metrics(k, log):
    """The BASELINE.json metric: MSM pts/s/chip and NTT butterflies/s,
    measured on the REAL hot kernels (fixed-base table MSM commit, coset
    NTT) at the bench shapes, warm. Every TAB_TIER is measured (VERDICT
    r3 next #5: the round-3 fallback recorded a cold-dominated number)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from zkfhe_tpu.backend import srs as SRS
    from zkfhe_tpu.ops import field as F
    from zkfhe_tpu.ops import msm as M
    from zkfhe_tpu.ops import ntt as N

    n = 1 << k
    srs = SRS.load_or_generate(k, "params")
    out = {}
    if srs.g1_lag is not None:
        tab = M.build_table((srs.g1_lag[0][:, :n], srs.g1_lag[1][:, :n]))
        K = 4
        tiers = {}
        for bits in M.TAB_TIERS:
            sc = jnp.asarray(
                _rand_narrow_scalars(np, F, K, n, bits=min(bits, 254)))
            # amortized time-to-host: enqueue `reps` launches, pay ONE
            # device->host transfer at the end — exactly the prover's
            # async-commit pattern (msm_tab_stacked + one decode per
            # commit group). block_until_ready does NOT wait on the axon
            # remote device, so the final np.asarray is the fence; the
            # serial device queue makes it cover all reps.
            np.asarray(M.msm_tab_stacked(tab, sc, max_bits=bits))
            t0 = time.time()
            reps = 8
            o = None
            for _ in range(reps):
                o = M.msm_tab_stacked(tab, sc, max_bits=bits)
            np.asarray(o)
            dt = (time.time() - t0) / reps
            tiers[f"{bits}b"] = round(K * n / dt, 1)
            log(f"table MSM ({bits}-bit tier, K={K}, n={n}): "
                f"{dt*1e3:.1f}ms warm amortized, {K*n/dt:,.0f} pts/s")
        out["msm_pts_per_s_per_chip"] = tiers.get("32b")
        out["msm_tier_pts_per_s"] = tiers
    dom = N.Domain.new(k + 3)
    K = 8
    a = jnp.asarray(_rand_narrow_scalars(np, F, K, dom.n, bits=13, seed=1))
    ntt_j = jax.jit(N.ntt, static_argnums=0)
    np.asarray(ntt_j(dom, a))  # warm (and force: see MSM note above)
    t0 = time.time()
    reps = 8
    o = None
    for _ in range(reps):
        o = ntt_j(dom, a)
    np.asarray(o)  # fence: serial device queue covers all reps
    dt = (time.time() - t0) / reps
    bflies = K * (dom.n // 2) * (k + 3)
    out["ntt_butterflies_per_s"] = round(bflies / dt, 1)
    log(f"coset-size NTT (K={K}, n={dom.n}): {bflies/dt:.3g} butterflies/s "
        f"({dt*1e3:.1f} ms/launch amortized)")
    return out


def _main():
    os.environ.setdefault("ZKFHE_BENCH", "1")
    signal.signal(signal.SIGALRM, _on_alarm)

    # ---- backend init (the exact line that killed BENCH_r02) -------------
    # Probe the backend in a SUBPROCESS first: a down axon worker can make
    # jax.devices() hang forever rather than raise (observed 2026-08-18),
    # and an in-process hang would leave only the watchdog's failure JSON
    # instead of a CPU-fallback data point.
    # Tunnel init latency is wildly variable (12 s to >300 s observed on
    # the same host within minutes), so probe with a generous budget and
    # one retry — a warm tunnel daemon usually makes the retry fast.
    stage("backend_probe", 740)
    import subprocess
    cpu_fallback = True
    for attempt in range(2):
        try:
            probe = subprocess.run(
                [sys.executable, "-c",
                 "import jax, jax.numpy as jnp, numpy as np;"
                 "print(jax.devices());"
                 "print(np.asarray(jnp.arange(4) + 2))"],
                timeout=330, capture_output=True, text=True)
            log(f"probe[{attempt}] rc:", probe.returncode,
                probe.stdout.strip()[-200:], probe.stderr.strip()[-300:])
            if probe.returncode == 0 and "[2 3 4 5]" in probe.stdout:
                cpu_fallback = False
                break
        except subprocess.TimeoutExpired:
            log(f"backend probe[{attempt}] HUNG (>330s)")
    if cpu_fallback:
        log("backend unusable after 2 probes — falling back to CPU")

    # in-process init + first dispatch each pay their own tunnel setup
    # (observed 12 s - 5 min on one host within minutes), so these
    # budgets are generous; the subprocess probe above already proved
    # the backend is alive, these stages only hedge a mid-run wedge
    stage("backend_init", 600)
    import jax
    if cpu_fallback:
        jax.config.update("jax_platforms", "cpu")
        log("cpu devices:", jax.devices())
    else:
        try:
            devs = jax.devices()
            log("devices:", devs)
        except Exception:
            log("backend init failed, falling back to CPU:\n"
                + traceback.format_exc())
            jax.config.update("jax_platforms", "cpu")
            log("cpu devices:", jax.devices())
            cpu_fallback = True

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

    # Wedged-worker probe: the axon TPU worker can get into a state where
    # every dispatch hangs forever (observed after back-to-back heavy
    # sessions); a trivial op under the watchdog catches it up front.
    stage("device_probe", 600)
    np.asarray(jnp.arange(4) + 1)
    log("device probe OK")

    if cpu_fallback:
        # a reduced-k CPU proof still demonstrates the full pipeline and
        # leaves a labeled data point instead of rc=1 and nothing
        k = int(os.environ.get("ZKFHE_BENCH_CPU_K", "10"))
        n = int(os.environ.get("ZKFHE_BENCH_CPU_N", "64"))
    else:
        k = int(os.environ.get("ZKFHE_BENCH_K", "13"))
        n = int(os.environ.get("ZKFHE_BENCH_N", "1024"))
    q = int(os.environ.get("ZKFHE_BENCH_Q", "0"))  # 0 = BfvParams default
    STATE["cpu_fallback"] = cpu_fallback

    # ---- e2e retry ladder (VERDICT r3 next #1b/#6): the headline metric
    # (bfv_proof_time_*) must survive any single kernel's failure. Round 3
    # lost it to an OOM in the affine MSM reducer; the ladder now retries
    # the SAME pipeline with the jacobian reducer, then a reduced-k run,
    # before ever falling back to a kernel microbench.
    ladder = [("", k, n, {})]
    if not os.environ.get("ZKFHE_MSM_TREE"):
        ladder.append(("retry_jacobian", k, n,
                       {"ZKFHE_MSM_TREE": "jacobian"}))
    if k > 10:
        ladder.append(("reduced", 10, 64,
                       {"ZKFHE_MSM_TREE": "jacobian"}))

    for attempt, kk, nn, env in ladder:
        for ek, ev in env.items():
            os.environ[ek] = ev
        suffix = f"k{kk}"
        if q:
            suffix += f"_q{q.bit_length()}b"
        if cpu_fallback:
            suffix += "_cpu_fallback"
        if attempt == "reduced":
            suffix += "_reduced"
        STATE["suffix"] = suffix
        try:
            rc = _run_pipeline(kk, nn, q, suffix, cpu_fallback, attempt,
                               log)
            return rc
        except Exception:
            log(f"pipeline attempt '{attempt or 'default'}' failed:\n"
                + traceback.format_exc())
            STATE.pop("prove_s", None)

    # fallback: kernel metric only (MSM throughput, pts/s/chip)
    try:
        stage("msm_fallback", 900)
        from zkfhe_tpu.ops import msm as M
        from zkfhe_tpu.backend import srs as SRS
        kk = min(k, 13)
        nn = 1 << kk
        srs = SRS.load_or_generate(kk, "params")
        tab = M.build_table((srs.g1_lag[0][:, :nn], srs.g1_lag[1][:, :nn]))
        K = 8
        sc = jnp.asarray(_rand_narrow_scalars(np, F, K, nn, bits=32))
        jax.block_until_ready(jnp.stack(M.msm_tab(tab, sc, max_bits=32)))
        t0 = time.time()
        jax.block_until_ready(jnp.stack(M.msm_tab(tab, sc, max_bits=32)))
        dt = time.time() - t0
        rate = nn * K / dt
        signal.alarm(0)
        log(f"msm fallback: {rate:.0f} pts/s")
        emit({
            "metric": "msm_points_per_s_per_chip",
            "value": round(rate, 1),
            "unit": "pts/s",
            "vs_baseline": 0.0,
        })
        return 0
    except Exception:
        log("msm fallback failed:\n" + traceback.format_exc())
        emit({"metric": "bench_failed", "value": 0, "unit": "",
              "vs_baseline": 0.0})
        return 1


def _run_pipeline(k, n, q, suffix, cpu_fallback, attempt, log):
    """One full keygen(cached)->prove->verify measurement. Raises on any
    failure so the ladder in _main can retry with a different config."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from zkfhe_tpu.models import bfv
    from zkfhe_tpu.ops import field as F
    from zkfhe_tpu.trace import compile as TC
    from zkfhe_tpu.backend import keygen as KG
    from zkfhe_tpu.backend import prover as PV
    from zkfhe_tpu.backend import srs as SRS
    from zkfhe_tpu.backend import verifier as VF

    stage("inputs", 600)
    params = bfv.BfvParams(n=n, q=q) if q else bfv.BfvParams(n=n)
    t0 = time.time()
    cin_path = os.path.join("data", "bfv", "bfv.in")
    if n == 1024 and not q and os.path.exists(cin_path):
        cin = bfv.CircuitInput.from_json(cin_path)
    else:
        cin = bfv.generate_input(params, seed=1)
    inputs = cin.to_arrays(params)
    circuit = bfv.make_bfv_circuit(params)
    log(f"inputs ready ({time.time()-t0:.1f}s)")

    stage("srs", 600)
    t0 = time.time()
    srs = SRS.load_or_generate(k, "params")
    log(f"srs ready ({time.time()-t0:.1f}s)")

    stage("keygen", 2400)
    t0 = time.time()
    vk_path = os.path.join("data", f"bench_k{k}_n{n}.vk.npz")
    pk_path = os.path.join("data", f"bench_k{k}_n{n}.pk.npz")
    if os.path.exists(vk_path) and os.path.exists(pk_path):
        vk = KG.load_vk(vk_path)
        pk = KG.load_pk(pk_path, vk, circuit, inputs)
        log(f"pk/vk loaded from cache ({time.time()-t0:.1f}s)")
        # refresh artifacts missing a current-code assembly blob so the
        # NEXT load skips the ~17 s trace/assemble rebuild
        d = np.load(pk_path, allow_pickle=True)
        stale = ("asm_blob" not in d.files
                 or str(d["asm_digest"]) != KG._asm_code_digest())
        del d
        if stale:
            KG.save_pk(pk, pk_path)
            log("pk cache refreshed with assembly blob")
    else:
        pk = KG.keygen(circuit, inputs, k, srs)
        KG.save_vk(pk.vk, vk_path)
        KG.save_pk(pk, pk_path)
    log(f"keygen done ({time.time()-t0:.1f}s); "
        f"advice={pk.vk.shape['num_advice']} "
        f"perm={pk.vk.shape['num_perm_cols']}")

    # warm-up proof compiles everything; warm repeats are the measure
    stage("warmup_prove", 2700)
    t0 = time.time()
    proof = PV.prove(pk, srs, circuit, inputs, rng_seed=b"warmup")
    warmup_s = time.time() - t0
    log(f"warmup prove done ({warmup_s:.1f}s), {len(proof)} bytes")

    # >=3 warm proves; the HEADLINE is the median (VERDICT r4 next #6:
    # single-run numbers drifted 22% between commit claims and the
    # recorded artifact; median + min/max makes the steady state visible)
    stage("bench_prove", 1500)
    runs, all_stages = [], []
    n_runs = int(os.environ.get("ZKFHE_BENCH_RUNS", "5"))
    for i in range(n_runs):
        t0 = time.time()
        proof = PV.prove(pk, srs, circuit, inputs,
                         rng_seed=b"bench%d" % i)
        runs.append(time.time() - t0)
        all_stages.append(dict(PV.LAST_STAGES))
        log(f"bench prove[{i}]: {runs[-1]:.3f}s")
    order = sorted(range(n_runs), key=lambda i: runs[i])
    med_i = order[n_runs // 2]
    prove_s = runs[med_i]
    stages = all_stages[med_i]  # stage table of the median run
    log(f"bench prove median: {prove_s:.3f}s "
        f"(min {min(runs):.3f}s max {max(runs):.3f}s)")
    log(f"stages: {stages}")
    STATE["prove_s"] = prove_s
    STATE["extras"] = {
        "proof_bytes": len(proof),
        "prove_runs": [round(r, 4) for r in runs],
        "warmup_prove_s": round(warmup_s, 2),
        "stages": {nm: round(dt, 3) for nm, dt in stages.items()},
    }
    if attempt:
        STATE["extras"]["ladder_attempt"] = attempt

    stage("verify", 1200)
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
    STATE["extras"]["verify_s"] = round(verify_s, 4)
    STATE["extras"]["verify_cold_s"] = round(verify_cold_s, 4)

    stage("kernel_metrics", 1200)
    try:
        STATE["extras"].update(_kernel_metrics(k, log))
    except Exception:
        log("kernel metrics failed:\n" + traceback.format_exc())

    # evidence produced by the manual runners (scripts/bench_k15.py:
    # k=15 / N=2048 / 120-bit-Q e2e; scripts/bench_batch.py: vmapped
    # batch-proving throughput) — surfaced here so the round JSON
    # carries it without risking the headline measurement on their
    # (compile-heavy) runtimes
    for name in ("k15", "batch"):
        try:
            path = os.path.join("data", f"{name}_result.json")
            if os.path.exists(path):
                with open(path) as f:
                    STATE["extras"][name] = json.load(f)
        except Exception:
            log(f"{name} extras failed:\n" + traceback.format_exc())
    signal.alarm(0)

    emit({
        "metric": f"bfv_proof_time_{suffix}",
        "value": round(prove_s, 4),
        "unit": "s",
        "vs_baseline": (round(BASELINE_S / prove_s, 3)
                        if not (cpu_fallback or attempt == "reduced")
                        else 0.0),
        **STATE["extras"],
    })
    return 0


def main():
    try:
        return _main()
    except SystemExit:
        raise
    except BaseException:
        log("fatal:\n" + traceback.format_exc())
        emit_best("exception_" + str(STATE.get("stage", "init")))
        return 1


if __name__ == "__main__":
    sys.exit(main())
