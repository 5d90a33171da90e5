#!/usr/bin/env python
"""TPU probe: warm per-tier table-MSM timings at the prove shapes.

Reproduces the round-3 OOM configuration (full-width tier, K=4 columns,
n=8192 rows, affine tree) and times every TAB_TIER warm for both tree
reducers. VERDICT r3 next #5: reconcile the recorded 94.7k pts/s with the
claimed 47M pts/s — this script measures each tier with a hard
block_until_ready on the stacked result.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/zkfhe_jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

from zkfhe_tpu.ops import field as F
from zkfhe_tpu.ops import msm as M
from zkfhe_tpu.backend import srs as SRS


def rand_scalars(K, n, bits, seed=0):
    rs = np.random.RandomState(seed)
    sc = np.zeros((F.NLIMBS, K, n), dtype=np.uint32)
    full, rem = divmod(bits, F.LIMB_BITS)
    for li in range(full):
        sc[li] = rs.randint(0, 1 << F.LIMB_BITS, size=(K, n))
    if rem:
        sc[full] = rs.randint(0, 1 << rem, size=(K, n))
    return jnp.asarray(sc)


def main():
    k = 13
    n = 1 << k
    print("devices:", jax.devices(), flush=True)
    srs = SRS.load_or_generate(k, "params")
    t0 = time.time()
    tab = M.build_table((srs.g1_lag[0][:, :n], srs.g1_lag[1][:, :n]))
    jax.block_until_ready(tab.XY)
    print(f"table built ({time.time()-t0:.1f}s), "
          f"{tab.XY.size*4/1e9:.2f} GB", flush=True)

    out = {}
    K = 4
    for mode in ("affine", "jacobian"):
        os.environ["ZKFHE_MSM_TREE"] = mode
        for bits in (32, 52, 72, 256):
            sc = rand_scalars(K, n, min(bits, 254))
            label = f"{mode}_{bits}b"
            try:
                # time-to-host (np.asarray): block_until_ready on the
                # axon remote device returns ~immediately without
                # waiting for execution (measured 0.1ms "warm" for a
                # 113s-to-compile kernel, 2026-08-19) — THE source of
                # round 3's 47M-vs-94.7k pts/s contradiction. Fetching
                # the (3, L, K) result is what the prover pays anyway.
                t0 = time.time()
                np.asarray(M.msm_tab_stacked(tab, sc, max_bits=bits))
                cold = time.time() - t0
                t0 = time.time()
                reps = 3
                for _ in range(reps):
                    r = np.asarray(
                        M.msm_tab_stacked(tab, sc, max_bits=bits))
                warm = (time.time() - t0) / reps
                out[label] = {"cold_s": round(cold, 3),
                              "warm_s": round(warm, 4),
                              "pts_per_s": round(K * n / warm, 1)}
                print(f"{label}: cold {cold:.2f}s warm {warm*1e3:.1f}ms "
                      f"{K*n/warm:,.0f} pts/s", flush=True)
            except Exception as e:
                out[label] = {"error": f"{type(e).__name__}"}
                print(f"{label}: FAILED {type(e).__name__}: "
                      f"{str(e)[:300]}", flush=True)
    print(json.dumps(out))
    with open("data/msm_tier_probe.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
