#!/usr/bin/env python
"""Round-5 attribution probe: where do the 20.4s prove's hot stages go?

Amortized timing (N launches, one device->host checksum at the end) of:
  * one (16, 65536) coset NTT launch (the quot_terms workhorse)
  * one elementwise mont_mul pass of the same footprint (stage floor)
  * eager per-poly slicing+stack (the evals/multiopen gather pattern)
  * mat_mul_mont at evals shapes
Run: python scripts/probe_stages.py  (TPU)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/zkfhe_jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
import jax.numpy as jnp
import numpy as np

from zkfhe_tpu.ops import field as F
from zkfhe_tpu.ops import ntt as N
from zkfhe_tpu.ops import mxu_field as MX
from zkfhe_tpu.ops.field import FR

L = F.NLIMBS


def force(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0])[:, :1]


def timed(label, fn, iters=8):
    fn()  # warm
    force(fn())
    t0 = time.perf_counter()
    outs = [fn() for _ in range(iters)]
    force(outs[-1])
    dt = (time.perf_counter() - t0) / iters
    print(f"{label}: {dt*1e3:.1f} ms", flush=True)
    return dt


def main():
    print("devices:", jax.devices(), flush=True)
    ext_n = 65536
    B = 16
    key = jax.random.key(0)
    x = F.rand_mont(FR, key, (B, ext_n))
    dom = N.Domain.new(16)

    # 1. elementwise mont_mul floor at NTT stage footprint
    y = F.rand_mont(FR, jax.random.key(1), (B, ext_n))
    mm = jax.jit(lambda a, b: F.mont_mul(FR, a, b))
    t = timed("mont_mul (16,65536) 1 pass", lambda: mm(x, y))

    # 2. 16 chained mont_mul passes (pure-bandwidth 16-stage analog)
    @jax.jit
    def chain16(a, b):
        for _ in range(16):
            a = F.mont_mul(FR, a, b)
        return a
    timed("mont_mul (16,65536) 16 chained", lambda: chain16(x, y))

    # 3. full NTT launch (Stockham, fused pallas butterflies)
    nt = jax.jit(lambda a: N.ntt(dom, a))
    timed("ntt (16,65536)", lambda: nt(x))

    # 4. coset path as the prover runs it
    from zkfhe_tpu.backend.prover import _j_coset
    dom13 = N.Domain.new(13)
    xs = F.rand_mont(FR, jax.random.key(2), (B, 8192))
    cpow = F.rand_mont(FR, jax.random.key(3), (8 * 8192,))
    timed("_j_coset (16,8192)->(16,65536)",
          lambda: _j_coset(N.Domain.new(16), xs, cpow))

    # 5. eager slice+stack of 128 polys from a stacked array (evals gather)
    big = F.rand_mont(FR, jax.random.key(4), (200, 8192))

    def eager_stack():
        return jnp.stack([big[:, i] for i in range(128)], axis=1)
    timed("eager stack 128 slices", eager_stack, iters=3)

    def take_stack():
        return jnp.take(big, jnp.arange(128), axis=1)
    timed("jnp.take 128 cols", take_stack)

    # 6. evals matmul (128 polys x 8 rotations)
    xmat = F.rand_mont(FR, jax.random.key(5), (8192, 8))
    sub = jnp.take(big, jnp.arange(128), axis=1)
    timed("mat_mul_mont (128,8192)x(8192,8)",
          lambda: MX.mat_mul_mont(FR, sub, xmat))

    # 7. power series length 8192
    s = F.rand_mont(FR, jax.random.key(6), ())
    timed("power_series n=8192", lambda: F.power_series(FR, s, 8192))


if __name__ == "__main__":
    main()
