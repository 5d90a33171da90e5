"""Round-5 probe: measure the real v5e ceilings that decide the MXU design.

On the axon platform block_until_ready does NOT wait for execution
(bench.py:114), so every measurement forces a tiny device->host transfer
(np.asarray of a few-byte checksum) and amortizes with in-jit loops.

Run:  python scripts/probe_mxu.py
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from zkfhe_tpu.ops import field as F  # noqa: E402
from zkfhe_tpu.ops.field import FR  # noqa: E402


def timed(fn, *args, iters=3):
    np.asarray(fn(*args))  # warm + force
    t0 = time.perf_counter()
    for _ in range(iters):
        r = np.asarray(fn(*args))
    return (time.perf_counter() - t0) / iters


def main():
    print("devices:", jax.devices(), flush=True)
    N = 1 << 22  # 4M lanes
    REPS = 64

    # 1. u32 elementwise mul chain
    xu = jnp.arange(N, dtype=jnp.uint32) | jnp.uint32(1)

    @jax.jit
    def f_u32(x, y):
        def body(i, z):
            return (z * y + jnp.uint32(1)) & jnp.uint32(0x3FFFFFFF)
        return jnp.sum(jax.lax.fori_loop(0, REPS, body, x)[:8])

    t = timed(f_u32, xu, xu)
    print(f"u32 elementwise mul+add+and: {2*N*REPS/t/1e9:.1f} Gop/s "
          f"({t*1e3:.1f} ms)", flush=True)

    # 2. f32 elementwise fma chain
    xf = jnp.ones((N,), jnp.float32) * 1.0000001

    @jax.jit
    def f_f32(x, y):
        def body(i, z):
            return z * y - jnp.float32(1e-9)
        return jnp.sum(jax.lax.fori_loop(0, REPS, body, x)[:8])

    t = timed(f_f32, xf, xf)
    print(f"f32 elementwise fma: {2*N*REPS/t/1e9:.1f} Gop/s ({t*1e3:.1f} ms)",
          flush=True)

    # 3-5. dot_general rates (loop-carried so nothing hoists)
    M = 2048
    for name, dt, acc, clampf in [
        ("int8->int32", jnp.int8, jnp.int32, lambda z: (z & 1).astype(jnp.int8)),
        ("bf16->f32", jnp.bfloat16, jnp.float32,
         lambda z: (z * 0 + 1).astype(jnp.bfloat16)),
        ("f32->f32", jnp.float32, jnp.float32, lambda z: z * 0 + 1.0),
    ]:
        a = jnp.ones((M, M), dt)
        b = jnp.ones((M, M), dt)

        @jax.jit
        def mm(a, b, acc=acc, clampf=clampf, dt=dt):
            def body(i, z):
                w = jax.lax.dot_general(z, b, (((1,), (0,)), ((), ())),
                                        preferred_element_type=acc)
                return clampf(w)
            return jnp.sum(jax.lax.fori_loop(0, 16, body, a)[:2, :2])

        t = timed(mm, a, b)
        print(f"dot {name} ({M}^3 x16): {16*2*M**3/t/1e12:.2f} Top/s "
              f"({t*1e3:.1f} ms)", flush=True)

    # 6. mont_mul rates
    n = 1 << 18
    rng = np.random.default_rng(0)
    vals = [int(x) % FR.p for x in rng.integers(0, 2**63, n, dtype=np.int64)]
    a = jnp.asarray(F.encode_ints_np(vals))
    MREPS = 16

    @jax.jit
    def mm_scan(x):
        def body(i, z):
            return F.mont_mul(FR, z, x)
        return jnp.sum(jax.lax.fori_loop(0, MREPS, body, x)[:, :4])

    t = timed(mm_scan, a)
    print(f"mont_mul scan:     {n*MREPS/t/1e6:.2f} Mmul/s ({t*1e3:.1f} ms)",
          flush=True)

    def mm_unroll_body(x):
        with F.unrolled():
            z = x
            for _ in range(MREPS):
                z = F.mont_mul.__wrapped__(FR, z, x)
            return jnp.sum(z[:, :4])
    mm_unroll = jax.jit(mm_unroll_body)
    t = timed(mm_unroll, a)
    print(f"mont_mul unrolled: {n*MREPS/t/1e6:.2f} Mmul/s ({t*1e3:.1f} ms)",
          flush=True)

    # 6b. single mont_mul on a big batch (one dispatch, small checksum)
    @jax.jit
    def mm_one(x, y):
        return jnp.sum(F.mont_mul(FR, x, y)[:, :4])
    t = timed(mm_one, a, a)
    print(f"mont_mul single (n={n}): {n/t/1e6:.2f} Mmul/s ({t*1e3:.2f} ms)",
          flush=True)

    # 7. NTT k=16 batch of 8
    from zkfhe_tpu.ops import ntt as NTT
    dom = NTT.Domain.new(16)
    K = 8
    stack = jnp.stack([a[:, :1 << 16]] * K, axis=1)

    @jax.jit
    def f_ntt(s):
        return jnp.sum(NTT.ntt(dom, s)[:, :, :4])
    t = timed(f_ntt, stack)
    bf = K * (1 << 15) * 16
    print(f"ntt k=16 x{K}: {t*1e3:.1f} ms/launch, {bf/t/1e6:.2f} Mbutterfly/s",
          flush=True)


if __name__ == "__main__":
    main()
