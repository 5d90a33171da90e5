"""Multi-scalar multiplication over BN254 G1 (TPU Pippenger).

TPU-native replacement for halo2-axiom's rayon Pippenger (SURVEY.md §2.2).
Shape of the algorithm (designed for XLA's execution model, not translated
from CPU code):

  * signed c-bit digit decomposition (c=4 by default: small windows trade
    a few extra adds for massive lane parallelism and tiny bucket memory);
  * bucket accumulation as ONE `lax.scan` where each step consumes R
    points at once, conflict-free because every in-step point index r owns
    its own bucket REPLICA: buckets have shape (K, W, R, B). Sequential
    step count drops from n to n/R — on TPU the while-loop iteration
    latency, not the adds, is what dominates;
  * replica merge (log2 R vectorized EC-add levels), bucket sweep
    (2(B-1) adds on K*W lanes) and window Horner as short scans;
  * K MSMs sharing the same base points (circuit columns against one SRS)
    run in the same kernel.

All point math is the branch-free complete arithmetic from ops/curve.py,
so gather/scatter order never hits a special case.

NOTE: the stages are three separately-jitted executables, not one: the
fully-fused form crashes the TPU worker ("kernel fault") on v5e.
Measured on v5e: unrolling the limb chains does NOT beat the scan form
(30ms vs 33ms per 33k-lane mont_mul) — throughput is bound by the XLA
elementwise pipeline, hence the Pallas kernel in ops/pallas_field.py.
"""
from __future__ import annotations

import dataclasses
import functools
import os

import numpy as np
import jax
import jax.numpy as jnp

from . import curve as C
from . import field as F
from .field import FQ, FR

import contextlib

DEFAULT_C = 4
DEFAULT_R = 64


# Measured on v5e: tracing the kernel bodies with F.unrolled() (straight-
# line limb chains instead of nested scans) costs a 13-minute Mosaic
# compile and runs at the SAME speed (1.11s vs 1.05s per 8-column bucket
# scan) — the per-step cost is intrinsic to the uint32 elementwise path,
# not loop overhead. Next lever is a dedicated Pallas bucket kernel.


def num_windows(c: int, max_bits: int = 256) -> int:
    # +1 window absorbs the signed-digit carry out of the top bits
    return (max_bits + c - 1) // c + 1


def signed_digits(scalars, c: int, max_bits: int = 256):
    """scalars: (L, *batch) standard-form Fr limbs -> (W, *batch) int32
    signed digits in [-(2^(c-1)), 2^(c-1)], LSB window first. With
    max_bits < 256 the caller guarantees every scalar < 2^max_bits
    (windows above that are provably zero and skipped)."""
    assert c <= 8
    W = num_windows(c, max_bits)
    batch = scalars.shape[1:]
    lb = F.LIMB_BITS

    raw = []
    for w in range(W):
        start = c * w
        lo = start // lb
        off = start % lb
        v = jnp.zeros(batch, dtype=jnp.uint32)
        if lo < F.NLIMBS:
            v = scalars[lo] >> off
            if lo + 1 < F.NLIMBS and off + c > lb:
                v = v | (scalars[lo + 1] << (lb - off))
        raw.append(v & ((1 << c) - 1))
    raw = jnp.stack(raw)  # (W, *batch) uint32

    half = jnp.uint32(1 << (c - 1))
    full = jnp.int32(1 << c)

    def body(carry, r):
        d = (r + carry).astype(jnp.int32)
        wrap = d > half.astype(jnp.int32)
        d = jnp.where(wrap, d - full, d)
        carry = wrap.astype(jnp.uint32)
        return carry, d

    _, digits = jax.lax.scan(body, raw[0] * jnp.uint32(0), raw)
    return digits  # (W, *batch) int32


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def _msm_buckets(points, scalars, c, R, max_bits=256):
    """Bucket accumulation. Returns buckets (3, L, K, W, R, B)."""
    return _msm_buckets_body(points, scalars, c, R, max_bits)


def _msm_buckets_body(points, scalars, c, R, max_bits=256):
    PX, PY = points
    L, n = PX.shape
    K = scalars.shape[1]
    W = num_windows(c, max_bits)
    B = (1 << (c - 1)) + 1  # bucket 0 = trash/no-op
    nsteps = n // R

    digits = signed_digits(scalars, c, max_bits)  # (W, K, n) int32
    # (n, W, K) -> (nsteps, W, K, R)
    dseq = jnp.moveaxis(digits, -1, 0).reshape(nsteps, R, W, K)
    dseq = jnp.moveaxis(dseq, 1, -1)  # (nsteps, W, K, R)
    px_seq = jnp.moveaxis(PX, -1, 0).reshape(nsteps, R, L)
    px_seq = jnp.moveaxis(px_seq, 1, -1)  # (nsteps, L, R)
    py_seq = jnp.moveaxis(PY, -1, 0).reshape(nsteps, R, L)
    py_seq = jnp.moveaxis(py_seq, 1, -1)

    ref = jnp.broadcast_to(
        (PX[:, :1, None, None, None] * jnp.uint32(0)), (L, K, W, R, B))
    bx = F.vary_like(jnp.broadcast_to(
        F.const(FQ, FQ.to_mont_int(1), (K, W, R, B)), (L, K, W, R, B)), ref)
    by = bx
    bz = F.vary_like(jnp.zeros((L, K, W, R, B), dtype=jnp.uint32), ref)

    karange = jnp.arange(K)[:, None, None]
    warange = jnp.arange(W)[None, :, None]
    rarange = jnp.arange(R)[None, None, :]

    def step(state, xs):
        bx, by, bz = state
        d, px, py = xs  # d: (W, K, R); px/py: (L, R)
        d = jnp.moveaxis(d, 0, 1)  # (K, W, R)
        idx = jnp.abs(d).astype(jnp.int32)
        neg = d < 0

        g_idx = idx[None, :, :, :, None]
        gx = jnp.take_along_axis(bx, g_idx, axis=4)[..., 0]
        gy = jnp.take_along_axis(by, g_idx, axis=4)[..., 0]
        gz = jnp.take_along_axis(bz, g_idx, axis=4)[..., 0]

        qx = jnp.broadcast_to(px[:, None, None, :], (L, K, W, R))
        qy = jnp.broadcast_to(py[:, None, None, :], (L, K, W, R))
        qy = F.select(neg, F.sub(FQ, F.zero((K, W, R)), qy), qy)
        live = (idx != 0).astype(jnp.uint32)
        qnz = jnp.broadcast_to(live[None], (L, K, W, R))

        nx, ny, nz = C.point_add_mixed((gx, gy, gz), (qx, qy, qnz))

        bx = bx.at[:, karange, warange, rarange, idx].set(nx)
        by = by.at[:, karange, warange, rarange, idx].set(ny)
        bz = bz.at[:, karange, warange, rarange, idx].set(nz)
        return (bx, by, bz), None

    (bx, by, bz), _ = jax.lax.scan(step, (bx, by, bz),
                                   (dseq, px_seq, py_seq))
    return jnp.stack([bx, by, bz], axis=0)


@functools.partial(jax.jit, static_argnums=1)
def _msm_aggregate(buckets, c):
    """(3, L, K, W, R, B) -> per-window totals T_w (Jacobian (L, K, W)):
    merge replicas by tree EC-adds, then T_w = sum_b b * bucket_b."""
    return _msm_aggregate_body(buckets, c)


def _msm_aggregate_body(buckets, c):
    bx, by, bz = buckets[0], buckets[1], buckets[2]
    L2, K, W, R, B = bx.shape
    # replica merge: log2 R pairwise-add levels over axis 3
    P = (bx, by, bz)
    r = R
    while r > 1:
        half = r // 2
        even = tuple(t[:, :, :, :2 * half:2] for t in P)
        odd = tuple(t[:, :, :, 1:2 * half:2] for t in P)
        merged = C.point_add(even, odd)
        if r % 2:
            P = tuple(jnp.concatenate([m, t[:, :, :, -1:]], axis=3)
                      for m, t in zip(merged, P))
        else:
            P = merged
        r = P[0].shape[3]
    bx, by, bz = (t[:, :, :, 0] for t in P)  # (L, K, W, B)

    ref3 = jnp.broadcast_to(bx[:, :, :, 0] * jnp.uint32(0), (L2, K, W))
    inf = tuple(F.vary_like(t, ref3) for t in C.infinity_like((K, W)))

    def agg(state, b):
        run, acc = state
        sel = B - 1 - b
        pt = (bx[..., sel], by[..., sel], bz[..., sel])
        run = C.point_add(run, pt)
        acc = C.point_add(acc, run)
        return (run, acc), None

    (_, totals), _ = jax.lax.scan(
        agg, (inf, inf), jnp.arange(B - 1, dtype=jnp.int32))
    return jnp.stack(totals, axis=0)  # (3, L, K, W)


@functools.partial(jax.jit, static_argnums=1)
def _msm_horner(totals_arr, c):
    """Window combine (Horner from the top window): acc = 2^c * acc + T_w."""
    return _msm_horner_body(totals_arr, c)


def _msm_horner_body(totals_arr, c):
    totals = (totals_arr[0], totals_arr[1], totals_arr[2])
    L2, K, W = totals[0].shape

    def horner(w, acc):
        sel = W - 1 - w

        def dbl(_, a):
            return C.point_double(a)

        acc = jax.lax.fori_loop(0, c, dbl, acc)
        tw = tuple(t[..., sel] for t in totals)
        return C.point_add(acc, tw)

    ref2 = jnp.broadcast_to(totals[0][:, :, 0] * jnp.uint32(0), (L2, K))
    acc = tuple(F.vary_like(t, ref2) for t in C.infinity_like((K,)))
    acc = jax.lax.fori_loop(0, W, horner, acc)
    return acc


# Width tiers for small-scalar MSMs (scalar bound -> bucket-scan config).
# W*R is held ~constant so every tier runs the same per-step lane count
# (and bucket memory) while the step count drops with the scalar width:
# total bucket-scan work is n*K*W, so a 26-bit tier does 8/65 of the
# full-width math. Each tier is its own compiled executable; the small
# fixed set bounds remote-compile cost.
# Two tiers only: each tier's (buckets, aggregate, horner) trio is a
# fresh Mosaic compile (~20 min on the axon remote-compile path), and the
# measured BFV column-width histogram (163/190 phase-1 columns <= 52 bits,
# 17 full-width) showed finer tiers buy <1s over this pair.
WIDTH_TIERS = (  # (max_bits, R) -- W = num_windows(c=4, max_bits)
    (52, 256),    # W=14: witness values (29b), div_mod quotients (41b)
    (256, DEFAULT_R),  # W=65 full width
)


def tier_for(max_bits: int):
    """Smallest tier covering scalars < 2^max_bits -> (tier_bits, R)."""
    for b, r in WIDTH_TIERS:
        if max_bits <= b:
            return b, r
    return 256, DEFAULT_R


@functools.partial(jax.jit, static_argnums=())
def _j_top_limbs(std):
    """(L, K, n) standard limbs -> (K,) int32 top nonzero limb index per
    column (-1 if the column is all zero). One tiny executable reused for
    every width probe; the host reads K ints back."""
    nz = std != 0
    lidx = jnp.arange(std.shape[0], dtype=jnp.int32)[:, None, None]
    per = jnp.where(nz, lidx, -1)
    return jnp.max(per, axis=(0, 2))


def column_max_bits(std) -> list:
    """Per-column conservative bit bound (limb granularity) for (L, K, n)
    standard-form scalars."""
    top = np.asarray(_j_top_limbs(std))
    return [(int(t) + 1) * F.LIMB_BITS if t >= 0 else 1 for t in top]


def msm(points, scalars, c: int = DEFAULT_C, R: int = DEFAULT_R,
        max_bits: int = 256):
    """Pippenger MSM: sum_i scalars[k, i] * points[i] for each k.

    points:  (X, Y) affine G1, each (L, n) uint32 Montgomery-form Fq.
    scalars: (L, K, n) uint32 standard-form Fr limbs.
    max_bits: caller-guaranteed bound on every scalar (use column_max_bits
    to measure); quantized to WIDTH_TIERS which also picks R.
    Returns Jacobian (X, Y, Z) each (L, K).
    """
    if max_bits < 256:
        max_bits, R = tier_for(max_bits)
    PX, PY = points
    n = PX.shape[1]
    R = min(R, n)
    if n % R:
        pad = R - (n % R)
        # dummy points with zero scalars (digit 0 -> no-op in the scan)
        PX = jnp.pad(PX, [(0, 0), (0, pad)])
        PY = jnp.pad(PY, [(0, 0), (0, pad)])
        scalars = jnp.pad(scalars, [(0, 0), (0, 0), (0, pad)])
    buckets = _msm_buckets((PX, PY), scalars, c, R, max_bits)
    totals = _msm_aggregate(buckets, c)
    return _msm_horner(totals, c)


# ---------------------------------------------------------------------------
# Fixed-base table MSM (the TPU-native fast path)
#
# Every MSM in the proving pipeline runs against FIXED bases (the SRS
# Lagrange points [L_j(tau)]G1 — SURVEY.md §2.2 "KZG/SHPLONK + Pippenger
# MSM"). That admits a precompute the scan Pippenger above cannot use:
# for every base point P_i, window w and multiple m in 1..2^(c-1), store
#     T[w, m, i] = m * 2^(c*w) * P_i      (affine, built once per SRS)
# A commitment is then sum over all (window, point) lanes of one gathered
# table entry (signed digit -> +-T[w,|d|,i]), reduced by a LOG-DEPTH tree
# of complete Jacobian adds. No sequential bucket scan, no window Horner
# doublings — the whole MSM is ~log2(W*n) fully-vectorized EC-add levels,
# which is what the TPU's dispatch/latency model wants (the round-1 scan
# path was latency-bound at ~4M adds/s; the tree form is compute-bound).
#
# Narrow scalars (most advice values in this circuit are <= 29 bits,
# SURVEY.md §3.5) gather only their low windows: work is n*K*W(bits).
# ---------------------------------------------------------------------------

# Window width / table-memory trade: gathered lanes per column =
# rows * (ceil(bits/c)+1), table bytes = n * (ceil(256/c)+1) * 2^(c-1)
# * 80 (pair-packed limbs). Larger c is a straight lane-count win for
# every tier (the tree reduce does one complete add per lane) bought
# with table HBM:
#   n=8192:  c=4 -> W=65, 0.34 GB;  c=7 -> 38, 1.6 GB;  c=8 -> 33, 2.8 GB
#   n=32768: c=4 -> 1.4 GB;  c=5 -> 2.2 GB
# pick_tab_c chooses the largest c whose table fits ZKFHE_TAB_MB
# (default 3400 MB — k=13 lands on c=8, k=15 on c=5 on a 16 GB v5e).
# ZKFHE_TAB_C forces a specific c.
TAB_MB = int(os.environ.get("ZKFHE_TAB_MB", "3400"))


def pick_tab_c(n: int) -> int:
    forced = os.environ.get("ZKFHE_TAB_C")
    if forced:
        return int(forced)
    if n < 2048:
        # tiny tables (tests, toy circuits): lane count is already small
        # and the W*(2^(c-1)) point ops inside build_table's scan body
        # dominate COMPILE time, so stay at the small window
        return 4
    for c in (8, 7, 6, 5):
        mem = n * num_windows(c) * (1 << (c - 1)) * 80  # pair-packed rows
        if mem <= TAB_MB * (1 << 20):
            return c
    return 4

# width tiers for the table path: scalar-bit bound -> window count.
# 72 covers the BFV hint columns (68-70-bit products, 57-58-bit sums,
# SURVEY.md §3.5) at W=19 instead of the full W=65.
TAB_TIERS = (32, 52, 72, 256)

# tree-reduction flavor for the table MSM: "jacobian" (complete
# Jacobian adds, DEFAULT) or "affine" (batch-inverted affine adds).
# Read at CALL time (not import time) so bench.py's retry ladder can
# flip it in-process; it feeds _j_msm_tab as a static arg, so flipping
# retraces cleanly. Jacobian is the default on measured evidence
# (data/msm_tier_probe.json, 2026-08-19, honest time-to-host):
# jacobian 149/196/221/847 ms vs affine 590/667/773/845 ms per
# K=4,n=8192 launch at the 32/52/72/256-bit tiers — the affine tree's
# fewer muls lose to the SERIAL Fermat-ladder latency inside each
# level's batch inversion, and its full-width form additionally
# OOM'd/failed-to-compile on v5e (round-3 bench kill; HTTP 500 with the
# blocked batch_inv).
def tree_mode(max_bits: int = 0) -> str:
    mode = os.environ.get("ZKFHE_MSM_TREE", "jacobian")
    if mode == "affine" and max_bits >= 256:
        return "jacobian"
    return mode


def tab_tier_bits(max_bits: int) -> int:
    for b in TAB_TIERS:
        if max_bits <= b:
            return b
    return 256


# multiples emitted per inner-scan step of _j_build_table: bounds the
# traced body to TAB_CHUNK point adds (the previous fully-unrolled form
# put all 2^(c-1) multiples in one scan body — at c=8 that graph took
# >40 min on the axon remote-compile path and wedged a whole bench run,
# 2026-08-20; runtime is identical because the multiple chain is a
# sequential data dependency either way)
TAB_CHUNK = 8


@functools.partial(jax.jit, static_argnums=(2, 3))
def _j_build_table(PX, PY, W, c):
    """(L, n) affine Montgomery bases -> (n*W*M, L) pair-packed table
    of m * 2^(c*w) * P_i, point-major: row (i*W + w)*M + (m-1) holds
    [X limbs || Y limbs], two 13-bit limbs packed per u32. Point-major +
    limb-minor so (a) one gathered row is L*4 = 80 contiguous bytes —
    TPU gathers at 4-byte granularity were the measured bottleneck of
    full-width commits, and packing halves that traffic again — and
    (b) a mesh shards the table by contiguous point blocks along
    axis 0. Scan over windows: emit the affine multiples (an inner scan
    of TAB_CHUNK-add steps), then shift by c doublings for the next
    window."""
    L_, n = PX.shape
    one = F.const(FQ, FQ.to_mont_int(1), PX.shape[1:])
    base = (PX, PY, jnp.broadcast_to(jnp.asarray(one), PX.shape))

    M_ = 1 << (c - 1)
    ch = min(TAB_CHUNK, M_)
    nst = M_ // ch  # both powers of two

    def window(state, _):
        X, Y, Z = state

        def mstep(prev, _):
            outs, cur = [], prev
            for _ in range(ch):
                cur = C.point_add(cur, (X, Y, Z))
                outs.append(cur)
            em = tuple(jnp.stack([t[i] for t in outs], axis=1)
                       for i in range(3))  # each (L, ch, n)
            return cur, em

        inf = tuple(F.vary_like(t, X) for t in C.infinity_like(X.shape[1:]))
        _, em = jax.lax.scan(mstep, inf, None, length=nst)
        # (nst, L, ch, n) -> (L, M, n); multiple m sits at index m-1
        mX, mY, mZ = (jnp.moveaxis(t, 0, 1).reshape(L_, M_, n) for t in em)
        aX, aY = C.to_affine_xy((mX, mY, mZ))
        nxt = jax.lax.fori_loop(0, c, lambda _, P: C.point_double(P),
                                (X, Y, Z))
        xy = jnp.concatenate([aX, aY], axis=0)  # (2L, M, n)
        # PACK limb pairs into one u32 (13+13 = 26 bits): halves the
        # table's HBM residency AND the gather traffic per lane — the
        # two measured ceilings of the commit path. Unpacked by
        # _j_msm_tab with two shifts per limb pair.
        return nxt, xy[0::2] | (xy[1::2] << LIMB_PACK_SHIFT)  # (L, M, n)

    _, t = jax.lax.scan(window, base, None, length=W)  # (W, L, M, n)
    return jnp.transpose(t, (3, 0, 2, 1)).reshape(n * W * M_, L_)


# pack two 13-bit limbs per table u32 (see _j_build_table)
LIMB_PACK_SHIFT = F.LIMB_BITS
LIMB_MASK_U32 = jnp.uint32(F.LIMB_MASK)


@dataclasses.dataclass
class PointTable:
    """Precomputed shifted-multiple tables for one fixed base set."""

    XY: jnp.ndarray  # (n*W*M, L) pair-packed limbs, point-major
    n: int
    windows: int
    c: int = 4


def build_table(points, max_bits: int = 256, c: int | None = None) -> PointTable:
    """points: (X, Y) affine Montgomery (L, n) -> PointTable covering
    scalars < 2^max_bits. c defaults to pick_tab_c(n) (largest window
    width whose table fits the ZKFHE_TAB_MB budget)."""
    PX, PY = points
    if c is None:
        c = pick_tab_c(PX.shape[1])
    W = num_windows(c, max_bits)
    t = _j_build_table(PX, PY, W, c)
    return PointTable(XY=t, n=PX.shape[1], windows=W, c=c)


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6))
def _j_msm_tab(tabXY, scalars, c, W_full, max_bits, row_offset,
               mode="affine"):
    """Gather + tree-reduce MSM against a PointTable.

    scalars: (L, K, rows) standard-form limbs; logical point i for column
    entry j is row_offset + j. Returns Jacobian (L, K)."""
    L_ = scalars.shape[0]
    M = 1 << (c - 1)
    K, rows = scalars.shape[1], scalars.shape[2]
    W = num_windows(c, max_bits)
    assert W <= W_full, (W, W_full)

    digits = signed_digits(scalars, c, max_bits)  # (W, K, rows) int32
    digits = jnp.moveaxis(digits, 0, 1)  # (K, W, rows)
    mag = jnp.abs(digits)
    neg = (digits < 0).reshape(K, W * rows)
    live = (mag != 0).reshape(K, W * rows)
    m_idx = jnp.maximum(mag - 1, 0)
    w_idx = jnp.arange(W, dtype=jnp.int32)[None, :, None]
    i_idx = jnp.arange(rows, dtype=jnp.int32)[None, None, :] + row_offset
    flat = ((i_idx * W_full + w_idx) * M + m_idx).reshape(-1)

    g = jnp.take(tabXY, flat, axis=0)  # (K*W*rows, L) 80B/row packed
    g = jnp.transpose(g.reshape(K, W * rows, L_), (2, 0, 1))
    # unpack the 13+13-bit limb pairs (see _j_build_table)
    lo, hi = g & LIMB_MASK_U32, g >> LIMB_PACK_SHIFT
    full = jnp.stack([lo, hi], axis=1).reshape(2 * L_, K, W * rows)
    gx, gy = full[:L_], full[L_:]
    gy = F.select(neg, F.sub(FQ, F.zero((K, W * rows)), gy), gy)
    if mode == "affine":
        # batch-inverted affine tree: ~2x fewer muls and 2/3 the state
        # of the Jacobian tree (ops/curve.tree_reduce_affine)
        return jnp.stack(
            C.tree_reduce_affine((gx, gy, gx), flags=live), axis=0)
    one_m = F.const(FQ, FQ.to_mont_int(1), (K, W * rows))
    gz = F.select(live, jnp.asarray(one_m), F.zero((K, W * rows)))
    return jnp.stack(
        C.tree_reduce_points_halves((gx, gy, gz), first_mixed=True), axis=0)


def msm_tab_stacked(table: PointTable, scalars, max_bits: int = 256,
                    row_offset: int = 0):
    """Async form of msm_tab: returns the stacked (3, L, K) Jacobian
    DEVICE array without slicing or synchronizing, so callers can batch
    many MSMs and pay ONE host transfer for all of them (each device->
    host round trip costs ~hundreds of ms over the remote-TPU tunnel —
    the per-batch decode was 6x the MSM compute itself)."""
    mb = tab_tier_bits(max_bits)
    out = _j_msm_tab(table.XY, scalars, table.c, table.windows, mb,
                     row_offset, tree_mode(mb))
    if os.environ.get("ZKFHE_PROBE"):  # debug
        try:
            jax.block_until_ready(out)
        except Exception as e:
            print(f"[probe msm_tab] EXEC FAILED {type(e).__name__} "
                  f"scalars={scalars.shape} mb={mb} off={row_offset}",
                  flush=True)
            raise
    return out


def msm_tab(table: PointTable, scalars, max_bits: int = 256,
            row_offset: int = 0):
    """MSM of (L, K, rows) standard-form scalars against table points
    [row_offset, row_offset+rows). Returns Jacobian (X, Y, Z) each (L, K).
    max_bits is quantized to TAB_TIERS (bounds the compiled-shape set)."""
    out = msm_tab_stacked(table, scalars, max_bits, row_offset)
    return out[0], out[1], out[2]


def msm_host(points: list[C.AffinePoint], scalars: list[int]) -> C.AffinePoint:
    """Host reference MSM (naive double-and-add) for tests."""
    acc = C.AffinePoint()
    for p, s in zip(points, scalars):
        acc = acc.add(p.mul(s))
    return acc


def msm_host_pippenger(points: list[C.AffinePoint], scalars: list[int],
                       c: int = 8) -> C.AffinePoint:
    """Host Pippenger over Jacobian python-int coordinates. This is the
    verifier's MSM: a few hundred points in ~tens of ms, with zero device
    work (verification must not trigger XLA compiles)."""
    p = FQ.p
    live = [(pt, s % FR.p) for pt, s in zip(points, scalars)
            if not pt.infinity and s % FR.p != 0]
    if not live:
        return C.AffinePoint()
    W = (256 + c - 1) // c
    acc = None
    nb = 1 << c
    for w in range(W - 1, -1, -1):
        if acc is not None:
            for _ in range(c):
                acc = C.jac_double(acc, p)
        buckets = [None] * nb
        shift = c * w
        for pt, s in live:
            d = (s >> shift) & (nb - 1)
            if d:
                buckets[d] = C.jac_add_affine(buckets[d], pt, p)
        run, tot = None, None
        for b in range(nb - 1, 0, -1):
            if buckets[b] is not None:
                run = C.jac_add(run, buckets[b], p)
            if run is not None:
                tot = C.jac_add(tot, run, p)
        acc = C.jac_add(acc, tot, p)
    return C.jac_to_affine(acc, p)
