"""Circuit tracing, layout extraction, and the mock constraint checker.

`trace_layout` runs a circuit function under `jax.eval_shape` so the static
layout (gate regions, copies, constants, lookups, instance) is recorded
with ZERO compute; `make_witgen` jits the same function for real witness
values — one code path for both, which is what makes the IR sound by
construction (layout and values can never diverge).

`mock_check` is the MockProver equivalent (SURVEY.md §3.1 / §2.2): it
evaluates every gate row, copy, constant, challenge pin and lookup bound
directly on the trace arrays with vectorized field ops and reports the
violating rows — no cryptography, fast path for tests.
"""
from __future__ import annotations

import dataclasses
from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import field as F
from .builder import (Builder, CTX_LK, CTX_P0, CTX_P1, CTX_WIDE,
                      LOOKUP_BITS, NUM_CTX)


@dataclasses.dataclass
class Layout:
    """Static layout snapshot of a traced circuit."""

    field: F.Field
    sizes: list  # cells per context
    gate_starts: dict  # ctx -> (G,) int64 region starts
    copies: list  # (ctx_a, idx_a, ctx_b, idx_b)
    const_idx: dict  # ctx -> (C,) int64
    const_vals: dict  # ctx -> (C,) python ints
    challenge_idx: np.ndarray  # CTX_WIDE offsets
    instance_refs: list  # (ctx, idx array) in exposure order
    cell_bits: dict  # ctx -> (size,) int16 static per-cell value bound

    @property
    def num_instance(self) -> int:
        return sum(len(i) for _, i in self.instance_refs)


def snapshot_layout(bld: Builder) -> Layout:
    gate_starts = {
        ctx: (np.concatenate(regions) if regions
              else np.zeros(0, dtype=np.int64))
        for ctx, regions in bld.gate_regions.items()
    }
    const_idx = {c: [] for c in range(NUM_CTX)}
    const_vals = {c: [] for c in range(NUM_CTX)}
    for ctx, idx, value in bld.constants:
        const_idx[ctx].append(np.atleast_1d(idx))
        const_vals[ctx].extend([value] * len(np.atleast_1d(idx)))
    for c in range(NUM_CTX):
        const_idx[c] = (
            np.concatenate(const_idx[c])
            if const_idx[c]
            else np.zeros(0, dtype=np.int64)
        )
    challenge_idx = (
        np.concatenate(bld.challenge_cells)
        if bld.challenge_cells
        else np.zeros(0, dtype=np.int64)
    )
    # merge copy constraints by (ctx_a, ctx_b) pair: O(1) array groups
    merged = {}
    for a, ai, b, bi in bld.copies:
        merged.setdefault((a, b), ([], []))
        merged[(a, b)][0].append(np.atleast_1d(ai))
        merged[(a, b)][1].append(np.atleast_1d(bi))
    copies = [
        (a, np.concatenate(ais), b, np.concatenate(bis))
        for (a, b), (ais, bis) in merged.items()
    ]
    return Layout(
        field=bld.field,
        sizes=list(bld.sizes),
        gate_starts=gate_starts,
        copies=copies,
        const_idx=const_idx,
        const_vals=const_vals,
        challenge_idx=challenge_idx,
        instance_refs=[(cv.ctx, cv.idx) for cv in bld.instance],
        cell_bits={c: bld.finalize_bits(c) for c in range(NUM_CTX)},
    )


def run_circuit(circuit_fn: Callable, inputs, gamma):
    """Run a circuit function, returning (builder, trace value arrays).

    circuit_fn(bld, inputs) builds the whole two-phase circuit; `gamma` is
    the (L,) challenge value (zeros for phase-0-only evaluation)."""
    bld = Builder()
    bld.set_challenge(gamma)
    circuit_fn(bld, inputs)
    values = tuple(bld.finalize_values(c) for c in range(NUM_CTX))
    instance = (
        jnp.concatenate([cv.val for cv in bld.instance], axis=1)
        if bld.instance
        else jnp.zeros((F.NLIMBS, 0), dtype=jnp.uint32)
    )
    return bld, values, instance


def trace_layout(circuit_fn: Callable, example_inputs) -> Layout:
    """Extract the static layout without computing any witness values."""
    captured = {}

    def wrapper(inputs):
        gamma = jnp.zeros((F.NLIMBS,), dtype=jnp.uint32)
        bld, values, instance = run_circuit(circuit_fn, inputs, gamma)
        captured["bld"] = bld
        return values, instance

    jax.eval_shape(wrapper, example_inputs)
    return snapshot_layout(captured["bld"])


_witgen_cache = {}


def make_witgen(circuit_fn: Callable):
    """Jitted witness generator: (inputs, gamma) -> (values, instance).
    Memoized per circuit function so repeated proofs reuse the compiled
    executable instead of retracing."""
    if circuit_fn in _witgen_cache:
        return _witgen_cache[circuit_fn]

    @jax.jit
    def witgen(inputs, gamma):
        _, values, instance = run_circuit(circuit_fn, inputs, gamma)
        return values, instance

    _witgen_cache[circuit_fn] = witgen
    return witgen


_witgen_p0_cache = {}


def make_witgen_p0(circuit_fn: Callable):
    """Phase-0 witness generator: (inputs,) -> (values[CTX_P0], instance),
    at the zero challenge. Returning ONLY the phase-0 context and the
    public instance lets XLA dead-code-eliminate every gamma-dependent
    (phase-1/wide) and lookup-decomposition computation from the
    executable — the prover's first pass exists solely to commit phase-0
    columns and absorb the publics before gamma is squeezed, so the full
    trace it previously computed (and the full-width advice iNTT that
    followed) was discarded work."""
    if circuit_fn in _witgen_p0_cache:
        return _witgen_p0_cache[circuit_fn]

    @jax.jit
    def witgen_p0(inputs):
        gamma = jnp.zeros((F.NLIMBS,), dtype=jnp.uint32)
        _, values, instance = run_circuit(circuit_fn, inputs, gamma)
        return values[CTX_P0], instance

    _witgen_p0_cache[circuit_fn] = witgen_p0
    return witgen_p0


# ---------------------------------------------------------------------------
# Mock prover
# ---------------------------------------------------------------------------

def mock_check(layout: Layout, values, gamma, verbose: bool = True) -> dict:
    """Evaluate every constraint class directly on the trace.

    Returns {category: np.ndarray of violating positions}; empty dict
    values everywhere means the witness satisfies the circuit. This is the
    framework's MockProver (reference behavior: halo2 MockProver
    `assert_satisfied`, driven by the `mock` CLI verb, README.md:19-26).
    """
    fld = layout.field
    out = {}

    def gate_res(vals, starts):
        if len(starts) == 0:
            return np.zeros(0, dtype=bool)
        s = jnp.asarray(starts)
        A = vals[:, s]
        B = vals[:, s + 1]
        C = vals[:, s + 2]
        D = vals[:, s + 3]
        bc = F.mont_mul(fld, F.to_mont(fld, B), C)
        lhs = F.add(fld, A, bc)
        return np.asarray(~F.eq(lhs, D))

    for ctx in (CTX_P0, CTX_P1, CTX_WIDE):
        bad = gate_res(values[ctx], layout.gate_starts[ctx])
        out[f"gate_ctx{ctx}"] = np.nonzero(bad)[0]

    copy_bad = []
    for ctx_a, idx_a, ctx_b, idx_b in layout.copies:
        va = values[ctx_a][:, jnp.asarray(idx_a)]
        vb = values[ctx_b][:, jnp.asarray(idx_b)]
        neq = np.asarray(~F.eq(va, vb))
        copy_bad.append(np.nonzero(neq)[0])
    out["copies"] = (
        np.concatenate(copy_bad) if copy_bad else np.zeros(0, dtype=np.int64)
    )

    const_bad = []
    for ctx in range(NUM_CTX):
        idx = layout.const_idx[ctx]
        if len(idx) == 0:
            continue
        want = jnp.asarray(
            F.ints_to_array([v % fld.p for v in layout.const_vals[ctx]])
        )
        got = values[ctx][:, jnp.asarray(idx)]
        neq = np.asarray(~F.eq(got, want))
        const_bad.append(np.nonzero(neq)[0])
    out["constants"] = (
        np.concatenate(const_bad) if const_bad else np.zeros(0, dtype=np.int64)
    )

    if len(layout.challenge_idx):
        got = values[CTX_WIDE][:, jnp.asarray(layout.challenge_idx)]
        want = jnp.broadcast_to(gamma[:, None], got.shape)
        out["challenge"] = np.nonzero(np.asarray(~F.eq(got, want)))[0]
    else:
        out["challenge"] = np.zeros(0, dtype=np.int64)

    lk = values[CTX_LK]
    if lk.shape[1]:
        too_big = np.asarray(
            (lk[0] >= (1 << LOOKUP_BITS)) | jnp.any(lk[1:] != 0, axis=0)
        )
        out["lookup"] = np.nonzero(too_big)[0]
    else:
        out["lookup"] = np.zeros(0, dtype=np.int64)

    if verbose:
        for k, v in out.items():
            if len(v):
                print(f"mock_check: {len(v)} violations in {k}: {v[:10]}")
    return out


def assert_satisfied(layout: Layout, values, gamma):
    res = mock_check(layout, values, gamma)
    bad = {k: v for k, v in res.items() if len(v)}
    assert not bad, f"constraint violations: { {k: len(v) for k, v in bad.items()} }"
