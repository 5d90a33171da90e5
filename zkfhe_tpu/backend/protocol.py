"""Shared protocol schedule: commitment order, opening schedule, term list.

Prover and verifier both iterate these EXACT sequences; any drift breaks
verification, so they live in one module. Roles mirror halo2's protocol
description (SURVEY.md §3.3): phase-0 advice -> gamma -> phase-1 advice ->
lookup (logUp) -> permutation -> vanishing -> multiopen (GWC flavor).
"""
from __future__ import annotations

import dataclasses

from .assembly import LOOKUP_GROUP, PERM_CHUNK

# rotation tags for the opening schedule
ROT_LAST = "last"  # omega^usable * x (permutation chunk chaining)


def num_lookup_groups(shape) -> int:
    t = shape["num_lk_cols"]
    return -(-t // LOOKUP_GROUP) if t else 0


def num_perm_chunks(shape) -> int:
    return -(-shape["num_perm_cols"] // PERM_CHUNK)


def build_terms(shape) -> list:
    """Ordered constraint terms (must match assembly.build_terms)."""
    terms = []
    for col in shape["sel_cols"]:
        terms.append(("gate", col))
    for col in shape["chal_cols"]:
        terms.append(("challenge", col))
    for g in range(num_lookup_groups(shape)):
        terms.append(("lookup_h", g))
    if shape["num_lk_cols"]:
        terms.append(("lookup_table", 0))
        terms.append(("lookup_acc", 0))
        terms.append(("lookup_first", 0))
        terms.append(("lookup_last", 0))
    terms.append(("perm_first", 0))
    for j in range(num_perm_chunks(shape)):
        terms.append(("perm_chunk", j))
    for j in range(1, num_perm_chunks(shape)):
        terms.append(("perm_chain", j))
    terms.append(("perm_last", 0))
    return terms


def fixed_poly_names(shape) -> list:
    names = ["const", "table", "q_act", "q_first", "q_last"]
    names += [f"sel_{c}" for c in shape["sel_cols"]]
    names += [f"qgamma_{c}" for c in shape["chal_cols"]]
    return names


def opening_schedule(shape) -> list:
    """Ordered list of (poly_name, rotation) opened in the proof.
    Rotations: 0..3 (gate rotations), ROT_LAST. Poly names:
      adv{i}, fixed{i}, sigma{i}, lookup_m, lookup_h{g}, lookup_g,
      lookup_phi, perm_z{j}, random, quot{i}
    """
    sched = []
    ngate = shape["num_gate_cols"]
    na = shape["num_advice"]
    gate_cols = set(shape["sel_cols"])
    for i in range(na):
        sched.append((f"adv{i}", 0))
        if i < ngate and i in gate_cols:
            sched.append((f"adv{i}", 1))
            sched.append((f"adv{i}", 2))
            sched.append((f"adv{i}", 3))
    for i, _ in enumerate(fixed_poly_names(shape)):
        sched.append((f"fixed{i}", 0))
    for i in range(shape["num_perm_cols"]):
        sched.append((f"sigma{i}", 0))
    if shape["num_lk_cols"]:
        sched.append(("lookup_m", 0))
        for g in range(num_lookup_groups(shape)):
            sched.append((f"lookup_h{g}", 0))
        sched.append(("lookup_g", 0))
        sched.append(("lookup_phi", 0))
        sched.append(("lookup_phi", 1))
    nz = num_perm_chunks(shape)
    for j in range(nz):
        sched.append((f"perm_z{j}", 0))
        sched.append((f"perm_z{j}", 1))
        if j < nz - 1:
            sched.append((f"perm_z{j}", ROT_LAST))
    sched.append(("random", 0))
    for i in range(NUM_QUOT_CHUNKS):
        sched.append((f"quot{i}", 0))
    return sched


NUM_QUOT_CHUNKS = 5  # max constraint degree 6 -> h degree <= 5n-6, 5 chunks

ROTATIONS = [0, 1, 2, 3, ROT_LAST]  # distinct opening point multipliers
