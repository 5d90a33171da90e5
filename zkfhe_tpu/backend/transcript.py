"""Blake2b Fiat-Shamir transcript + proof byte stream.

Host-side orchestration of challenges (halo2-axiom uses a Blake2b
transcript — SURVEY.md §2.2 "Transcript"); all device kernels hand their
commitments/evals here. Serialization: points as 64-byte (x||y) LE affine
(infinity = all zeros), scalars as 32-byte LE. The proof is the exact byte
stream the prover wrote; the verifier reads and absorbs in the same order.

Deserialization is strict (ADVICE.md round-1 high/medium findings): point
coordinates must be canonical (< q) and on the curve (BN254 G1 has
cofactor 1, so on-curve implies the right subgroup), scalars must be
canonical (< r), reads past the end of the proof raise, and the verifier
checks the stream is exactly consumed — otherwise off-curve points would
flow into the MSM/pairing (invalid-point forgery) and encodings would be
malleable.
"""
from __future__ import annotations

import hashlib

from ..ops.curve import AffinePoint
from ..ops.field import BN254_FQ as Q_MOD, BN254_FR as R_MOD


class ProofError(ValueError):
    """Malformed proof bytes (non-canonical or truncated encoding)."""


def _point_bytes(p: AffinePoint) -> bytes:
    if p.infinity:
        return b"\x00" * 64
    return p.x.to_bytes(32, "little") + p.y.to_bytes(32, "little")


def _scalar_bytes(s: int) -> bytes:
    return (s % R_MOD).to_bytes(32, "little")


class Transcript:
    """Write/read transcript with chained Blake2b squeezes."""

    def __init__(self, proof: bytes | None = None):
        self._h = hashlib.blake2b(b"zkfhe-tpu-v1")
        self._buf = bytearray()  # written proof bytes (prover mode)
        self._read = memoryview(proof) if proof is not None else None
        self._pos = 0

    # -- absorb-only (public inputs etc.) -----------------------------------
    def common_scalar(self, s: int):
        self._h.update(b"cs" + _scalar_bytes(s))

    def common_point(self, p: AffinePoint):
        self._h.update(b"cp" + _point_bytes(p))

    def common_bytes(self, data: bytes):
        """Absorb opaque context (e.g. the vk digest) with length framing."""
        self._h.update(b"cb" + len(data).to_bytes(8, "little") + data)

    # -- prover: write + absorb ---------------------------------------------
    def write_point(self, p: AffinePoint):
        b = _point_bytes(p)
        self._h.update(b"wp" + b)
        self._buf += b

    def write_scalar(self, s: int):
        b = _scalar_bytes(s)
        self._h.update(b"ws" + b)
        self._buf += b

    # -- verifier: read + absorb --------------------------------------------
    def _take(self, count: int) -> bytes:
        if self._read is None or self._pos + count > len(self._read):
            raise ProofError("proof truncated")
        b = bytes(self._read[self._pos:self._pos + count])
        self._pos += count
        return b

    def read_point(self) -> AffinePoint:
        b = self._take(64)
        self._h.update(b"wp" + b)
        if b == b"\x00" * 64:
            return AffinePoint()
        x = int.from_bytes(b[:32], "little")
        y = int.from_bytes(b[32:], "little")
        if x >= Q_MOD or y >= Q_MOD:
            raise ProofError("non-canonical point coordinate")
        p = AffinePoint(x, y)
        if not p.on_curve():
            raise ProofError("point not on curve")
        return p

    def read_scalar(self) -> int:
        b = self._take(32)
        self._h.update(b"ws" + b)
        s = int.from_bytes(b, "little")
        if s >= R_MOD:
            raise ProofError("non-canonical scalar")
        return s

    def assert_consumed(self):
        """The proof must be exactly the bytes the protocol reads —
        trailing garbage would make encodings malleable."""
        if self._read is None or self._pos != len(self._read):
            raise ProofError("proof has trailing bytes")

    # -- challenges ---------------------------------------------------------
    def challenge(self) -> int:
        d = self._h.copy().digest()  # 64 bytes
        self._h.update(b"ch" + d)
        return int.from_bytes(d, "little") % R_MOD

    def proof_bytes(self) -> bytes:
        return bytes(self._buf)
