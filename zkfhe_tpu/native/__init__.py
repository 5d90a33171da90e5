"""ctypes loader for the native verifier core (native/zkfhe_native.cc).

Builds the shared library on first use (g++ -O3, ~2 s) and caches it
next to the source, keyed by a source hash so edits rebuild. Every
entry point has a pure-python fallback (ops/msm.msm_host_pippenger,
backend/pairing.pairing_check) — the native path is an accelerator,
not a dependency; ZKFHE_NATIVE=0 disables it and tests assert
bit-identical results between the two.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sys

_LIB = None
_TRIED = False

_SRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "native", "zkfhe_native.cc")


def _build_and_load():
    with open(_SRC, "rb") as f:
        src = f.read()
    tag = hashlib.sha256(src).hexdigest()[:16]
    so_path = os.path.join(os.path.dirname(_SRC),
                           f"libzkfhe_native.{tag}.so")
    if not os.path.exists(so_path):
        tmp = so_path + f".tmp{os.getpid()}"
        cmd = ["g++", "-O3", "-shared", "-fPIC", "-o", tmp, _SRC]
        res = subprocess.run(cmd, capture_output=True, text=True,
                             timeout=120)
        if res.returncode != 0:
            raise RuntimeError(f"native build failed:\n{res.stderr}")
        os.replace(tmp, so_path)
    lib = ctypes.CDLL(so_path)
    lib.zk_init.argtypes = [ctypes.c_char_p]
    lib.zk_init.restype = ctypes.c_int
    lib.zk_msm.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                           ctypes.c_char_p, ctypes.c_uint64,
                           ctypes.c_char_p]
    lib.zk_msm.restype = ctypes.c_int
    lib.zk_pairing_check.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                     ctypes.c_char_p, ctypes.c_char_p,
                                     ctypes.c_uint64]
    lib.zk_pairing_check.restype = ctypes.c_int
    from ..ops.field import BN254_FQ
    rc = lib.zk_init(int(BN254_FQ).to_bytes(32, "little"))
    if rc != 0:
        raise RuntimeError(f"zk_init failed rc={rc}")
    return lib


def get_lib():
    """The loaded native library, or None (unavailable/disabled)."""
    global _LIB, _TRIED
    if os.environ.get("ZKFHE_NATIVE", "1") == "0":
        return None
    if not _TRIED:
        _TRIED = True
        try:
            _LIB = _build_and_load()
        except Exception as e:  # noqa: BLE001 — fall back to python
            print(f"[zkfhe] native core unavailable ({e}); "
                  "using python fallbacks", file=sys.stderr)
            _LIB = None
    return _LIB


def msm(points, scalars):
    """sum_i scalars[i]*points[i] over AffinePoint/int lists, or None if
    the native core is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    from ..ops.curve import AffinePoint
    n = len(points)
    pts = bytearray(64 * n)
    infs = bytearray(n)
    scs = bytearray(32 * n)
    for i, (p, s) in enumerate(zip(points, scalars)):
        if p.infinity:
            infs[i] = 1
        else:
            pts[64 * i:64 * i + 32] = int(p.x).to_bytes(32, "little")
            pts[64 * i + 32:64 * i + 64] = int(p.y).to_bytes(32, "little")
        scs[32 * i:32 * i + 32] = int(s).to_bytes(32, "little")
    out = bytes(65)
    rc = lib.zk_msm(bytes(pts), bytes(infs), bytes(scs), n, out)
    if rc != 0:
        return None
    if out[64]:
        return AffinePoint()
    return AffinePoint(int.from_bytes(out[:32], "little"),
                       int.from_bytes(out[32:64], "little"))


def pairing_check(pairs):
    """prod e(P_i, Q_i) == 1 for [(AffinePoint, g2_tuple_or_None)], or
    None if the native core is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    k = len(pairs)
    g1 = bytearray(64 * k)
    g1inf = bytearray(k)
    g2 = bytearray(128 * k)
    g2inf = bytearray(k)
    for i, (p, q) in enumerate(pairs):
        if p.infinity:
            g1inf[i] = 1
        else:
            g1[64 * i:64 * i + 32] = int(p.x).to_bytes(32, "little")
            g1[64 * i + 32:64 * i + 64] = int(p.y).to_bytes(32, "little")
        if q is None:
            g2inf[i] = 1
        else:
            (x0, x1), (y0, y1) = q
            g2[128 * i:128 * i + 32] = int(x0).to_bytes(32, "little")
            g2[128 * i + 32:128 * i + 64] = int(x1).to_bytes(32, "little")
            g2[128 * i + 64:128 * i + 96] = int(y0).to_bytes(32, "little")
            g2[128 * i + 96:128 * i + 128] = int(y1).to_bytes(32, "little")
    rc = lib.zk_pairing_check(bytes(g1), bytes(g1inf), bytes(g2),
                              bytes(g2inf), k)
    return bool(rc)
