"""Native verifier core (native/zkfhe_native.cc) vs the python ground
truth: MSM identity against msm_host_pippenger, pairing bilinearity and
identity against backend/pairing.py. Skipped if g++ is unavailable."""
import random

import pytest

from zkfhe_tpu import native as NAT
from zkfhe_tpu.backend import pairing as PR
from zkfhe_tpu.ops import curve as C
from zkfhe_tpu.ops import msm as M
from zkfhe_tpu.ops.field import BN254_FR as R

pytestmark = pytest.mark.skipif(NAT.get_lib() is None,
                                reason="native core unavailable")


def test_native_msm_matches_host():
    rng = random.Random(5)
    pts = [C.G1_GEN.mul(rng.randrange(1, R)) for _ in range(17)]
    pts.append(C.AffinePoint())  # infinity handling
    scs = [rng.randrange(R) for _ in range(len(pts))]
    scs[3] = 0
    want = M.msm_host_pippenger(pts, scs)
    got = NAT.msm(pts, scs)
    assert got == want


def test_native_msm_empty_and_zero():
    assert NAT.msm([], []) == C.AffinePoint()
    assert NAT.msm([C.G1_GEN], [0]) == C.AffinePoint()


def test_native_pairing_bilinearity():
    rng = random.Random(6)
    a = rng.randrange(1, 1 << 64)
    b = rng.randrange(1, 1 << 64)
    P = C.G1_GEN.mul(a)
    Q2 = PR.g2_mul(PR.G2_GEN, b)
    Pab = C.G1_GEN.mul(a * b % R)
    # e(aP, bQ) * e(-abP, Q) == 1
    assert NAT.pairing_check([(P, Q2), (Pab.neg(), PR.G2_GEN)]) is True
    # and a perturbed pair fails
    Pbad = C.G1_GEN.mul((a * b + 1) % R)
    assert NAT.pairing_check([(P, Q2), (Pbad.neg(), PR.G2_GEN)]) is False


def test_native_pairing_matches_python():
    rng = random.Random(7)
    for trial in range(2):
        a = rng.randrange(1, 1 << 32)
        b = rng.randrange(1, 1 << 32)
        pairs = [
            (C.G1_GEN.mul(a), PR.g2_mul(PR.G2_GEN, b)),
            (C.G1_GEN.mul(a * b % R).neg(), PR.G2_GEN),
        ]
        if trial:
            pairs[0] = (C.G1_GEN.mul(a + 1), pairs[0][1])
        assert NAT.pairing_check(pairs) == PR.pairing_check(pairs)


def test_native_pairing_infinity_pairs():
    # e(O, Q) = e(P, O) = 1
    assert NAT.pairing_check([(C.AffinePoint(), PR.G2_GEN)]) is True
    assert NAT.pairing_check([(C.G1_GEN, None)]) is True
