"""BN254 pairing: bilinearity and degeneracy (host exact)."""
import time

from zkfhe_tpu.backend import pairing as PR
from zkfhe_tpu.ops.curve import AffinePoint, G1_GEN
from zkfhe_tpu.ops.field import BN254_FR as R


def test_g2_generator_on_curve():
    assert PR.g2_on_curve(PR.G2_GEN)
    assert PR.g2_on_curve(PR.g2_add(PR.G2_GEN, PR.G2_GEN))
    assert PR.g2_on_curve(PR.g2_mul(PR.G2_GEN, 12345))
    assert PR.g2_mul(PR.G2_GEN, R) is None  # group order


def test_pairing_bilinearity():
    e1 = PR.pairing(G1_GEN, PR.G2_GEN)
    assert e1 != PR.F12_ONE  # non-degenerate
    a, b = 7, 11
    lhs = PR.pairing(G1_GEN.mul(a), PR.g2_mul(PR.G2_GEN, b))
    rhs = PR.f12_pow(e1, a * b)
    assert lhs == rhs


def test_pairing_check_product():
    # e(aG, G2) * e(-G, aG2) == 1
    a = 1234567
    ok = PR.pairing_check([
        (G1_GEN.mul(a), PR.G2_GEN),
        (G1_GEN.mul(a).neg(), PR.G2_GEN),
    ])
    assert ok
    ok2 = PR.pairing_check([
        (G1_GEN.mul(a), PR.G2_GEN),
        (G1_GEN.neg(), PR.g2_mul(PR.G2_GEN, a)),
    ])
    assert ok2
    bad = PR.pairing_check([
        (G1_GEN.mul(a), PR.G2_GEN),
        (G1_GEN.neg(), PR.g2_mul(PR.G2_GEN, a + 1)),
    ])
    assert not bad
