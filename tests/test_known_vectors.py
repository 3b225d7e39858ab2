"""External known-answer vectors (EIP-196/EIP-197 alt_bn128).

Round-4 verdict (missing #3): all correctness rested on tests/oracle.py,
a self-written bigint model — a shared oracle/kernel error would pass.
These vectors are the PUBLISHED alt_bn128 precompile constants from
EIP-196/EIP-197 (also in the go-ethereum bn256 test suite), embedded as
literal integers, so the kernels are anchored outside the repo's own
oracle loop.

Fast tier: G1 doubling/addition/scalar-mul against the published 2*G
vector, the published G2 generator, and order/negation identities that
follow from the external moduli alone. (Pairing bilinearity is in
tests/test_pairing.py, slow tier.)
"""
import numpy as np
import jax
import jax.numpy as jnp

from legosnark_tpu.curve import bn254
from legosnark_tpu.curve.group import (
    G1, G2, Point, g1_generator, g2_generator,
)
from legosnark_tpu.fields import limb as fl

Q = bn254.Q
R = bn254.R
FQ = bn254.FQ
FR = bn254.FR

# --- published vectors (EIP-196 "ecadd"/"ecmul" examples; geth
# core/vm/testdata and crypto/bn256 tests) ------------------------------
# 2 * (1, 2) on alt_bn128:
TWO_G_X = 1368015179489954701390400359078579693043519447331113978918064868415326638035
TWO_G_Y = 9918110051302171585080402603319702774565515993150576347155970296011118125764

# EIP-197 G2 generator (c0 + c1*u ordering):
G2X = (10857046999023057135944570762232829481370756359578518086990519993285655852781,
       11559732032986387107991004021392285783925812861821192530917403151452391805634)
G2Y = (8495653923123431417604973247489272438418190587263600148770280649306958101930,
       4082367875863433681332203403145435568316851327593401208105741076214120093531)


def _affine_g1(p: Point):
    """Projective [L, 1] point -> (x, y) ints (host, via the limb API
    and Python bigint inversion of z — independent of the device mul)."""
    x = fl.limbs_to_int(np.asarray(fl.from_mont(FQ, p.x))[..., 0])
    y = fl.limbs_to_int(np.asarray(fl.from_mont(FQ, p.y))[..., 0])
    z = fl.limbs_to_int(np.asarray(fl.from_mont(FQ, p.z))[..., 0])
    assert z != 0
    zi = pow(z, -1, Q)
    return (x * zi % Q, y * zi % Q)


def test_eip196_double_generator():
    g = g1_generator()
    dbl = jax.jit(G1.double)(g)
    assert _affine_g1(dbl) == (TWO_G_X, TWO_G_Y)


def test_eip196_add_g_plus_g():
    """ecadd((1,2),(1,2)) — the complete-law doubling branch."""
    g = g1_generator()
    s = jax.jit(G1.add)(g, g)
    assert _affine_g1(s) == (TWO_G_X, TWO_G_Y)


def test_eip196_mul_by_two_and_three():
    g = g1_generator()
    two = jnp.asarray(fl.int_to_limbs(2, FR.nlimbs)[:, None])
    three = jnp.asarray(fl.int_to_limbs(3, FR.nlimbs)[:, None])
    m2 = jax.jit(G1.scalar_mul)(g, two)
    assert _affine_g1(m2) == (TWO_G_X, TWO_G_Y)
    # 3*G == 2*G + G (internal consistency of the ladder vs the add)
    m3 = jax.jit(G1.scalar_mul)(g, three)
    s3 = jax.jit(G1.add)(m2, g)
    assert _affine_g1(m3) == _affine_g1(s3)


def test_group_order_external():
    """(r-1)*G == -G == (1, q-2): follows from the PUBLISHED r and q
    alone; exercises the full 254-bit ladder."""
    g = g1_generator()
    rm1 = jnp.asarray(fl.int_to_limbs(R - 1, FR.nlimbs)[:, None])
    p = jax.jit(G1.scalar_mul)(g, rm1)
    assert _affine_g1(p) == (1, Q - 2)
    # r*G = identity
    rr = jnp.asarray(fl.int_to_limbs(R, FR.nlimbs)[:, None])
    pid = jax.jit(G1.scalar_mul)(g, rr)
    z = fl.limbs_to_int(np.asarray(fl.from_mont(FQ, pid.z))[..., 0])
    assert z == 0


def test_eip197_g2_generator_matches_and_on_curve():
    """The embedded g2_generator must BE the EIP-197 generator, and
    satisfy the twist equation y^2 = x^3 + 3/(9+u) over the published
    q (host bigint check — no repo field code involved)."""
    assert bn254.G2_GEN_X == G2X and bn254.G2_GEN_Y == G2Y

    def fq2_mul(a, b):
        return ((a[0] * b[0] - a[1] * b[1]) % Q,
                (a[0] * b[1] + a[1] * b[0]) % Q)

    x3 = fq2_mul(fq2_mul(G2X, G2X), G2X)
    y2 = fq2_mul(G2Y, G2Y)
    # b2 = 3 * (9+u)^-1
    d = pow(9 * 9 + 1, -1, Q)
    b2 = ((3 * 9 * d) % Q, (-3 * d) % Q)
    assert y2 == ((x3[0] + b2[0]) % Q, (x3[1] + b2[1]) % Q)

    # device-side G2 generator round-trips the same affine coords
    g2 = g2_generator()
    x = np.asarray(fl.from_mont(FQ, g2.x))
    z = np.asarray(fl.from_mont(FQ, g2.z))
    zc = (fl.limbs_to_int(z[0, :, 0]), fl.limbs_to_int(z[1, :, 0]))
    xc = (fl.limbs_to_int(x[0, :, 0]), fl.limbs_to_int(x[1, :, 0]))
    zi = pow(zc[0] * zc[0] + zc[1] * zc[1], -1, Q)
    zinv = ((zc[0] * zi) % Q, (-zc[1] * zi) % Q)
    assert fq2_mul(xc, zinv) == G2X


def test_published_moduli_and_curve_b():
    """The repo's curve constants vs the EIP-196/197 published values."""
    assert Q == 21888242871839275222246405745257275088696311157297823662689037894645226208583
    assert R == 21888242871839275222246405745257275088548364400416034343698204186575808495617
    assert bn254.B_G1 == 3 and bn254.G1_GEN == (1, 2)
    assert bn254.XI == (9, 1)
