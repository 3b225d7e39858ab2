"""CPhadL — Lipmaa Hadamard-product argument (FFT/pairing-based).

TPU-native re-design of `InterpCommScheme`/`CPHadL`
(`/root/reference/src/gadgets/lipmaa.{h,cc}`, from eprint 2014/396).

Scheme (trapdoors chi, gamma, toxic waste of keygen):
  commit(v; r): c  = r*Z(chi)*G1 + sum_i v_i * l_i(chi) * G1
                kc = gamma * (same combination) * G2      (`lipmaa.cc:22-30`)
  prove (`lipmaa.cc:94-185`): quotient pipeline
       A = interp(a) + d1*Z, B = interp(b) + d2*Z, C = interp(c) + d3*Z
       H = (A*B - C)/Z  computed as iNTT -> cosetNTT -> pointwise ->
       divide-by-Z-on-coset -> icosetNTT, plus the blinding terms
       d2*interp(a) + d1*interp(b) + d1*d2*Z - d3
       pi = <chi-powers, H coeffs>  (one MSM)
  verify (`lipmaa.cc:187-207`):
       e(ca, kc_b) == e(G1, kc_c) * e(pi, gamma*Z(chi)*G2)

The identity: with hat(A) = A + d1 Z etc., hat(A)*hat(B) - hat(C) =
Z * (H_q + d2 A + d1 B + d1 d2 Z - d3), so both sides equal
e(G1, G2)^(gamma * hat(A)(chi) * hat(B)(chi)) etc. at the trapdoor.

Layout: eval vectors [L, n] (vector axis minor); keygen power/Lagrange
tables are computed on device (prototools.ntt._powers), so a 2^20
domain keygen has no host bigint loops.
"""
from __future__ import annotations

from typing import NamedTuple, Any

import numpy as np
import jax
import jax.numpy as jnp

from ..fields import limb as fl
from ..curve import bn254
from ..curve.group import Point, G1, G2, FR_OPS, g1_generator, g2_generator
from ..curve import msm as msm_mod
from ..prototools import ntt
from ..utils import rand as lrand

FR = bn254.FR
R = bn254.R


class InterpKey(NamedTuple):
    """Lagrange-basis commitment key (`lipmaa.h:36-73`)."""

    n: int
    lag_g1: Point    # [L, n] l_i(chi) * G1
    lag_kg2: Point   # [2, L, n] gamma * l_i(chi) * G2
    z_g1: Point      # Z(chi) * G1
    z_kg2: Point     # gamma * Z(chi) * G2


class HadLKey(NamedTuple):
    """CPHadL proving key: powers of chi (`lipmaa.h:87-108`)."""

    n: int
    chi_pows: Point  # [L, n+1] chi^i * G1
    interp: InterpKey


class InterpComm(NamedTuple):
    c: Point   # G1
    kc: Point  # G2


def proof_size_group_elements() -> dict:
    """pi is one G1 element (`lipmaa.cc:180`)."""
    return {"g1": 1, "g2": 0, "fr": 0}


def keygen(n: int, seed: int = 0) -> HadLKey:
    """Shared-trapdoor keygen (`LGlobalKeygen`, `lipmaa.cc:10-20`)."""
    rng = np.random.default_rng(seed ^ 0x11BA)
    chi = lrand.rand_fr_int(rng)
    gamma = lrand.rand_fr_int(rng)

    chi_m = jnp.asarray(FR.to_mont_int(chi))
    lag = ntt.all_lagrange_at(n, chi_m)              # [L, n] mont
    z = ntt.vanishing_at(n, chi_m)                   # [L, 1] mont
    gamma_m = jnp.asarray(FR.to_mont_int(gamma))
    lag_g = fl.mont_mul(FR, lag, gamma_m)
    z_g = fl.mont_mul(FR, z, gamma_m)

    t1 = msm_mod.fixed_base_table(G1, g1_generator(), c=8)
    t2 = msm_mod.fixed_base_table(G2, g2_generator(), c=8)
    lag_g1 = msm_mod.batch_scalar_mul(G1, t1, fl.from_mont(FR, lag), c=8)
    lag_kg2 = msm_mod.batch_scalar_mul(G2, t2, fl.from_mont(FR, lag_g), c=8)
    z_g1 = G1.scalar_mul(g1_generator(), fl.from_mont(FR, z))
    z_kg2 = G2.scalar_mul(g2_generator(), fl.from_mont(FR, z_g))

    # chi^0..chi^n on device (log-depth doubling), then batch exp
    log_np1 = (n + 1 - 1).bit_length()
    pows = ntt._powers(chi, log_np1)[..., : n + 1]   # [L, n+1] mont
    chi_pows = msm_mod.batch_scalar_mul(
        G1, t1, fl.from_mont(FR, pows), c=8)

    interp = InterpKey(n, lag_g1, lag_kg2, z_g1, z_kg2)
    return HadLKey(n, chi_pows, interp)


def keygen_cached(n: int, seed: int = 0,
                  cache_dir: str | None = None) -> HadLKey:
    """`keygen` with the same disk cache scheme as poly.keygen_cached
    (utils.util.save_point_group): the 2^14 Lagrange/chi-power batch
    exponentiations are the expensive reusable artifact."""
    import os
    from ..utils import util
    cache_dir = cache_dir or os.environ.get(
        "LEGOSNARK_SRS_CACHE", os.path.expanduser("~/.cache/legosnark_srs"))
    path = os.path.join(cache_dir, f"lipmaa_n{n}_s{seed}.npz")
    if os.path.exists(path):
        try:
            g = util.load_point_group(path)
            interp = InterpKey(n, g["lag_g1"], g["lag_kg2"],
                               g["z_g1"], g["z_kg2"])
            return HadLKey(n, g["chi_pows"], interp)
        except Exception:
            pass
    key = keygen(n, seed)
    os.makedirs(cache_dir, exist_ok=True)
    util.save_point_group(path, {
        "lag_g1": key.interp.lag_g1, "lag_kg2": key.interp.lag_kg2,
        "z_g1": key.interp.z_g1, "z_kg2": key.interp.z_kg2,
        "chi_pows": key.chi_pows})
    return key


def commit(key: InterpKey, v_mont, r_mont) -> InterpComm:
    """`InterpCommScheme::commit` (`lipmaa.cc:22-30`): Lagrange-basis
    MSMs in G1 and the gamma-shifted G2 leg, plus r * Z(chi)."""
    v_can = fl.from_mont(FR, v_mont)
    r_can = fl.from_mont(FR, r_mont)
    c = G1.add(msm_mod.msm(G1, key.lag_g1, v_can),
               G1.scalar_mul(key.z_g1, r_can))
    kc = G2.add(msm_mod.msm(G2, key.lag_kg2, v_can),
                G2.scalar_mul(key.z_kg2, r_can))
    return InterpComm(c, kc)


def check_commit(key: InterpKey, cm: InterpComm):
    """Well-formedness (`lipmaa.cc:33-41`): the commitment pair must
    satisfy e(c, z_kg2) == e(z_g1, kc) — both sides equal
    e(G1, G2)^(gamma * Z(chi) * val(chi))."""
    from ..curve import pairing as pr
    return pr.simple_pairing_check(cm.c, key.z_kg2, key.z_g1, cm.kc)


def prove(key: HadLKey, a_evals, b_evals, c_evals, d_mont) -> Point:
    """Quotient pipeline (`lipmaa.cc:94-185`). d_mont: [L, 3] blinding
    (pass zeros to mirror the reference's deterministic benchmark runs
    with the commitments' r = 0)."""
    n = key.n
    d1 = d_mont[..., 0:1]
    d2 = d_mont[..., 1:2]
    d3 = d_mont[..., 2:3]

    a_c = ntt.intt(a_evals)          # interpolating coefficients
    b_c = ntt.intt(b_evals)
    c_c = ntt.intt(c_evals)

    a_cos = ntt.coset_ntt(a_c)
    b_cos = ntt.coset_ntt(b_c)
    c_cos = ntt.coset_ntt(c_c)

    prod = fl.sub(FR, fl.mont_mul(FR, a_cos, b_cos), c_cos)
    hq = ntt.coset_intt(ntt.divide_by_z_on_coset(prod))   # [L, n]

    # blinding terms: H = H_q + d2*A + d1*B + d1*d2*Z - d3
    h = fl.add(FR, hq, fl.mont_mul(FR, a_c, d2))
    h = fl.add(FR, h, fl.mont_mul(FR, b_c, d1))
    d12 = fl.mont_mul(FR, d1, d2)
    # Z = x^n - 1: -1*d12 - d3 to coeff 0, +d12 to coeff n
    h0 = fl.sub(FR, fl.sub(FR, h[..., 0:1], d12), d3)
    h_full = jnp.concatenate([h0, h[..., 1:], d12], axis=-1)  # [L, n+1]

    return msm_mod.msm(G1, key.chi_pows, fl.from_mont(FR, h_full))


def verify(key: HadLKey, ca: InterpComm, cb: InterpComm, cc: InterpComm,
           pi: Point):
    """e(ca, cb.kc) == e(G1, cc.kc) * e(pi, gamma*Z(chi)*G2)
    (`lipmaa.cc:187-207`) as one product-of-pairings == 1."""
    from ..curve import pairing as pr
    g1s = pr.point_concat([G1.neg(ca.c), g1_generator(), pi])
    g2s = pr.point_concat([cb.kc, cc.kc, key.interp.z_kg2])
    return pr.pairing_product_is_one(g1s, g2s)
