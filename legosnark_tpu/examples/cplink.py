"""CPlink end-to-end demo — mirror of `examples/cplink.cc`.

Commits the same vector u under two independent CommScheme keys via the
CPInputFmt flow (`gadgets/snark.init_no_pub` over `prototools/commit` —
the reference's input plumbing, `snark.h:65-82`), builds the
2 x (2 + N) linking relation as a col-major SPARSE matrix
(`utils/sparse.insert_as_col_major`, `matrix.h:53-61`), runs the
subspace argument with the sparse scalar fast keygen
(`subspace.keygen_scalar_sparse` -> `sparse_inner_product`,
`subspace.cc:45-65` + `sparsemexp.cc:26-33`) and asserts success
(`/root/reference/src/examples/cplink.cc:17-114`; default N there is
2^10 — pass a smaller exponent on CPU).

Verification also checks the commitments' knowledge legs
(`check_knowledge`, the e(c, g2)==e(g1, kc) well-formedness pairing).

Usage: python -m legosnark_tpu.examples.cplink [LOG_N]
"""
from __future__ import annotations

import sys

import numpy as np
import jax
import jax.numpy as jnp

from .. import config  # noqa: F401
from ..curve import bn254
from ..curve.group import Point, G1
from ..fields import limb as fl
from ..gadgets import snark, subspace
from ..prototools import commit as cs
from ..utils import benchmark as bm
from ..utils import sparse as sp

FR = bn254.FR
R = bn254.R


def run(log_n: int) -> dict:
    n = 1 << log_n
    timer = bm.Benchmarkable(f"cplink_{log_n}")
    rng = np.random.default_rng(23)

    # two independent CommScheme keys (real random bases, unlike the
    # reference's all-generator shortcut, `commit.h:129-139`), with
    # their base scalars exposed for the relation's scalar fast path
    ck_h, s_h = cs.keygen(n, seed=1, return_scalars=True)
    ck_f, s_f = cs.keygen(n, seed=2, return_scalars=True)
    sh_ints = [fl.limbs_to_int(np.asarray(s_h)[:, j]) for j in range(n + 1)]
    sf_ints = [fl.limbs_to_int(np.asarray(s_f)[:, j]) for j in range(n + 1)]

    # witness u committed under both keys through the CPInputFmt flow
    u = jnp.asarray(fl.to_mont(FR, jnp.asarray(
        fl.ints_to_limbs([int.from_bytes(rng.bytes(31), "little") % R
                          for _ in range(n)], FR.nlimbs))))
    with timer.phase("commit") as out:
        pin_h, vin_h = snark.init_no_pub(ck_h, [u], rng)
        pin_f, vin_f = snark.init_no_pub(ck_f, [u], rng)
        out.append((vin_h.comm_in[0].c.x, vin_f.comm_in[0].c.x))

    # sparse linking relation [ h 0 g... ; 0 f f... ] (cplink.cc:17-41),
    # 2 nonzeros per base column, 1 per blinding column
    t = 2 * n + 2
    entries = [(0, 0, sh_ints[n]), (1, 1, sf_ints[n])]
    for j in range(n):
        entries.append((0, 2 + j, sh_ints[j]))
        entries.append((1, 2 + j, sf_ints[j]))
    sM = sp.insert_as_col_major(entries, nrows=2, ncols=t, nnz_max=2,
                                mont=True)
    with timer.phase("keygen") as out:
        key = subspace.keygen_scalar_sparse(sM, seed=7)
        out.append(key.P.x)

    # w = [rH, rF, u]
    rH = pin_h.comm_slot[0].r
    rF = pin_f.comm_slot[0].r
    w = jnp.concatenate([rH, rF, u], axis=-1)

    with timer.phase("prove") as out:
        pi = subspace.prove(key, w)
        out.append(pi.x)

    cH, cF = vin_h.comm_in[0], vin_f.comm_in[0]
    x = Point(*(jnp.concatenate([a, b], axis=-1)
                for a, b in zip(cH.c, cF.c)))
    with timer.phase("verify") as out:
        ok = subspace.verify(key, x, pi)
        k_ok = jnp.logical_and(cs.check_knowledge(ck_h, cH),
                               cs.check_knowledge(ck_f, cF))
        out.append((ok, k_ok))

    ok = bool(np.all(np.asarray(ok))) and bool(np.all(np.asarray(k_ok)))
    print(f"=== CPlink N=2^{log_n} ===")
    for phase in ("commit", "keygen", "prove", "verify"):
        bm.print_bm(f"cplink_{phase}", timer.timing_micros(phase))
    print(f"VERIFY {'OK' if ok else 'FAIL'}")
    # MYREQUIRE-style assert (`cplink.cc:114`)
    if not ok:
        raise SystemExit(1)
    return {
        "ok": ok,
        "commit_us": timer.timing_micros("commit"),
        "keygen_us": timer.timing_micros("keygen"),
        "prove_us": timer.timing_micros("prove"),
        "verify_us": timer.timing_micros("verify"),
    }


def main(argv):
    log_n = int(argv[0]) if argv else 4
    run(log_n)


if __name__ == "__main__":
    main(sys.argv[1:])
