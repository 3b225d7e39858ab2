"""Multi-chip sharding: the distributed-backend layer.

The reference's only parallelism is OpenMP chunking of MSM/FFT loops
(`/root/reference/src/utils/globl.h:51-77`, `sparsemexp.cc:5-9`,
`lipmaa.cc:125-173` — SURVEY §2.3). The TPU-native equivalent is a
`jax.sharding.Mesh` over ICI with `shard_map`:

  * `msm_sharded` — points/scalars sharded over the mesh axis, per-chip
    Pippenger (sort+scan windows), partial window sums all-gathered
    (tiny: one point per chip) and tree-reduced. This is the
    data-parallel MSM of BASELINE.md's ">=5x scaling 1->4 hosts" target.
  * `shard_table` / `fold_sharded` / `sumcheck_rounds_sharded` — the
    sumcheck engines on sharded 2^d tables (SURVEY §2.3 item 2).
    Tables are distributed CYCLICALLY (the shard axis carries the LOW
    index bits): with the framework's big-endian variable order, every
    sumcheck round binds the current TOP variable, whose (lo, hi) pair
    has identical low bits — so all folds and h-polynomial partial
    sums are shard-local until the table width hits 1, after which the
    k singletons are all-gathered and the tail runs replicated.
  * `ntt_sharded` — four-step (Bailey) NTT: local row NTTs, twiddle
    scaling, an all-to-all transpose over ICI, local column NTTs
    (SURVEY §2.3 item 3, the `lipmaa.cc:125-173` OpenMP analogue).

Everything works on any mesh size that divides the axis; the tests and
`__graft_entry__.dryrun_multichip` exercise an 8-device CPU mesh
(`--xla_force_host_platform_device_count`).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..fields import limb as fl
from ..curve import bn254
from ..curve.group import Point, G1, CurveOps, point_map
from ..curve import msm as msm_mod
from ..prototools import mle, ntt as ntt_mod, polytools

FR = bn254.FR


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    if len(devs) < n:
        raise ValueError(
            f"requested a {n}-device mesh but only {len(devs)} devices "
            f"are visible (platform {devs[0].platform}); for virtual "
            "multi-chip set jax_platforms=cpu + "
            "--xla_force_host_platform_device_count")
    return Mesh(devs[:n], (axis,))


def _vec_spec(ndim: int, axis: str) -> P:
    """PartitionSpec sharding the VECTOR (last) axis of an ndim array."""
    return P(*([None] * (ndim - 1) + [axis]))


def _gather_point_sum(C: CurveOps, p: Point, axis: str) -> Point:
    """All-gather single partial points ([.., L, 1] coords) along the
    mesh axis onto the vector axis and tree-reduce locally (points are
    tiny: negligible ICI traffic; the group law is not a psum monoid)."""
    g = point_map(
        lambda x: jax.lax.all_gather(x, axis, axis=x.ndim - 1, tiled=True),
        p)
    return C.sum_reduce(g)


def msm_sharded(C: CurveOps, points: Point, scalars, mesh: Mesh,
                axis: str = "data", c: int | None = None) -> Point:
    """Data-parallel MSM: sum_i k_i P_i with i sharded over the mesh.

    Each chip runs the full windowed sort+scan MSM on its shard; the
    per-chip results (single points) are combined over ICI. Returns the
    replicated total. points: [.., L, n]; scalars: [L, n] canonical.
    """
    n = scalars.shape[-1]
    ndev = mesh.shape[axis]
    assert n % ndev == 0, "points must divide evenly over the mesh"
    if c is None:
        from .. import config
        import os
        env = os.environ.get("LEGOSNARK_MSM_C")
        c = int(env) if env else config.default_window(n // ndev)

    def local(px, py, pz, s):
        part = msm_mod.msm(C, Point(px, py, pz), s, c=c)
        return _gather_point_sum(C, part, axis)

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(_vec_spec(points.x.ndim, axis),
                  _vec_spec(points.y.ndim, axis),
                  _vec_spec(points.z.ndim, axis),
                  _vec_spec(scalars.ndim, axis)),
        out_specs=Point(P(), P(), P()),
        check_vma=False)
    # jit so the shard_map body executes as ONE compiled program even
    # when called eagerly (per-op eager dispatch through shard_map is
    # pathologically slow on the limb engine)
    return jax.jit(fn)(points.x, points.y, points.z, scalars)


# ---------------------------------------------------------------------------
# Sharded sumcheck tables (cyclic distribution)
# ---------------------------------------------------------------------------


def shard_table(v, ndev: int):
    """[..., L, 2^d] -> [ndev, ..., L, 2^d/ndev] cyclic distribution:
    leading axis = LOW log2(ndev) index bits, so big-endian folds are
    shard-local. Shard s, local position q holds index q*ndev + s."""
    n = v.shape[-1]
    assert n % ndev == 0
    r = v.reshape(v.shape[:-1] + (n // ndev, ndev))
    return jnp.moveaxis(r, -1, 0)


def unshard_table(v):
    """Inverse of `shard_table`."""
    ndev = v.shape[0]
    r = jnp.moveaxis(v, 0, -1)
    return r.reshape(r.shape[:-2] + (r.shape[-2] * ndev,))


def fold_sharded(table, r, mesh: Mesh, axis: str = "data"):
    """One sumcheck fold on a cyclically sharded table
    [ndev, ..., L, w]: binding the TOP variable pairs positions with
    identical low bits — no communication; output stays sharded."""
    def local(t, rr):
        return mle.fold(t, rr)

    fn = shard_map(local, mesh=mesh, in_specs=(P(axis), P()),
                   out_specs=P(axis), check_vma=False)
    return jax.jit(fn)(table, r)


def field_sum_sharded(v, mesh: Mesh, axis: str = "data"):
    """Sharded modular sum over the vector axis of a cyclically (or
    contiguously — the sum is order-free) sharded [ndev, ..., L, w]
    array: local tree-sum, all-gather the partials, combine."""
    def local(vs):
        part = mle.field_sum(vs[0])             # [..., L, 1]
        g = jax.lax.all_gather(part, axis, axis=part.ndim - 1, tiled=True)
        return mle.field_sum(g)

    fn = shard_map(local, mesh=mesh, in_specs=P(axis),
                   out_specs=P(), check_vma=False)
    return jax.jit(fn)(v)


def sumcheck_rounds_sharded(tables, challenges, mesh: Mesh,
                            axis: str = "data"):
    """Distributed `prove_rounds` (SURVEY §2.3 item 2): tables
    [k, L, 2^d] are cyclically distributed on entry; each round's
    h-poly reduction is a local partial sum + tiny all-gather; folds
    stay local until the per-shard width hits 1, after which the
    remaining log2(ndev) variables are the shard bits themselves: the
    k singletons are gathered and the tail runs replicated."""
    ndev = mesh.shape[axis]
    d = challenges.shape[-1]
    assert (1 << d) % ndev == 0, "table must divide over the mesh"
    sharded = shard_table(tables, ndev)       # [ndev, k, L, w]

    def local(tabs, chals):
        t = tabs[0]                           # [k, L, w] local shard
        hs, zs = [], []
        replicated = False
        for i in range(d):
            if not replicated and t.shape[-1] == 1:
                # remaining vars are the shard bits: gather singletons
                g = jax.lax.all_gather(t, axis, axis=t.ndim - 1,
                                       tiled=True)   # [k, L, ndev]
                t = g
                replicated = True
            if not replicated:
                part = mle.round_poly(t)              # local [L, k+1]
                g = jax.lax.all_gather(part, axis, axis=0)  # [ndev, L, k+1]
                h = mle.field_sum_leading(g)
            else:
                h = mle.round_poly(t)
            r = chals[..., i : i + 1]
            hs.append(h)
            zs.append(polytools.eval_at(h, r))
            t = mle.fold(t, r)
            # NOTE: in replicated mode ordering matters: gathered axis
            # holds the LOW bits = the LAST variables; mle.fold binds
            # the top remaining variable, and the gather above lays the
            # shard axis out as the minor axis — consistent with the
            # cyclic layout (local q*ndev + s ordering) only when the
            # local width has reached 1, which is exactly when we gather.
        finals = t                                    # [k, L, 1]
        z0 = fl.add(FR, polytools.eval_at(hs[0], fl.zero(FR)),
                    polytools.eval_at(hs[0], fl.one(FR)))
        return (jnp.stack(hs), finals,
                jnp.concatenate([z0] + zs, axis=-1))

    fn = shard_map(
        local, mesh=mesh, in_specs=(P(axis), P()),
        out_specs=(P(), P(), P()), check_vma=False)
    h_coeffs, finals, zs = jax.jit(fn)(sharded, challenges)
    return mle.SumcheckRounds(h_coeffs=h_coeffs, finals=finals, zs=zs)


def matrix_fold_sharded(A, beta_rho, mesh: Mesh, axis: str = "data"):
    """`DPMatrixMle` preprocessing on a COLUMN-sharded matrix: each
    chip folds the row variables of its own column block with the
    replicated eq-table (`mle.matrix_mle_fold`); zero communication —
    the contraction runs over the replicated ROW axis. A: [n, L, n]
    (rows leading, cols on the vector axis); returns the folded [L, n]
    table replicated (an all-gather of one [L, n/ndev] block per chip)."""
    def local(a, b):
        part = mle.matrix_mle_fold(a, b)               # [L, cols/ndev]
        return jax.lax.all_gather(part, axis, axis=part.ndim - 1,
                                  tiled=True)

    fn = shard_map(local, mesh=mesh,
                   in_specs=(P(None, None, axis), P()),
                   out_specs=P(), check_vma=False)
    return jax.jit(fn)(A, beta_rho)


def cpmat_rounds_sharded(A, B_T, beta_r, beta_s, challenges, mesh: Mesh,
                         axis: str = "data"):
    """The CPmmp prover hot path end-to-end distributed (SURVEY §2.3 /
    `matrixsc.cc:106-152`): column-sharded DPMatrixMle folds of A and
    B^T (no comms), then the d/2-round sumcheck on the folded tables
    with cyclically-sharded state (`sumcheck_rounds_sharded`). Returns
    the same `mle.SumcheckRounds` as the local engine."""
    ta = matrix_fold_sharded(A, beta_r, mesh, axis)
    tb = matrix_fold_sharded(B_T, beta_s, mesh, axis)
    tables = jnp.stack([ta, tb])
    return sumcheck_rounds_sharded(tables, challenges, mesh, axis)


# ---------------------------------------------------------------------------
# Sharded four-step NTT (SURVEY §2.3 item 3)
# ---------------------------------------------------------------------------


def ntt_sharded(a, mesh: Mesh, axis: str = "data", inverse: bool = False):
    """Four-step (Bailey) NTT of [L, n] over the mesh, n = n1 * n2 with
    n1 = ndev * (rows per chip would be n1/ndev — here n1 = ndev for
    one transpose round; n2 = n/ndev):

      view x decimated as A[j1][j2] = x[j1 + n1*j2] (j1 = low bits;
      row j1 sharded to device j1);
      1. local size-n2 NTT per row (root w^n1):   Y[j1][k2];
      2. scale by twiddles w^(j1*k2);
      3. all-to-all transpose (k2 chunks across devices, all j1 local);
      4. local size-n1 NTT over j1 (root w^n2):   X[k2 + n2*k1] at
         position [k2, k1] — which reassembles host-side to natural
         order with no extra permutation.
      Inverse mode runs the same pipeline with w^-1 and the 1/n scale
      folded into step 4.
    """
    n = a.shape[-1]
    ndev = mesh.shape[axis]
    n1, n2 = ndev, n // ndev
    assert n1 * n2 == n and n2 % ndev == 0
    log_n = n.bit_length() - 1
    assert 1 << log_n == n
    root = bn254.fr_two_adic_root(log_n)
    if inverse:
        root = pow(root, bn254.R - 2, bn254.R)

    def local(ax):
        x = ax[0]                                  # [L, n2] = one row j1
        j1 = jax.lax.axis_index(axis)
        # step 1: local NTT of the row (same root^(n1) domain of size n2)
        y = _ntt_any(x, pow(root, n1, bn254.R), n2, inverse)
        # step 2: twiddle w^(j1 * k2): (w^j1)^k2 via square-and-multiply
        # on the axis index (traced): build w^(j1) by selecting from the
        # n1 precomputed powers, then k2-powers by log-doubling
        wj1 = jnp.take(ntt_mod._powers(root, (n1 - 1).bit_length())[..., :n1],
                       j1, axis=-1)[..., None]     # [L, 1]
        tw = _geom_powers(wj1, n2)                 # [L, n2]
        y = fl.mont_mul(FR, y, tw)
        # step 3: all-to-all transpose: split k2 into ndev contiguous
        # chunks (chunk s -> device s; split axis must have size == ndev
        # for untiled all_to_all), gathering every j1 row
        y = y.reshape(y.shape[:-1] + (ndev, n2 // ndev))
        y = jax.lax.all_to_all(y, axis, split_axis=y.ndim - 2,
                               concat_axis=0, tiled=False)
        # y: [n1, L, n2/ndev] — this chip now holds all j1 for its k2 chunk
        y = jnp.moveaxis(y, 0, -1)                 # [L, n2/ndev, n1]
        sh = y.shape
        y = y.reshape(sh[:-2] + (sh[-2] * n1,))    # [L, (n2/ndev)*n1]
        # step 4: size-n1 NTTs over the trailing n1 blocks (the column
        # transform uses the primitive n1-th root w^(n2))
        y = y.reshape(sh[:-2] + (sh[-2], n1))      # [L, k2_chunk, n1]
        y = _ntt_rows(y, pow(root, n2, bn254.R), n1, inverse)
        y = y.reshape(sh[:-2] + (sh[-2] * n1,))
        if inverse:
            n_inv = fl.const_mont(FR, pow(n, bn254.R - 2, bn254.R))
            y = fl.mont_mul(FR, y, n_inv)
        return y[None]

    fn = shard_map(local, mesh=mesh, in_specs=P(axis),
                   out_specs=P(axis), check_vma=False)
    rows = a.reshape(a.shape[:-1] + (n2, n1))      # [..., j2, j1]
    rows = jnp.moveaxis(rows, -1, 0)               # [n1(j1), ..., n2(j2)]
    out = jax.jit(fn)(rows)                        # [ndev(k2 chunks), L, n2/ndev * n1]
    # out[s] holds k2 chunk s laid out [k2_local, k1]; element [k2, k1]
    # = X[k2 + n2*k1], so k1-major reassembly IS natural order
    out = out.reshape((ndev,) + a.shape[:-1] + (n2 // ndev, n1))
    out = jnp.moveaxis(out, 0, -3)                 # [..., ndev, k2_loc, n1]
    out = out.reshape(a.shape[:-1] + (n2, n1))     # [..., k2, k1]
    out = jnp.swapaxes(out, -1, -2)                # [..., k1, k2]
    return out.reshape(a.shape[:-1] + (n,))        # k = k2 + n2*k1


def _geom_powers(base, m: int):
    """[L, m] powers base^0..base^(m-1) of a traced [L, 1] base via
    log-doubling (m static)."""
    t = fl.one(FR)
    cur = base
    mm = 1
    while mm < m:
        step = fl.mont_mul(FR, t, cur)             # t * base^(mm)
        t = jnp.concatenate([t, step], axis=-1)[..., :m]
        cur = fl.mont_sqr(FR, cur)
        mm *= 2
    return t[..., :m]


def _ntt_any(x, root_int: int, n: int, inverse: bool):
    """Size-n DIT NTT of [L, n] for a given primitive root (no 1/n
    scale — the caller folds it in once)."""
    log_n = n.bit_length() - 1
    x = jnp.take(x, jnp.asarray(ntt_mod._bitrev(log_n)), axis=-1)
    lead = x.shape[:-1]
    for s in range(1, log_n + 1):
        m = 1 << s
        tw = ntt_mod._powers(pow(root_int, n // m, bn254.R),
                             (m // 2 - 1).bit_length() if m > 2 else 0
                             )[..., : m // 2]
        xx = x.reshape(lead + (n // m, m))
        even = xx[..., : m // 2].reshape(lead + (n // 2,))
        odd = xx[..., m // 2 :].reshape(lead + (n // 2,))
        tw_full = jnp.broadcast_to(
            tw[..., None, :], tw.shape[:-1] + (n // m, m // 2)
        ).reshape(tw.shape[:-1] + (n // 2,))
        odd = fl.mont_mul(FR, odd, tw_full)
        hi = fl.add(FR, even, odd).reshape(lead + (n // m, m // 2))
        lo = fl.sub(FR, even, odd).reshape(lead + (n // m, m // 2))
        x = jnp.concatenate([hi, lo], axis=-1).reshape(lead + (n,))
    return x


def _ntt_rows(x, root_int: int, n1: int, inverse: bool):
    """Size-n1 NTT over the LAST axis of [..., rows, n1] — but the limb
    axis sits at -3 here; temporarily move it next to the transform."""
    # x: [L, rows, n1] -> [rows, L, n1]
    y = jnp.moveaxis(x, -3, -2) if x.ndim >= 3 else x
    y = _ntt_any(y, root_int, n1, inverse)
    return jnp.moveaxis(y, -2, -3) if x.ndim >= 3 else y
