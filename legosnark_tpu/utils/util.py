"""cputil helpers — TPU-side counterpart of
`/root/reference/src/utils/util.{h,cc}`.

`map`/`flatten`/`concat3` (`util.h:23-115`) are Python built-ins /
jnp.concatenate here and are not re-wrapped; what this module keeps is
the pieces with real behavior: vector (de)serialization, `log2ceiled`,
and `populate_from_file_dist`.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..fields import limb as fl
from ..curve import bn254

FR = bn254.FR


def log2ceiled(n: int) -> int:
    """`util.h:98-102`."""
    if n <= 1:
        return 0
    return (n - 1).bit_length()


def dump_into_file(path: str, v_mont) -> None:
    """Plain-text Fr vector serialization (`util.h:56-76`): first line
    the count, then one decimal integer per line (canonical values)."""
    vals = np.asarray(fl.from_mont(FR, v_mont))
    with open(path, "w") as fh:
        fh.write(f"{vals.shape[-1]}\n")
        for i in range(vals.shape[-1]):
            fh.write(f"{fl.limbs_to_int(vals[..., :, i])}\n")


def load_from_file(path: str):
    """`util.h:78-96` inverse of dump_into_file -> Montgomery [L, n]."""
    with open(path) as fh:
        n = int(fh.readline())
        vals = [int(fh.readline()) for _ in range(n)]
    return jnp.asarray(FR.to_mont_ints(vals))


def populate_from_file_dist(path: str, n: int):
    """Load Fr samples from a file, cycling to fill n entries
    (`util.h:138-164`)."""
    base = load_from_file(path)
    m = base.shape[-1]
    reps = -(-n // m)
    return jnp.tile(base, (1, reps))[..., :n]


def save_point_batch(path: str, p) -> None:
    """Commitment-key / proof serialization (SURVEY §5: worth adding
    since keygen at 2^20 is expensive — the reference never persists
    keys). Raw .npz of the projective limb arrays."""
    np.savez_compressed(path, x=np.asarray(p.x), y=np.asarray(p.y),
                        z=np.asarray(p.z))


def load_point_batch(path: str):
    from ..curve.group import Point
    data = np.load(path)
    return Point(jnp.asarray(data["x"]), jnp.asarray(data["y"]),
                 jnp.asarray(data["z"]))


def save_point_group(path: str, points: dict) -> None:
    """Serialize a named collection of Point batches to ONE .npz
    (uncompressed — point limbs are near-random, compression wastes
    minutes on a GB-scale SRS). Atomic: writes a temp file and
    os.replace()s it so a crash never leaves a truncated key."""
    import os
    arrs = {}
    for name, p in points.items():
        arrs[f"{name}__x"] = np.asarray(p.x)
        arrs[f"{name}__y"] = np.asarray(p.y)
        arrs[f"{name}__z"] = np.asarray(p.z)
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        np.savez(fh, **arrs)
    os.replace(tmp, path)


def load_point_group(path: str) -> dict:
    """Inverse of `save_point_group` -> {name: Point}."""
    from ..curve.group import Point
    data = np.load(path)
    names = sorted({k[: -len("__x")] for k in data.files
                    if k.endswith("__x")})
    return {name: Point(jnp.asarray(data[f"{name}__x"]),
                        jnp.asarray(data[f"{name}__y"]),
                        jnp.asarray(data[f"{name}__z"]))
            for name in names}
