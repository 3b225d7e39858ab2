"""Compare lane-axis gather [L, n][:, idx] vs row-major gather
[n, C][idx, :] + transpose, and sort variants."""
import time
import numpy as np
import jax
import jax.numpy as jnp

n = 1 << 18
L = 20
rng = np.random.default_rng(0)
a = jnp.asarray(rng.integers(0, 1 << 13, (3 * L, n), dtype=np.uint32))
rows = jnp.asarray(np.ascontiguousarray(np.asarray(a).T))  # [n, 3L]
rows64 = jnp.pad(rows, ((0, 0), (0, 64 - 3 * L)))
idx = jnp.asarray(rng.permutation(n).astype(np.uint32))
d = jnp.asarray(rng.integers(0, 1 << 13, (n,), dtype=np.uint32))


def bench(name, fn, *args, reps=5):
    f = jax.jit(fn)
    out = f(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:34s} {dt*1e3:8.2f} ms")


bench("lane gather  a[:, idx]", lambda a, i: jnp.take(a, i, axis=-1), a, idx)
bench("row gather   rows[idx]", lambda r, i: jnp.take(r, i, axis=0), rows, idx)
bench("row gather64 rows64[idx]", lambda r, i: jnp.take(r, i, axis=0),
      rows64, idx)
bench("row gather + transpose",
      lambda r, i: jnp.take(r, i, axis=0).T, rows, idx)
bench("full transpose only", lambda r: r.T, rows)
bench("argsort u32", jnp.argsort, d)
bench("sort packed key<<18|iota",
      lambda d: jax.lax.sort((d << 18) | jax.lax.iota(jnp.uint32, n)), d)
bench("sort pair (d, iota)",
      lambda d: jax.lax.sort((d, jax.lax.iota(jnp.uint32, n)),
                             num_keys=1), d)
