"""Micro-bench of segment-fill variants for binning (N=100k gaussians,
P=600k pairs) on the current backend, chained-loop methodology."""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def timed(f, *args, iters=30):
    f_j = jax.jit(f)

    @jax.jit
    def chain(k, *a):
        def body(i, carry):
            out = f_j(*a)
            return carry + out.ravel()[0] * 1e-20
        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

    float(chain(1, *args)); float(chain(1, *args))
    t0 = time.perf_counter(); float(chain(1, *args)); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); float(chain(1 + iters, *args)); tk = time.perf_counter() - t0
    return (tk - t1) / iters * 1000


def main():
    N, P = 100_000, 600_000
    rng = np.random.default_rng(0)
    count = rng.integers(0, 12, N).astype(np.int32)
    count[rng.random(N) < 0.3] = 0
    cum = np.cumsum(count)
    offsets = jnp.asarray((cum - count).astype(np.int32))
    w = jnp.asarray(np.sort(rng.integers(0, 1 << 30, N)).astype(np.int32))  # monotone
    countj = jnp.asarray(count)

    def v_current(offsets, w):
        a = jnp.zeros(P, jnp.int32).at[offsets].max(w, mode="drop")
        return jax.lax.cummax(a, axis=0).astype(jnp.float32)

    def v_unique(offsets, w, countj):
        idx = jnp.where(countj > 0, offsets, P)
        a = jnp.zeros(P, jnp.int32).at[idx].set(
            w, mode="drop", unique_indices=True, indices_are_sorted=True
        )
        return jax.lax.cummax(a, axis=0).astype(jnp.float32)

    def v_sortmerge(offsets, w, countj):
        # merge scatter entries with pair slots by ONE sort, cummax, then
        # extract the pair entries by a second sort on a presence flag
        pos = jnp.concatenate([jnp.where(countj > 0, offsets, P), jnp.arange(P, dtype=jnp.int32)])
        is_pair = jnp.concatenate([jnp.zeros(N, jnp.int32), jnp.ones(P, jnp.int32)])
        vals = jnp.concatenate([w, jnp.zeros(P, jnp.int32)])
        # scatter entries must sort BEFORE the pair at the same position:
        key = pos * 2 + is_pair
        key_s, flag_s, val_s = jax.lax.sort((key, is_pair, vals), num_keys=1, is_stable=False)
        filled = jax.lax.cummax(val_s, axis=0)
        # extract pair entries: stable sort by (1 - flag) keeps pair order
        _, out = jax.lax.sort((1 - flag_s, filled), num_keys=1, is_stable=True)
        return out[:P].astype(jnp.float32)

    r0 = np.asarray(v_current(offsets, w))
    r1 = np.asarray(v_unique(offsets, w, countj))
    r2 = np.asarray(v_sortmerge(offsets, w, countj))
    print("unique == current:", np.array_equal(r0, r1))
    print("sortmerge == current:", np.array_equal(r0, r2))

    print(f"current   {timed(v_current, offsets, w):8.3f} ms")
    print(f"unique    {timed(v_unique, offsets, w, countj):8.3f} ms")
    print(f"sortmerge {timed(v_sortmerge, offsets, w, countj):8.3f} ms")


if __name__ == "__main__":
    main()


def extra():
    N, P = 100_000, 600_000
    import numpy as np
    rng = np.random.default_rng(0)
    count = rng.integers(0, 12, N).astype(np.int32)
    count[rng.random(N) < 0.3] = 0
    cum = np.cumsum(count)
    offsets = jnp.asarray((cum - count).astype(np.int32))
    w = jnp.asarray(np.sort(rng.integers(0, 1 << 30, N)).astype(np.int32))
    countj = jnp.asarray(count)

    def v_current(offsets, w):
        a = jnp.zeros(P, jnp.int32).at[offsets].max(w, mode="drop")
        return jax.lax.cummax(a, axis=0).astype(jnp.float32)

    def v_sorted_max(offsets, w):
        # offsets are non-decreasing: promise sorted, keep max for collisions
        a = jnp.zeros(P, jnp.int32).at[offsets].max(
            w, mode="drop", indices_are_sorted=True
        )
        return jax.lax.cummax(a, axis=0).astype(jnp.float32)

    def v_unique_only(offsets, w, countj):
        idx = jnp.where(countj > 0, offsets, P)
        a = jnp.zeros(P, jnp.int32).at[idx].set(
            w, mode="drop", unique_indices=True
        )
        return jax.lax.cummax(a, axis=0).astype(jnp.float32)

    def v_sorted_set(offsets, w, countj):
        # make indices sorted AND unique-in-bounds: zero-count entries get
        # OOB slots that KEEP the ordering (P + rank)
        g = jnp.arange(N, dtype=jnp.int32)
        idx = jnp.where(countj > 0, offsets, P + g)
        a = jnp.zeros(P, jnp.int32).at[idx].set(
            w, mode="drop", unique_indices=True, indices_are_sorted=True
        )
        return jax.lax.cummax(a, axis=0).astype(jnp.float32)

    r0 = np.asarray(v_current(offsets, w))
    for name, f, args in [
        ("sorted_max", v_sorted_max, (offsets, w)),
        ("unique_only", v_unique_only, (offsets, w, countj)),
        ("sorted_set", v_sorted_set, (offsets, w, countj)),
    ]:
        r = np.asarray(f(*args))
        ok = np.array_equal(r0, r)
        print(f"{name:12s} match={ok} {timed(f, *args):8.3f} ms")


extra()
