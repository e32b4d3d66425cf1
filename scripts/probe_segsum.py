"""Micro-bench: per-gaussian segment-sum of pair cotangents (the
_gather_records VJP core) — current sort+cumsum+boundary-gather vs
sorted scatter-add variants. N=100k, P=600k, 10 rows."""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def timed(f, *args, iters=20):
    f_j = jax.jit(f)

    @jax.jit
    def chain(k, *a):
        def body(i, carry):
            # thread the carry into the FIRST array arg to defeat
            # loop-invariant code motion
            a2 = (a[0],) + tuple(x + carry.astype(x.dtype) * 0.0 if x.dtype != jnp.int32 else x for x in a[1:])
            out = f_j(*a2)
            return carry + jnp.sum(out) * 1e-20
        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

    float(chain(1, *args)); float(chain(1, *args))
    t0 = time.perf_counter(); float(chain(1, *args)); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); float(chain(1 + iters, *args)); tk = time.perf_counter() - t0
    return (tk - t1) / iters * 1000


def main():
    N, P, R = 100_000, 600_000, 10
    rng = np.random.default_rng(0)
    pair_gauss = jnp.asarray(rng.integers(0, N, P).astype(np.int32))
    d = jnp.asarray(rng.normal(size=(R, P)).astype(np.float32))

    def v_sort_cumsum(pair_gauss, d):
        sorted_all = jax.lax.sort(
            (pair_gauss,) + tuple(d[i] for i in range(R)), num_keys=1, is_stable=False
        )
        d_sorted = jnp.stack(sorted_all[1:], axis=0)
        csum = jnp.cumsum(d_sorted, axis=1)
        # boundary gather stand-in: fixed idx (cost model only)
        idx = jnp.arange(2 * N, dtype=jnp.int32) * (P // (2 * N))
        both = csum[:, idx]
        return both[:, :N] - both[:, N:]

    def v_sort_scatter_add(pair_gauss, d):
        sorted_all = jax.lax.sort(
            (pair_gauss,) + tuple(d[i] for i in range(R)), num_keys=1, is_stable=False
        )
        key_s = sorted_all[0]
        d_sorted = jnp.stack(sorted_all[1:], axis=0)
        out = jnp.zeros((R, N), jnp.float32).at[:, key_s].add(
            d_sorted, mode="drop", indices_are_sorted=True
        )
        return out

    def v_scatter_add_unsorted(pair_gauss, d):
        return jnp.zeros((R, N), jnp.float32).at[:, pair_gauss].add(d, mode="drop")

    def v_sort_only(pair_gauss, d):
        sorted_all = jax.lax.sort(
            (pair_gauss,) + tuple(d[i] for i in range(R)), num_keys=1, is_stable=False
        )
        return jnp.stack(sorted_all[1:], axis=0)

    def v_sort_bf16(pair_gauss, d):
        db = d.astype(jnp.bfloat16)
        packed = [
            jax.lax.bitcast_convert_type(
                jnp.stack([db[2 * i], db[2 * i + 1]], axis=-1), jnp.float32
            )
            for i in range(R // 2)
        ]
        sorted_all = jax.lax.sort(
            (pair_gauss,) + tuple(packed), num_keys=1, is_stable=False
        )
        outs = []
        for arr in sorted_all[1:]:
            two = jax.lax.bitcast_convert_type(arr, jnp.bfloat16)
            outs += [two[..., 0], two[..., 1]]
        d_sorted = jnp.stack(outs, axis=0).astype(jnp.float32)
        csum = jnp.cumsum(d_sorted, axis=1)
        idx = jnp.arange(2 * N, dtype=jnp.int32) * (P // (2 * N))
        both = csum[:, idx]
        return both[:, :N] - both[:, N:]

    # correctness: sorted scatter-add vs unsorted scatter-add
    r_ref = np.asarray(v_scatter_add_unsorted(pair_gauss, d))
    r_s = np.asarray(v_sort_scatter_add(pair_gauss, d))
    print("sorted-scatter-add == unsorted:", np.allclose(r_ref, r_s, atol=1e-3))

    print(f"sort only            {timed(v_sort_only, pair_gauss, d):8.3f} ms")
    print(f"sort+cumsum+gather   {timed(v_sort_cumsum, pair_gauss, d):8.3f} ms")
    print(f"sort+scatter-add(s)  {timed(v_sort_scatter_add, pair_gauss, d):8.3f} ms")
    print(f"scatter-add unsorted {timed(v_scatter_add_unsorted, pair_gauss, d):8.3f} ms")
    print(f"bf16-packed sort     {timed(v_sort_bf16, pair_gauss, d):8.3f} ms")


if __name__ == "__main__":
    main()
