"""Microbenchmarks for binning primitives on the current backend."""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1000.0


def main():
    N, P, T = 100_000, 800_000, 3024
    rng = np.random.default_rng(0)
    cum_end = jnp.asarray(np.sort(rng.integers(0, P, N)).astype(np.int32))
    p_idx = jnp.arange(P, dtype=jnp.int32)

    for method in ("scan", "scan_unrolled", "sort", "compare_all"):
        if method == "compare_all":
            continue  # O(N*P) — do not even try

        @jax.jit
        def f(c, q, method=method):
            return jnp.searchsorted(c, q, side="right", method=method)

        t = timeit(f, cum_end, p_idx)
        print(f"searchsorted({N}->{P}q) method={method:14s} {t:8.2f} ms")

    # small-query searchsorted (tile starts)
    tile_sorted = jnp.sort(jnp.asarray(rng.integers(0, T, P).astype(np.int32)))
    tq = jnp.arange(T + 1, dtype=jnp.int32)
    for method in ("scan", "sort"):

        @jax.jit
        def f2(a, q, method=method):
            return jnp.searchsorted(a, q, side="left", method=method)

        t = timeit(f2, tile_sorted, tq)
        print(f"searchsorted({P}->{T}q) method={method:14s} {t:8.2f} ms")

    # gather P from N-table
    tab = jnp.asarray(rng.random(N).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, N, P).astype(np.int32))

    @jax.jit
    def g(tab, idx):
        return tab[idx]

    t = timeit(g, tab, idx)
    print(f"gather {P} from {N}                      {t:8.2f} ms")

    # scatter-set P int32 into cap buffer (permutation-ish)
    dst = jnp.asarray(rng.permutation(P).astype(np.int32))
    vals = idx

    @jax.jit
    def sc(dst, vals):
        return jnp.zeros(P, jnp.int32).at[dst].set(vals, mode="drop")

    t = timeit(sc, dst, vals)
    print(f"scatter-set {P} int32                    {t:8.2f} ms")

    # cumsum over N / P
    @jax.jit
    def cs(x):
        return jnp.cumsum(x)

    t = timeit(cs, jnp.ones(N, jnp.int32))
    print(f"cumsum {N}                               {t:8.2f} ms")
    t = timeit(cs, jnp.ones(P, jnp.int32))
    print(f"cumsum {P}                               {t:8.2f} ms")

    # 2-key sort at 800k and 1.2M
    for n in (P, 1_200_000):
        tile = jnp.asarray(rng.integers(0, T, n).astype(np.int32))
        dep = jnp.asarray(rng.random(n).astype(np.float32))
        gs = jnp.asarray(rng.integers(0, N, n).astype(np.int32))

        @jax.jit
        def srt(a, b, c):
            return jax.lax.sort((a, b, c), num_keys=2, is_stable=False)

        t = timeit(srt, tile, dep, gs)
        print(f"lax.sort 2-key {n}                  {t:8.2f} ms")

    # segment-sum via cumsum trick: (16, P) -> (16, N)
    rec = jnp.asarray(rng.random((16, P)).astype(np.float32))
    off = jnp.asarray(np.sort(rng.integers(0, P, N)).astype(np.int32))

    @jax.jit
    def seg(rec, off):
        cs = jnp.cumsum(rec, axis=1)
        hi = jnp.concatenate([off[1:], jnp.asarray([P], jnp.int32)])
        return cs[:, hi - 1] - jnp.where(off > 0, cs[:, off - 1], 0.0)

    t = timeit(seg, rec, off)
    print(f"segsum cumsum-trick (16,{P})->(16,{N})  {t:8.2f} ms")

    # scatter-add VJP baseline: (16,P) add into (16,N)
    @jax.jit
    def scadd(rec, idx):
        return jnp.zeros((16, N), jnp.float32).at[:, idx].add(rec)

    t = timeit(scadd, rec, idx)
    print(f"scatter-add (16,{P}) -> (16,{N})        {t:8.2f} ms")


if __name__ == "__main__":
    main()
