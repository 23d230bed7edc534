#!/usr/bin/env python
"""Microbench: the binning-stage sort variants on the current backend.

The training step's critical path carries two ~e_al-row sorts (tile/depth
key sort in ops/binning.py, gid-grouping perm sort in ops/rasterize.py).
This measures how their cost scales with row count and whether a packed
single-u64 sort beats the 2-operand variadic (u32 key, i32 payload) sort.

  python scripts/bench_sort.py [--rows 702080 767616]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(fn, *args, warmup=3, iters=20):
    import jax
    for _ in range(warmup):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    return (time.time() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, nargs="+",
                    default=[458752, 524288, 636032, 702080, 767616])
    args = ap.parse_args()

    import jax
    # the packed-u64 variant needs real 64-bit ints; without x64 JAX
    # silently truncates to u32 and the comparison is meaningless
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    for rows in args.rows:
        key = rng.integers(0, 1 << 32, rows, dtype=np.uint64).astype(np.uint32)
        gid = rng.integers(0, 131072, rows, dtype=np.int32)
        key_d, gid_d = jnp.asarray(key), jnp.asarray(gid)

        f2 = jax.jit(lambda k, g: jax.lax.sort((k, g), num_keys=1,
                                               is_stable=True)[1])
        t2 = timeit(f2, key_d, gid_d)

        def packed(k, g):
            k64 = (k.astype(jnp.uint64) << 32) | g.astype(jnp.uint64)
            s = jax.lax.sort(k64)
            return (s & jnp.uint64(0xFFFFFFFF)).astype(jnp.int32)
        fp = jax.jit(packed)
        tp = timeit(fp, key_d, gid_d)

        f2u = jax.jit(lambda k, g: jax.lax.sort((k, g), num_keys=1,
                                                is_stable=False)[1])
        tu = timeit(f2u, key_d, gid_d)

        print(f"rows {rows:8d}: variadic stable {t2:6.2f} ms | "
              f"variadic unstable {tu:6.2f} ms | packed u64 {tp:6.2f} ms")


if __name__ == "__main__":
    main()
