"""Micro-timings of the binning/gather primitives on the real chip.

Answers, with measurements: is the P-row feature gather row-count-bound
or bandwidth-bound (f32 vs bf16 vs int16 rows)? What do the packed
keys-only sort, the stable 2-array sort, the fused multi-channel scan,
searchsorted, and the N-scatter actually cost at bench shapes?

Usage: python scripts/micro_bin.py [cap]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N = 100_000


def timed(fn, args, k=8, repeats=3):
    def loop(kk):
        f = jax.jit(lambda *a: jax.lax.fori_loop(
            0, kk, lambda i, acc: acc + fn(i, *a), 0.0))
        return lambda: f(*args)

    fk, f1 = loop(k), loop(1)
    float(fk()); float(f1())
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter(); float(fk()); tk = time.perf_counter() - t0
        t0 = time.perf_counter(); float(f1()); t1 = time.perf_counter() - t0
        best = min(best, max((tk - t1) / (k - 1), 1e-9))
    return best * 1e3


def main():
    cap = int(sys.argv[1]) if len(sys.argv) > 1 else 1_376_256
    rng = np.random.default_rng(0)
    # nondecreasing gather indices (the stream's actual pattern)
    gid = jnp.asarray(np.sort(rng.integers(0, N, cap)).astype(np.int32))
    table = jnp.asarray(rng.normal(size=(N, 128)).astype(np.float32))
    tb16 = table.astype(jnp.bfloat16)
    ti16 = jax.lax.bitcast_convert_type(table, jnp.int32).astype(jnp.int16)

    rows = []
    rows.append(("gather f32 (P,128)", timed(
        lambda i, g, t: t[(g + i) % N].sum() * 0.0 + t[g][::4096, 0].sum(),
        (gid, table))))
    rows.append(("gather bf16 (P,128)", timed(
        lambda i, g, t: (t[(g + i) % N][::4096, 0].astype(jnp.float32)).sum(),
        (gid, tb16))))
    rows.append(("gather i16 (P,128)", timed(
        lambda i, g, t: t[(g + i) % N][::4096, 0].astype(jnp.float32).sum(),
        (gid, ti16))))

    keys = jnp.asarray(rng.integers(0, 1 << 29, cap).astype(np.int32))
    payload = jnp.asarray(rng.integers(0, N, cap).astype(np.int32))
    rows.append(("sort keys-only", timed(
        lambda i, k_, p: jax.lax.sort(k_ + i)[::4096].astype(jnp.float32).sum(),
        (keys, payload))))
    rows.append(("sort stable 2-arr", timed(
        lambda i, k_, p: jax.lax.sort((k_ + i, p), num_keys=1, is_stable=True)[1][::4096].astype(jnp.float32).sum(),
        (keys, payload))))
    rows.append(("sort_key_val", timed(
        lambda i, k_, p: jax.lax.sort_key_val(k_ + i, p)[1][::4096].astype(jnp.float32).sum(),
        (keys, payload))))

    from gaussian_ray_tracing_tpu.ops.scan import multi_cumsum_i32

    ch3 = jnp.asarray(rng.integers(-4, 4, (3, cap)).astype(np.int32))
    rows.append(("multi_cumsum 3ch", timed(
        lambda i, x: multi_cumsum_i32(x + i)[:, ::4096].astype(jnp.float32).sum(),
        (ch3,))))
    rows.append(("xla cumsum 3ch", timed(
        lambda i, x: jnp.cumsum(x + i, axis=1)[:, ::4096].astype(jnp.float32).sum(),
        (ch3,))))

    sorted_keys = jnp.sort(keys)
    bounds = jnp.asarray((np.arange(3601) * ((1 << 29) // 3600)).astype(np.int32))
    rows.append(("searchsorted 3601", timed(
        lambda i, ks, b: jnp.searchsorted(ks, b + i).astype(jnp.float32).sum(),
        (sorted_keys, bounds))))

    first = jnp.asarray(np.sort(rng.integers(0, cap, N)).astype(np.int32))
    vals = jnp.asarray(rng.integers(0, 1 << 20, (N, 3)).astype(np.int32))
    def scat(i, f, v):
        buf = jnp.zeros((cap + 1, 3), jnp.int32).at[f].add(v + i)
        return buf[::4096, 0].astype(jnp.float32).sum()
    rows.append(("N-row scatter (N,3)", timed(scat, (first, vals))))

    for name, ms in rows:
        print(f"{name:>22}: {ms:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
