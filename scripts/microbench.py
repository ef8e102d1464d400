"""Microbenchmark the fixed-cost op classes that bound traversal prep/finish.

The axon relay can complete block_until_ready without the device having
run (round-3 lesson), so every measurement here is a DEPENDENT CHAIN: the
op iterates REPS times inside one jit with a data dependency between
iterations, the result is read back to host, and the per-op time is the
delta between REPS and 2*REPS runs (subtracting dispatch overhead).

Run: timeout 580 python -u scripts/microbench.py
"""

from __future__ import annotations

import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def chain_time(make_step, init, reps=8, outer=3):
    """Time one step of `carry -> carry` via dependent-chain differencing."""

    def run(n):
        @jax.jit
        def f(c):
            return jax.lax.fori_loop(0, n, lambda i, c: make_step(c), c)

        out = jax.block_until_ready(f(init))
        # force readback of one leaf to defeat relay async glitches
        leaf = jax.tree_util.tree_leaves(out)[0]
        _ = np.asarray(leaf.reshape(-1)[:1])
        best = np.inf
        for _ in range(outer):
            t0 = time.perf_counter()
            out = jax.block_until_ready(f(init))
            _ = np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[:1])
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = run(reps)
    t2 = run(2 * reps)
    return max(t2 - t1, 1e-9) / reps


def main():
    rng = np.random.default_rng(7)
    n = 2_073_600  # 1080p rays
    t_rows = 259_692  # ladder triangle count
    c = 3072  # ladder cluster count
    b = 16_200  # bundles at P=128

    print(f"platform={jax.default_backend()}", flush=True)

    idx0 = jnp.asarray(rng.integers(0, t_rows, n).astype(np.int32))
    for w in (8, 16, 32, 96):
        tab = jnp.asarray(rng.normal(size=(t_rows, w)).astype(np.float32))

        def step(idx, tab=tab):
            rows = tab[idx]  # [n, w]
            # dependency: rotate indices by a value derived from the data
            return (idx + rows[:, 0].astype(jnp.int32) % 3 + 1) % t_rows

        dt = chain_time(step, idx0)
        print(f"  gather [{n}] rows from [T,{w:3d}]: {dt*1e3:7.2f} ms",
              flush=True)

    keys0 = jnp.asarray(rng.integers(0, 2**31, n).astype(np.int32))

    def step_sort(k):
        p = jnp.argsort(k)
        return p ^ jnp.int32(1)

    dt = chain_time(step_sort, keys0)
    print(f"  argsort [{n}] i32: {dt*1e3:7.2f} ms", flush=True)

    e0 = jnp.asarray(rng.normal(size=(b, c)).astype(np.float32))
    for k in (128, 256):
        def step_topk(e, k=k):
            v, i = jax.lax.top_k(e, k)
            return e + v[:, :1] * 1e-30

        dt = chain_time(step_topk, e0, reps=4)
        print(f"  top_k({k:3d}) over [{b},{c}]: {dt*1e3:7.2f} ms", flush=True)

    # per-RAY top_k (the pair-model prep shape)
    er0 = jnp.asarray(rng.normal(size=(98304, c)).astype(np.float32))
    for k in (16, 32):
        def step_topk_r(e, k=k):
            v, i = jax.lax.top_k(e, k)
            return e + v[:, :1] * 1e-30

        dt = chain_time(step_topk_r, er0, reps=2)
        print(f"  top_k({k:3d}) over [98304,{c}] (x21 at 1080p): "
              f"{dt*1e3:7.2f} ms -> {dt*21*1e3:7.1f} ms", flush=True)

    # dense slab pass f32 vs bf16
    from raytracer2_tpu.ops.pallas_traverse import _entry_exact
    chunk = 98304
    o0 = jnp.asarray(rng.normal(size=(chunk, 3)).astype(np.float32))
    d0 = jnp.asarray(rng.normal(size=(chunk, 3)).astype(np.float32))
    tn = jnp.zeros((chunk,), jnp.float32)
    tx = jnp.full((chunk,), 1e5, jnp.float32)
    amin = jnp.asarray(rng.normal(size=(c, 3)).astype(np.float32))
    amax = amin + 1.0
    scale = n / chunk

    def step_slab(o):
        e = _entry_exact(o, d0, tn, tx, amin, amax)
        ue = jnp.min(e.reshape(-1, 128, c), axis=1)
        nt, ii = jax.lax.top_k(-ue, 256)
        return o + (nt[0, 0] * 1e-30)

    dt = chain_time(step_slab, o0, reps=4)
    print(f"  slab+union+top_k(256) [{chunk},{c}]: {dt*1e3:7.2f} ms "
          f"(x{scale:.0f} = {dt*scale*1e3:6.1f} ms at 1080p)", flush=True)

    def entry_bf16(o, d, tn, tx, amin, amax):
        eps = 1e-12
        ds = jnp.where(jnp.abs(d) < eps, jnp.where(d >= 0, eps, -eps), d)
        inv = (1.0 / ds).astype(jnp.bfloat16)
        ob = o.astype(jnp.bfloat16)
        near = jnp.full((o.shape[0], amin.shape[0]), -jnp.inf, jnp.bfloat16)
        far = jnp.full((o.shape[0], amin.shape[0]), jnp.inf, jnp.bfloat16)
        amin_b = amin.astype(jnp.bfloat16)
        amax_b = amax.astype(jnp.bfloat16)
        for ax in range(3):
            ia = inv[:, ax:ax + 1]
            oa = ob[:, ax:ax + 1]
            t0 = (amin_b[None, :, ax] - oa) * ia
            t1 = (amax_b[None, :, ax] - oa) * ia
            near = jnp.maximum(near, jnp.minimum(t0, t1))
            far = jnp.minimum(far, jnp.maximum(t0, t1))
        hit = ((near <= far) & (far >= tn[:, None].astype(jnp.bfloat16))
               & (near <= tx[:, None].astype(jnp.bfloat16))
               & (tx >= 0.0)[:, None])
        return jnp.where(hit, jnp.maximum(near, jnp.bfloat16(0)),
                         jnp.bfloat16(jnp.inf))

    def step_slab_bf16(o):
        e = entry_bf16(o, d0, tn, tx, amin, amax)
        ue = jnp.min(e.reshape(-1, 128, c), axis=1).astype(jnp.float32)
        nt, ii = jax.lax.top_k(-ue, 256)
        return o + (nt[0, 0] * 1e-30)

    dt = chain_time(step_slab_bf16, o0, reps=4)
    print(f"  slab(bf16)+union+top_k(256) [{chunk},{c}]: {dt*1e3:7.2f} ms "
          f"(x{scale:.0f} = {dt*scale*1e3:6.1f} ms at 1080p)", flush=True)


if __name__ == "__main__":
    main()
