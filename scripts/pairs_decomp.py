"""Pair-engine stage decomposition: prep (cull+sort+bin) vs pair gather vs
kernel sweep, at the quick or ladder config. Identifies which stage eats
the measured per-block ~11.5 us (pairs_ab r4 smoke).

Run from /root/repo:  timeout 580 python scripts/pairs_decomp.py [--quick]
"""

from __future__ import annotations

import argparse
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--group", type=int, default=16)
    ap.add_argument("--k", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from raytracer2_tpu.models import procedural as proc
    from raytracer2_tpu.ops import pallas_pairs as ppm
    from raytracer2_tpu.ops.cluster import build_clusters
    from raytracer2_tpu.render import rays as raysmod
    from raytracer2_tpu.render.app_bridge import _host_tris
    from raytracer2_tpu.scene import gltf
    from raytracer2_tpu.scene.camera import default_camera
    from raytracer2_tpu.scene.scene import build_scene

    if args.quick:
        w, h = 512, 512
        glb = proc.corridor_glb(segments=12, pillars_per_side=8,
                                lat=12, lon=16)
        campos = (0, 4, 60)
    else:
        w, h = 1920, 1080
        glb = proc.corridor_glb(segments=24, pillars_per_side=12,
                                lat=34, lon=53)
        campos = (0, 4, 90)
    with tempfile.TemporaryDirectory() as tmp:
        p = Path(tmp) / "scene.glb"
        proc.write_glb(p, glb)
        scene = build_scene(gltf.load_file(p))
    cam = default_camera(window_size=(w, h), position=campos,
                         direction=(0, 0, 1))
    host = _host_tris(scene)
    n = w * h
    clusters = build_clusters(*host, cluster_size=128)
    rng = np.random.default_rng(5)
    lo = np.asarray(jnp.min(clusters.aabb_min, axis=0))
    hi = np.asarray(jnp.max(clusters.aabb_max, axis=0))

    # incoherent class (same workload shape as brdf bounces, no setup trace)
    o = jnp.asarray(rng.uniform(lo, hi, (n, 3)).astype(np.float32))
    v = rng.normal(size=(n, 3)).astype(np.float32)
    d = jnp.asarray(v / np.linalg.norm(v, axis=1, keepdims=True))
    tn = jnp.zeros((n,), jnp.float32) + 1e-3
    tx = jnp.full((n,), 1e5, jnp.float32)

    ps = ppm.build_pair_scene(clusters, scene.tri_geometry,
                              scene.tri_primitive, group=args.group)
    k = args.k

    def timed(label, fn, *a):
        out = jax.block_until_ready(fn(*a))
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*a))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        print(f"  {label:28s} min {ts[0]*1e3:8.1f} ms / med "
              f"{ts[len(ts)//2]*1e3:8.1f} ms", flush=True)
        return out

    print(f"tris={scene.tri_v0.shape[0]} C={clusters.num_clusters} "
          f"C2={ps.num_superclusters} W={ps.lanes} rays={n} "
          f"g={args.group} K={k}", flush=True)

    bin_j = jax.jit(partial_bin := (lambda o_, d_, tn_, tx_:
                    ppm._bin_pairs(ps, o_, d_, tn_, tx_, k)))
    pair_ray, block_sc, block_live, ovf = timed(
        "bin (cull+topk+sort+pad)", bin_j, o, d, tn, tx)
    tp = pair_ray.shape[0]
    nblk = tp // ppm.PAIR_P
    live_blocks = int(np.asarray(block_live.sum()))
    live_pairs = int(np.asarray((pair_ray >= 0).sum()))
    print(f"  pool={tp} ({nblk} blocks, {live_blocks} live) "
          f"live_pairs={live_pairs}", flush=True)

    def gather(pr):
        live = pr >= 0
        safe = jnp.maximum(pr, 0)
        rays8 = jnp.concatenate(
            [o, d, tn[:, None], tx[:, None]], axis=1)
        r = rays8[safe]
        return jnp.where(live[:, None], r,
                         jnp.asarray([0, 0, 0, 0, 0, 1, 0, -1.0],
                                     jnp.float32)[None])

    gather_j = jax.jit(gather)
    rays8_pairs = timed("pair gather [tp, 8]", gather_j, pair_ray)

    sweep_j = jax.jit(lambda r8, bsc, blv: ppm._sweep_pairs(
        ps, r8, bsc, blv, False))
    keys = timed("kernel sweep", sweep_j, rays8_pairs, block_sc, block_live)

    # sweep with ALL blocks live (what the when-gate saves)
    all_live = jnp.ones_like(block_live)
    timed("kernel sweep (all live)", sweep_j, rays8_pairs, block_sc,
          all_live)

    # scatter-min decode
    def decode(keys_, pr):
        live = pr >= 0
        safe = jnp.maximum(pr, 0)
        big = jnp.int32(0x7FFFFFFF)
        keys_ = jnp.where(live, keys_, big)
        return jnp.full((n,), big, jnp.int32).at[safe].min(
            keys_, mode="drop")
    timed("scatter-min decode", jax.jit(decode), keys, pair_ray)

    # full engine for reference
    full = jax.jit(lambda: ppm.closest_hit_pairs(
        ps, clusters, scene.tri_geometry, scene.tri_primitive,
        o, d, tn, tx, jnp.asarray(lo), jnp.asarray(hi),
        k_cand=k, fallback=False))
    timed("closest_hit_pairs (full)", full)


if __name__ == "__main__":
    main()
