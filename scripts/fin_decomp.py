"""Split a production closest-hit trace into prep / kernel / finalize.

trace_decomp reports walk+fin = full - prep, but the kernel's own step
telemetry (~0.9 us/step) accounts for only ~quarter of that on
incoherent classes. This probe times three jitted prefixes of
closest_hit_bundle_pallas on the SAME batch:

  prep    — _prep only (dense cull + sort + top_k + rank)
  kernel  — prep + pack/pad + the pallas_call, returning the raw winner
            codes (no finalize gathers, no fallback branch)
  full    — the production call (finalize + un-sort + fallback cond)

Run from /root/repo:   timeout 580 python scripts/fin_decomp.py [--quick]
"""

from __future__ import annotations

import argparse
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import tempfile
    from pathlib import Path

    import jax
    import jax.numpy as jnp
    import numpy as np

    from raytracer2_tpu.models import procedural as proc
    from raytracer2_tpu.ops import pallas_traverse as ptm
    from raytracer2_tpu.ops.cluster import build_clusters
    from raytracer2_tpu.render import rays as raysmod
    from raytracer2_tpu.render.app_bridge import _host_tris
    from raytracer2_tpu.scene import gltf
    from raytracer2_tpu.scene.camera import default_camera
    from raytracer2_tpu.scene.scene import build_scene

    if args.quick:
        w, h = 256, 256
        glb = proc.corridor_glb(segments=12, pillars_per_side=8,
                                lat=12, lon=16)
    else:
        w, h = 1920, 1080
        glb = proc.corridor_glb(segments=24, pillars_per_side=12,
                                lat=34, lon=53)
    with tempfile.TemporaryDirectory() as tmp:
        p = Path(tmp) / "scene.glb"
        proc.write_glb(p, glb)
        scene = build_scene(gltf.load_file(p))
        cam = default_camera(window_size=(w, h),
                             position=(0, 4, 90 if not args.quick else 60),
                             direction=(0, 0, 1))
    host = _host_tris(scene)
    clusters = build_clusters(*host, cluster_size=128)
    smin = jnp.min(clusters.aabb_min, axis=0)
    smax = jnp.max(clusters.aabb_max, axis=0)
    n = w * h

    g_view = cam.planar_view_constants()
    zidx, _ = raysmod.zorder_permutation(w, h)
    lin = np.arange(n)
    px_z = jnp.asarray((lin % w).astype(np.int32)[zidx])
    py_z = jnp.asarray((lin // w).astype(np.int32)[zidx])
    pri = raysmod.setup_primary_ray(px_z, py_z, g_view)

    # realistic BRDF bounce class from the real primary surfaces
    from raytracer2_tpu.ops.traverse_bundle import closest_hit_bundle

    hit = closest_hit_bundle(
        clusters, scene.tri_geometry, scene.tri_primitive,
        pri.origin, pri.direction, pri.t_min, pri.t_max,
        smin, smax, sort_rays=False)
    rng = np.random.default_rng(7)
    t_h = np.asarray(hit.t)
    missed = np.asarray(hit.missed)
    o_b = (np.asarray(pri.origin)
           + np.asarray(pri.direction) * t_h[:, None] * 0.999)
    tri_h = np.where(missed, 0, np.asarray(hit.triangle_index))
    e1 = np.asarray(scene.tri_edge1)[tri_h]
    e2 = np.asarray(scene.tri_edge2)[tri_h]
    nrm = np.cross(e1, e2)
    nrm /= np.maximum(np.linalg.norm(nrm, axis=1, keepdims=True), 1e-9)
    d_in = np.asarray(pri.direction)
    nrm = np.where((np.sum(nrm * d_in, axis=1) > 0)[:, None], -nrm, nrm)
    u1, u2 = rng.uniform(size=(2, n)).astype(np.float32)
    rr, phi = np.sqrt(u1), 2 * np.pi * u2
    tang = np.cross(nrm, np.where(np.abs(nrm[:, 2:3]) < 0.9,
                                  [0, 0, 1], [1, 0, 0]))
    tang /= np.maximum(np.linalg.norm(tang, axis=1, keepdims=True), 1e-9)
    bit = np.cross(nrm, tang)
    d_b = (tang * (rr * np.cos(phi))[:, None]
           + bit * (rr * np.sin(phi))[:, None]
           + nrm * np.sqrt(np.maximum(1 - u1, 0))[:, None])
    d_b = (d_b / np.maximum(np.linalg.norm(d_b, axis=1, keepdims=True),
                            1e-9)).astype(np.float32)
    tx_b = jnp.asarray(np.where(~missed, 1e5, -1.0).astype(np.float32))
    o_b, d_b = jnp.asarray(o_b), jnp.asarray(d_b)

    big = clusters.num_clusters >= 512
    kw = dict(bundle_size=128, mb=16 if big else 8, group=8 if big else 4,
              k_cand=256)
    print(f"tris={scene.tri_v0.shape[0]} clusters={clusters.num_clusters} "
          f"rays={n} platform={jax.default_backend()} kw={kw}", flush=True)

    def timed(fn, *a):
        out = fn(*a)
        jax.block_until_ready(out)
        best = np.inf
        for _ in range(args.reps):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*a))
            best = min(best, time.perf_counter() - t0)
        return best * 1e3

    wald = ptm._wald_rows(clusters)
    sp = ptm._s_pad(clusters)
    group = max(1, min(kw["group"], (1 << ptm.SLOT_BITS) // sp))
    p, mb, k_cand = kw["bundle_size"], kw["mb"], kw["k_cand"]

    @jax.jit
    def prep_only(o, d, tx):
        return ptm._prep(clusters, o, d, 1e-3, tx, smin, smax,
                         p, False, "exact", k_cand, 32, 12, t_cap=False)

    @jax.jit
    def kernel_only(o, d, tx):
        (perm, os, ds, tn, txs, _cif, cand_idx, cand_t, cand_count,
         _n, b, kp, _txo, _ovf) = ptm._prep(
            clusters, o, d, 1e-3, tx, smin, smax,
            p, False, "exact", k_cand, 32, 12, t_cap=False)
        rays8 = ptm._pack_rays8(os, ds, tn, txs)
        b_pad, rays8, cand_idx, cand_t, cand_count = ptm._pad_bundles(
            mb, b, rays8, cand_idx, cand_t, cand_count, p)
        import jax.experimental.pallas as pl

        out = pl.pallas_call(
            partial(ptm._walk_kernel, group=group, mb=mb, sc_m=0, mm=False,
                    debug_steps=False),
            grid_spec=ptm._grid_spec(b_pad, p, kp, sp, group, depth=2,
                                     out_rows=1, mb=mb),
            out_shape=jax.ShapeDtypeStruct((b_pad, 1, p), jnp.int32),
        )(cand_count, rays8, cand_idx, cand_t, wald)
        return out[:, 0, :]

    def full(o, d, tx):
        return ptm.closest_hit_bundle_pallas(
            clusters, scene.tri_geometry, scene.tri_primitive,
            o, d, 1e-3, tx, smin, smax, wald_rows=wald, **kw)

    dt_p = timed(prep_only, o_b, d_b, tx_b)
    dt_k = timed(kernel_only, o_b, d_b, tx_b)
    dt_f = timed(full, o_b, d_b, tx_b)
    print(f"brdf: prep {dt_p:7.1f} ms | +kernel {dt_k:7.1f} ms "
          f"(kernel {dt_k - dt_p:6.1f}) | full {dt_f:7.1f} ms "
          f"(finalize+fallback {dt_f - dt_k:6.1f})", flush=True)


if __name__ == "__main__":
    main()
