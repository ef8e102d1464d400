"""Scatter-engine A/B at ladder scale: supercluster granularity sweep.

The bundle walk pays for the per-bundle candidate UNION (~12x a single
ray's overlap set on incoherent rays). The scatter engine bins exact
per-ray (ray, supercluster) pairs instead, so its work scales with the
per-ray overlap count — IF the supercluster granularity is fine enough.
This harness measures, on the 260k-tri ladder scene with the realistic
BRDF-bounce ray class (cosine hemisphere from real primary surfaces):

  - bundle_pallas exact cull (production incoherent shape) — baseline,
  - scatter at group in {16, 4, 2, 1} x avg_candidates tuned per group,

and reports throughput + hit parity vs the baseline + overflow flags.

Run from /root/repo:  timeout 580 python scripts/scatter_ab.py [--quick]
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
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--cls", default="brdf", choices=["brdf", "incoh"])
    ap.add_argument("--configs", default="16:16,4:24,2:32,1:48",
                    help="comma list of group:avg_candidates")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from raytracer2_tpu.models import procedural as proc
    from raytracer2_tpu.ops import pallas_traverse as ptm
    from raytracer2_tpu.ops import traverse_scatter as tsm
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
    smin = jnp.min(clusters.aabb_min, axis=0)
    smax = jnp.max(clusters.aabb_max, axis=0)
    lo, hi = np.asarray(smin), np.asarray(smax)
    rng = np.random.default_rng(5)

    g_view = cam.planar_view_constants()
    zidx, _ = raysmod.zorder_permutation(w, h)
    lin = np.arange(n)
    px_z = jnp.asarray((lin % w).astype(np.int32)[zidx])
    py_z = jnp.asarray((lin // w).astype(np.int32)[zidx])
    pri = raysmod.setup_primary_ray(px_z, py_z, g_view)

    if args.cls == "incoh":
        o = jnp.asarray(rng.uniform(lo, hi, (n, 3)).astype(np.float32))
        v = rng.normal(size=(n, 3)).astype(np.float32)
        d = jnp.asarray(v / np.linalg.norm(v, axis=1, keepdims=True))
        tn, tx = 1e-3, jnp.full((n,), 1e5, jnp.float32)
    else:
        from raytracer2_tpu.ops.traverse_bundle import closest_hit_bundle
        hit = closest_hit_bundle(
            clusters, scene.tri_geometry, scene.tri_primitive,
            pri.origin, pri.direction, pri.t_min, pri.t_max,
            smin, smax, sort_rays=False)
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
        db = (tang * (rr * np.cos(phi))[:, None]
              + bit * (rr * np.sin(phi))[:, None]
              + nrm * np.sqrt(np.maximum(1 - u1, 0))[:, None])
        db /= np.maximum(np.linalg.norm(db, axis=1, keepdims=True), 1e-9)
        o = jnp.asarray(o_b)
        d = jnp.asarray(db.astype(np.float32))
        tn = 1e-3
        tx = jnp.asarray(np.where(~missed, 1e5, -1.0).astype(np.float32))

    def timed(fn, *a, **kw):
        # min + median (ADVICE r3: a single best-of-N hides the
        # run-to-run spread a recorded bar carries)
        out = fn(*a, **kw)
        jax.block_until_ready(out)
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*a, **kw))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return ts[0], ts[len(ts) // 2], out

    print(f"scene tris={scene.tri_v0.shape[0]} clusters="
          f"{clusters.num_clusters} rays={n} cls={args.cls} "
          f"platform={jax.default_backend()}", flush=True)

    live_rays = np.asarray(tx > 0)
    n_live = int(live_rays.sum())

    big = clusters.num_clusters >= 512
    kw = dict(bundle_size=128, mb=16 if big else 8, group=8 if big else 4,
              k_cand=256, lean=True)
    dt_b, dmed_b, base = timed(
        ptm.closest_hit_bundle_pallas, clusters,
        scene.tri_geometry, scene.tri_primitive, o, d, tn, tx,
        smin, smax, overflow_fallback=False, with_overflow=True, **kw)
    base_hit = np.asarray(base[0].triangle_index)
    base_t = np.asarray(base[0].t)
    print(f"  bundle exact: min {dt_b*1e3:8.1f} / med {dmed_b*1e3:8.1f} ms "
          f"({n/dt_b/1e6:6.2f} Mr/s) ovf={bool(np.asarray(base[1]))}",
          flush=True)

    for spec in args.configs.split(","):
        g, k = (int(x) for x in spec.split(":"))
        sc = tsm.build_superclusters(clusters, group=g)
        try:
            dt, dmed, rec = timed(
                tsm.closest_hit_scatter, sc,
                scene.tri_geometry, scene.tri_primitive, o, d, tn, tx,
                avg_candidates=k)
            tri = np.asarray(rec.triangle_index)
            # agreement over LIVE rays only (ADVICE r3: dead lanes
            # trivially agree as misses and inflate the metric)
            agree = float(np.mean((tri == base_hit)[live_rays]))
            t_err = float(np.nanmax(np.abs(
                (np.asarray(rec.t) - base_t)[live_rays])))
            print(f"  scatter g={g:2d} K={k:3d}: min {dt*1e3:8.1f} / med "
                  f"{dmed*1e3:8.1f} ms ({n/dt/1e6:6.2f} Mr/s) "
                  f"live-agree={agree:.4f} max|dt|={t_err:.2e}", flush=True)
        except Exception as e:
            print(f"  scatter g={g:2d} K={k:3d}: FAILED "
                  f"{type(e).__name__}: {str(e)[:140]}", flush=True)


if __name__ == "__main__":
    main()
