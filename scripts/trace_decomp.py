"""Decompose trace time: prep (dense cull + sort + rank) vs walk kernel.

Times, at the production by_sort shapes for both coherence classes on
the ladder scene:
  - prep-only (jit of _prep: per-ray dense cull, cand0 sort, top_k,
    rank_rows),
  - the full closest-hit call,
  - walk ~= full - prep (the kernel + finalize gathers),
and optionally sweeps cluster_size (64/128/256) at the incoherent
class, where per-step lane work (W = group * S_pad) trades against
union candidate counts.

Run from /root/repo with no PYTHONPATH:

    timeout 580 python scripts/trace_decomp.py [--cpu] [--quick]
    timeout 580 python scripts/trace_decomp.py --csweep
"""

from __future__ import annotations

import argparse
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--csweep", action="store_true",
                    help="sweep cluster_size at the incoherent class")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
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
        scene_kind, w, h = "corridor", 256, 256
    else:
        scene_kind, w, h = "ladder", 1920, 1080
    with tempfile.TemporaryDirectory() as tmp:
        p = Path(tmp) / "scene.glb"
        if scene_kind == "ladder":
            proc.write_glb(p, proc.corridor_glb(
                segments=24, pillars_per_side=12, lat=34, lon=53))
            cam = default_camera(window_size=(w, h),
                                 position=(0, 4, 90), direction=(0, 0, 1))
        else:
            proc.write_glb(p, proc.corridor_glb(
                segments=12, pillars_per_side=8, lat=12, lon=16))
            cam = default_camera(window_size=(w, h),
                                 position=(0, 4, 60), direction=(0, 0, 1))
        scene = build_scene(gltf.load_file(p))
    host = _host_tris(scene)
    n = w * h

    g_view = cam.planar_view_constants()
    zidx, _ = raysmod.zorder_permutation(w, h)
    lin = np.arange(n)
    px_z = jnp.asarray((lin % w).astype(np.int32)[zidx])
    py_z = jnp.asarray((lin // w).astype(np.int32)[zidx])
    pri = raysmod.setup_primary_ray(px_z, py_z, g_view)

    rng = np.random.default_rng(5)

    def timed(fn, *a, **kw):
        out = fn(*a, **kw)
        jax.block_until_ready(out)
        best = np.inf
        for _ in range(args.reps):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*a, **kw))
            best = min(best, time.perf_counter() - t0)
        return best

    def run_at(cluster_size):
        clusters = build_clusters(*host, cluster_size=cluster_size)
        smin = jnp.min(clusters.aabb_min, axis=0)
        smax = jnp.max(clusters.aabb_max, axis=0)
        lo, hi = np.asarray(smin), np.asarray(smax)
        o_inc = jnp.asarray(rng.uniform(lo, hi, (n, 3)).astype(np.float32))
        v = rng.normal(size=(n, 3)).astype(np.float32)
        d_inc = jnp.asarray(v / np.linalg.norm(v, axis=1, keepdims=True))
        tmax_inc = jnp.full((n,), 1e5, jnp.float32)

        big = clusters.num_clusters >= 512
        shapes = {
            "pri-z": dict(bundle_size=256 if big else 128, mb=8, group=4,
                          k_cand=256, presorted=True),
            "incoh": dict(bundle_size=128, mb=16 if big else 8,
                          group=8 if big else 4, k_cand=256,
                          presorted=False),
        }
        # shadow-like class: Z-coherent tile origins (reuse the primary
        # grid origins offset into the scene) but scattered bounded
        # directions toward a handful of light points — the production
        # presorted="shadow" shape (bridge visibility rays)
        lights_p = rng.uniform(lo, hi, (8, 3)).astype(np.float32)
        surf_o = np.asarray(pri.origin) + 0.5 * np.asarray(pri.direction) \
            * np.linalg.norm(hi - lo)
        surf_o = np.clip(surf_o, lo, hi).astype(np.float32)
        pick = rng.integers(0, 8, (n,))
        to_l = lights_p[pick] - surf_o
        dist = np.linalg.norm(to_l, axis=1, keepdims=True)
        d_sh = jnp.asarray(to_l / np.maximum(dist, 1e-6))
        o_sh = jnp.asarray(surf_o)
        tx_sh = jnp.asarray((dist[:, 0] * (1 - 1e-3)).astype(np.float32))
        shapes["shadow-z"] = dict(shapes["incoh"], presorted=True)
        # realistic BRDF class: cosine-sampled bounce dirs from the real
        # primary surfaces (what brdf_rays traces in production); random
        # "incoh" overstates union inflation (hier key +51% steps on
        # random rays but only +14% here)
        from raytracer2_tpu.ops.traverse_bundle import closest_hit_bundle

        hit = closest_hit_bundle(
            clusters, scene.tri_geometry, scene.tri_primitive,
            pri.origin, pri.direction, pri.t_min, pri.t_max,
            smin, smax, sort_rays=False)
        t_h = np.asarray(hit.t)
        missed = np.asarray(hit.missed)
        o_brdf = (np.asarray(pri.origin)
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
        d_brdf = (tang * (rr * np.cos(phi))[:, None]
                  + bit * (rr * np.sin(phi))[:, None]
                  + nrm * np.sqrt(np.maximum(1 - u1, 0))[:, None])
        d_brdf = (d_brdf
                  / np.maximum(np.linalg.norm(d_brdf, axis=1,
                                              keepdims=True), 1e-9)
                  ).astype(np.float32)
        tx_brdf = np.where(~missed, 1e5, -1.0).astype(np.float32)
        shapes["brdf"] = dict(shapes["incoh"])
        batches = {
            "pri-z": (pri.origin, pri.direction, pri.t_min, pri.t_max),
            "shadow-z": (o_sh, d_sh, 1e-3, tx_sh),
            "brdf": (jnp.asarray(o_brdf), jnp.asarray(d_brdf),
                     1e-3, jnp.asarray(tx_brdf)),
            "incoh": (o_inc, d_inc, 1e-3, tmax_inc),
        }
        print(f"cluster_size={cluster_size} tris={scene.tri_v0.shape[0]} "
              f"clusters={clusters.num_clusters} rays={n} "
              f"platform={jax.default_backend()}", flush=True)

        prep_jit = jax.jit(
            partial(ptm._prep, cull="auto", m_super=32, k_sc=12),
            static_argnames=("bundle_size", "presorted", "k_cand", "t_cap"))

        for cls, (o, d, tn, tx) in batches.items():
            kw = shapes[cls]
            # the shadow class is an any-hit workload in production
            if cls == "shadow-z":
                def tracefn(*a, **k):
                    return ptm.occluded_bundle_pallas(*a, **k)
            else:
                def tracefn(*a, **k):
                    return ptm.closest_hit_bundle_pallas(
                        a[0], scene.tri_geometry, scene.tri_primitive,
                        *a[1:], **k)
            dt_prep = timed(
                prep_jit, clusters, o, d, tn, tx, smin, smax,
                bundle_size=kw["bundle_size"], presorted=kw["presorted"],
                k_cand=kw["k_cand"], t_cap=False)
            dt_full = timed(
                tracefn, clusters, o, d, tn, tx,
                smin, smax, interpret=args.interpret, **kw)
            print(f"  {cls}: prep {dt_prep*1e3:8.1f} ms | full "
                  f"{dt_full*1e3:8.1f} ms | walk+fin "
                  f"{(dt_full-dt_prep)*1e3:8.1f} ms "
                  f"({n/dt_full/1e6:6.2f} Mr/s)", flush=True)
            # interval cull: [B, C] bundle-granularity slab test instead
            # of the dense per-ray [N, C] pass — full-length candidate
            # lists, no overflow; tight for coherent bundles
            if kw["presorted"] or cls == "incoh":
                iv = "interval" if kw["presorted"] else "exact_iv"
                dt_iv = timed(
                    tracefn, clusters, o, d, tn, tx,
                    smin, smax, cull=iv, overflow_fallback=False,
                    interpret=args.interpret, **kw)
                print(f"  {cls}: cull={iv} full {dt_iv*1e3:8.1f} ms "
                      f"({n/dt_iv/1e6:6.2f} Mr/s)", flush=True)
            if cls == "shadow-z":
                # octz: keep the exact cull but re-sort the Z-arrival
                # batch by octant|t_bucket (cheap [N] key, no dense key
                # pass; halves walk steps in interpret telemetry)
                kw_oz = dict(kw, presorted=False)
                dt_oz = timed(
                    tracefn, clusters, o, d, tn, tx,
                    smin, smax, sort_key="octz",
                    interpret=args.interpret, **kw_oz)
                print(f"  {cls}: sort_key=octz full {dt_oz*1e3:8.1f} ms "
                      f"({n/dt_oz/1e6:6.2f} Mr/s)", flush=True)
            if cls in ("shadow-z", "brdf"):
                # octz-sorted INTERVAL cull: bundles share an octant +
                # t bucket so the direction intervals don't span zero —
                # drops the dense [N, C] pass entirely if unions hold
                kw_oi = dict(kw, presorted=False)
                dt_oi = timed(
                    tracefn, clusters, o, d, tn, tx,
                    smin, smax, sort_key="octz", cull="interval",
                    overflow_fallback=False,
                    interpret=args.interpret, **kw_oi)
                print(f"  {cls}: octz+interval full {dt_oi*1e3:8.1f} ms "
                      f"({n/dt_oi/1e6:6.2f} Mr/s)", flush=True)
            if not kw["presorted"]:
                # hier sort key: SC-granularity dense pass for the cull
                # sort (1/32 of the cand0 key cost), exact cull after
                dt_hk = timed(
                    ptm.closest_hit_bundle_pallas, clusters,
                    scene.tri_geometry, scene.tri_primitive, o, d, tn, tx,
                    smin, smax, sort_key="hier", overflow_fallback=False,
                    interpret=args.interpret, **kw)
                print(f"  {cls}: sort_key=hier full {dt_hk*1e3:8.1f} ms "
                      f"({n/dt_hk/1e6:6.2f} Mr/s)", flush=True)
                if not args.interpret:
                    # scatter engine: per-ray exact pair binning — no
                    # union inflation, but no front-to-back early exit
                    from raytracer2_tpu.ops import traverse_scatter as tsm
                    sc = tsm.build_superclusters(clusters, group=16)
                    try:
                        dt_sc = timed(
                            tsm.closest_hit_scatter, sc,
                            scene.tri_geometry, scene.tri_primitive,
                            o, d, tn, tx)
                        print(f"  {cls}: scatter full {dt_sc*1e3:8.1f} ms "
                              f"({n/dt_sc/1e6:6.2f} Mr/s)", flush=True)
                    except Exception as e:  # OOM-class failures expected
                        print(f"  {cls}: scatter FAILED {type(e).__name__}: "
                              f"{str(e)[:120]}", flush=True)

    if args.csweep:
        for cs in (64, 128, 256):
            run_at(cs)
    else:
        run_at(128)


if __name__ == "__main__":
    main()
