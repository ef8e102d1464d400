"""A/B: exact dense cull vs hier (supercluster) cull + overflow fallback.

The dense [N, C] per-ray cull costs ~half of every incoherent-class
trace at ladder scale, and the flagship frame runs THREE such traces
(DI brdf-candidate, brdf_rays, secondary DI candidate). cull="hier"
runs the dense pass at supercluster granularity (C/m_super) and
refines only clusters inside each bundle's k_sc nearest SCs — since
round 3's per-bundle overflow fallback, its k_sc truncation is
*caught* (overflowed = union>k | sc_dropped) and re-traced exactly, so
the A/B is purely about speed + overflow rate.

Run from /root/repo:  timeout 1200 python scripts/hier_ab.py [--quick]
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

    from raytracer2_tpu.ops.traverse_bundle import closest_hit_bundle

    hit = closest_hit_bundle(
        clusters, scene.tri_geometry, scene.tri_primitive,
        pri.origin, pri.direction, pri.t_min, pri.t_max,
        smin, smax, sort_rays=False)
    rng = np.random.default_rng(7)
    t_h = np.asarray(hit.t)
    missed = np.asarray(hit.missed)
    surf_o = (np.asarray(pri.origin)
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
    o_b, d_b = jnp.asarray(surf_o), jnp.asarray(d_b)

    # shadow class: tile origins (real surfaces), dirs to 8 light points
    lo, hi = np.asarray(smin), np.asarray(smax)
    lights_p = rng.uniform(lo, hi, (8, 3)).astype(np.float32)
    pick = rng.integers(0, 8, (n,))
    to_l = lights_p[pick] - surf_o
    dist = np.linalg.norm(to_l, axis=1, keepdims=True)
    d_sh = jnp.asarray((to_l / np.maximum(dist, 1e-6)).astype(np.float32))
    tx_sh = jnp.asarray((dist[:, 0] * (1 - 1e-3)).astype(np.float32))

    big = clusters.num_clusters >= 512
    kw = dict(bundle_size=128, mb=16 if big else 8, group=8 if big else 4,
              k_cand=256)
    print(f"tris={scene.tri_v0.shape[0]} clusters={clusters.num_clusters} "
          f"rays={n} platform={jax.default_backend()}", flush=True)

    def timed(fn, *a, **k):
        out = fn(*a, **k)
        jax.block_until_ready(out)
        best = np.inf
        for _ in range(args.reps):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*a, **k))
            best = min(best, time.perf_counter() - t0)
        return best * 1e3

    wald = ptm._wald_rows(clusters)
    meta = ptm._tri_meta(clusters, scene.tri_geometry, scene.tri_primitive)

    prep_jit = jax.jit(
        partial(ptm._prep, clusters),
        static_argnames=("bundle_size", "presorted", "cull", "k_cand",
                         "m_super", "k_sc", "t_cap", "sort_key"))

    def ovf_frac(o, d, tx, **pk):
        res = prep_jit(o, d, 1e-3, tx, smin, smax,
                       bundle_size=kw["bundle_size"], presorted=False,
                       k_cand=kw["k_cand"], **pk)
        ovf = np.asarray(res[-1])
        return int(ovf.sum()), ovf.shape[0]

    for cls, (o, d, tx) in (("brdf", (o_b, d_b, tx_b)),
                            ("shadow", (surf_o, d_sh, tx_sh))):
        o = jnp.asarray(o)
        base_rec = ptm.closest_hit_bundle_pallas(
            clusters, scene.tri_geometry, scene.tri_primitive,
            o, d, 1e-3, tx, smin, smax, cull="exact",
            wald_rows=wald, meta_rows=meta, **kw)
        dt = timed(ptm.closest_hit_bundle_pallas, clusters,
                   scene.tri_geometry, scene.tri_primitive,
                   o, d, 1e-3, tx, smin, smax, cull="exact",
                   wald_rows=wald, meta_rows=meta, **kw)
        cnt, b = ovf_frac(o, d, tx, cull="exact", m_super=32, k_sc=12)
        print(f"  {cls}: exact {dt:7.1f} ms ({n/dt/1e3:6.2f} Mr/s) "
              f"ovf {cnt}/{b}", flush=True)
        for m_super, k_sc in ((32, 12), (32, 24), (32, 48), (16, 24)):
            cnt, b = ovf_frac(o, d, tx, cull="hier",
                              m_super=m_super, k_sc=k_sc)
            dt_h = timed(ptm.closest_hit_bundle_pallas, clusters,
                         scene.tri_geometry, scene.tri_primitive,
                         o, d, 1e-3, tx, smin, smax, cull="hier",
                         m_super=m_super, k_sc=k_sc,
                         wald_rows=wald, meta_rows=meta, **kw)
            rec = ptm.closest_hit_bundle_pallas(
                clusters, scene.tri_geometry, scene.tri_primitive,
                o, d, 1e-3, tx, smin, smax, cull="hier",
                m_super=m_super, k_sc=k_sc,
                wald_rows=wald, meta_rows=meta, **kw)
            mism = int(np.sum(np.asarray(rec.triangle_index)
                              != np.asarray(base_rec.triangle_index)))
            print(f"  {cls}: hier m={m_super} k_sc={k_sc} {dt_h:7.1f} ms "
                  f"({n/dt_h/1e3:6.2f} Mr/s) ovf {cnt}/{b} "
                  f"tri-mism {mism}/{n}", flush=True)


if __name__ == "__main__":
    main()
