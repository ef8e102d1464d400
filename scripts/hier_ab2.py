"""Focused follow-up to hier_ab: hier cull with the fallback bound raised.

hier_ab measured every hier config at ~15 s — but that was the
*fallback*, not hier: FALLBACK_BUNDLES=32, and even the best config
(m=32, k_sc=48) overflowed 139 bundles, so every run tripped the
full-batch XLA retrace. This probe raises fallback_bundles so low-
overflow configs take the bounded partial path, and times _prep alone
for exact vs hier so the cull saving is visible separately.

Run from /root/repo:  timeout 1200 python scripts/hier_ab2.py
"""

from __future__ import annotations

import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")


def main():
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

    w, h = 1920, 1080
    glb = proc.corridor_glb(segments=24, pillars_per_side=12,
                            lat=34, lon=53)
    with tempfile.TemporaryDirectory() as tmp:
        p = Path(tmp) / "scene.glb"
        proc.write_glb(p, glb)
        scene = build_scene(gltf.load_file(p))
        cam = default_camera(window_size=(w, h), position=(0, 4, 90),
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

    kw = dict(bundle_size=128, mb=16, group=8, k_cand=256)
    print(f"tris={scene.tri_v0.shape[0]} clusters={clusters.num_clusters} "
          f"rays={n} platform={jax.default_backend()}", flush=True)

    def timed(fn, *a, **k):
        out = fn(*a, **k)
        jax.block_until_ready(out)
        best = np.inf
        for _ in range(3):
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

    def prep(o, d, tx, **pk):
        return prep_jit(o, d, 1e-3, tx, smin, smax,
                        bundle_size=kw["bundle_size"], presorted=False,
                        k_cand=kw["k_cand"], **pk)

    # prep-only timing: exact vs hier — the cull saving in isolation
    dt_pe = timed(prep, o_b, d_b, tx_b, cull="exact", m_super=32, k_sc=12)
    print(f"brdf prep exact          {dt_pe:7.1f} ms", flush=True)
    for m_super, k_sc in ((32, 48), (16, 48), (16, 96)):
        res = prep(o_b, d_b, tx_b, cull="hier", m_super=m_super, k_sc=k_sc)
        cnt = int(np.asarray(res[-1]).sum())
        dt_ph = timed(prep, o_b, d_b, tx_b, cull="hier",
                      m_super=m_super, k_sc=k_sc)
        print(f"brdf prep hier m={m_super:2d} k={k_sc:3d} {dt_ph:7.1f} ms "
              f"ovf {cnt}", flush=True)
        if cnt > 2048:
            continue
        dt = timed(ptm.closest_hit_bundle_pallas, clusters,
                   scene.tri_geometry, scene.tri_primitive,
                   o_b, d_b, 1e-3, tx_b, smin, smax, cull="hier",
                   m_super=m_super, k_sc=k_sc, fallback_bundles=4096,
                   wald_rows=wald, meta_rows=meta, **kw)
        print(f"  full hier m={m_super:2d} k={k_sc:3d} fb=4096 "
              f"{dt:7.1f} ms ({n/dt/1e3:6.2f} Mr/s)", flush=True)

    dt_e = timed(ptm.closest_hit_bundle_pallas, clusters,
                 scene.tri_geometry, scene.tri_primitive,
                 o_b, d_b, 1e-3, tx_b, smin, smax, cull="exact",
                 wald_rows=wald, meta_rows=meta, **kw)
    print(f"brdf full exact          {dt_e:7.1f} ms ({n/dt_e/1e3:6.2f} "
          f"Mr/s)", flush=True)


if __name__ == "__main__":
    main()
