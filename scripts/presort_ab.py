"""A/B: trace the realistic BRDF-bounce class in ARRIVAL (pixel-Z) order
vs the cand0 exact sort.

BRDF rays originate at primary-hit surfaces, which arrive in Z-tile pixel
order — origins are already spatially coherent; only directions scatter.
If pixel-order bundle unions stay near the cand0-sorted unions, the trace
can skip the whole sort round trip: key (80 ms) + argsort (27) + ray
gather (54) + inv_perm (27) + unsort gather (54) on the 1080p ladder.

Run from /root/repo with no PYTHONPATH:

    timeout 580 python scripts/presort_ab.py
"""

from __future__ import annotations

import sys
import time

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
    with tempfile.TemporaryDirectory() as tmp:
        p = Path(tmp) / "scene.glb"
        proc.write_glb(p, proc.corridor_glb(
            segments=24, pillars_per_side=12, lat=34, lon=53))
        cam = default_camera(window_size=(w, h),
                             position=(0, 4, 90), direction=(0, 0, 1))
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

    clusters = build_clusters(*host, cluster_size=128)
    smin = jnp.min(clusters.aabb_min, axis=0)
    smax = jnp.max(clusters.aabb_max, axis=0)

    from raytracer2_tpu.ops.traverse_bundle import closest_hit_bundle

    hit = closest_hit_bundle(
        clusters, scene.tri_geometry, scene.tri_primitive,
        pri.origin, pri.direction, pri.t_min, pri.t_max,
        smin, smax, sort_rays=False)
    t_h = np.asarray(hit.t)
    missed = np.asarray(hit.missed)
    o = (np.asarray(pri.origin)
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
    d = (tang * (rr * np.cos(phi))[:, None]
         + bit * (rr * np.sin(phi))[:, None]
         + nrm * np.sqrt(np.maximum(1 - u1, 0))[:, None])
    d = (d / np.maximum(np.linalg.norm(d, axis=1, keepdims=True), 1e-9)
         ).astype(np.float32)
    o_j = jnp.asarray(o)
    d_j = jnp.asarray(d)
    tx = jnp.asarray(np.where(~missed, 1e5, -1.0).astype(np.float32))

    def timed(label, fn, reps=3):
        out = fn()
        jax.block_until_ready(out)
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(fn())
            best = min(best, time.perf_counter() - t0)
        print(f"  {label:28s} {best*1e3:8.1f} ms ({n/best/1e6:6.2f} Mr/s)",
              flush=True)
        return out

    print(f"brdf-class rays={n} clusters={clusters.num_clusters} "
          f"platform={jax.default_backend()}", flush=True)

    configs = [
        ("cand0 sort (prod)", dict(presorted=False, bundle_size=128,
                                   mb=16, group=8, k_cand=256)),
        ("pixelZ presorted b=128", dict(presorted=True, bundle_size=128,
                                        mb=16, group=8, k_cand=256)),
        ("pixelZ presorted b=256", dict(presorted=True, bundle_size=256,
                                        mb=8, group=4, k_cand=384)),
    ]
    recs = {}
    for label, kw in configs:
        recs[label] = timed(label, lambda kw=kw: ptm.closest_hit_bundle_pallas(
            clusters, scene.tri_geometry, scene.tri_primitive,
            o_j, d_j, 1e-3, tx, smin, smax, **kw))

    # parity: presorted must agree with the sorted production path
    base = recs[configs[0][0]]
    for label, _ in configs[1:]:
        r = recs[label]
        mism = int(np.sum(np.asarray(r.triangle_index)
                          != np.asarray(base.triangle_index)))
        print(f"  {label}: tri mismatches vs prod = {mism} "
              f"({mism/n*100:.4f}%)", flush=True)


if __name__ == "__main__":
    main()
