"""A/B two r3.4 traversal levers on the ladder BRDF class (hardware):

  lean=True      — [P]-wide winner-step carry in the walk kernel instead
                   of the per-step [P, W] code extraction
  sort_key=sc4   — the cand0 cull-order key computed against 4-cluster
                   supercluster AABBs (1/4 the dense key pass)

Times baseline / lean / sc4 / lean+sc4 on the realistic BRDF bounce
batch (brdf class: prep 174 ms / kernel 176 / finalize 39 at r3.3), and
checks hit parity against the baseline trace.

Run from /root/repo:   timeout 900 python scripts/lean_ab.py [--quick]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cls", default="brdf", choices=["brdf", "pri-z"])
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

    if args.cls == "pri-z":
        o_b, d_b = pri.origin, pri.direction
        tn_b, tx_b = pri.t_min, pri.t_max
        kw0 = dict(bundle_size=256 if not args.quick else 128, mb=8,
                   group=4, k_cand=256, presorted=True)
    else:
        tn_b = 1e-3
        big = clusters.num_clusters >= 512
        kw0 = dict(bundle_size=128, mb=16 if big else 8,
                   group=8 if big else 4, k_cand=256)
    wald = ptm._wald_rows(clusters)
    meta = ptm._tri_meta(clusters, scene.tri_geometry, scene.tri_primitive)
    print(f"cls={args.cls} tris={scene.num_triangles} "
          f"clusters={clusters.num_clusters} rays={n} "
          f"platform={jax.default_backend()} kw={kw0}", flush=True)

    def timed(fn, *a, **kws):
        out = fn(*a, **kws)
        jax.block_until_ready(out)
        best = np.inf
        for _ in range(args.reps):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*a, **kws))
            best = min(best, time.perf_counter() - t0)
        return best * 1e3, out

    def trace(**kws):
        return timed(ptm.closest_hit_bundle_pallas, clusters,
                     scene.tri_geometry, scene.tri_primitive,
                     o_b, d_b, tn_b, tx_b, smin, smax,
                     wald_rows=wald, meta_rows=meta, **kw0, **kws)

    dt0, ref = trace()
    print(f"  baseline          {dt0:8.1f} ms ({n/dt0/1e3:6.2f} Mr/s)",
          flush=True)
    variants = [("lean", dict(lean=True))]
    if args.cls == "brdf":
        variants += [("sc4", dict(sort_key="sc4")),
                     ("lean+sc4", dict(lean=True, sort_key="sc4"))]
    for name, kws in variants:
        dt, out = trace(**kws)
        tri_m = int(np.sum(np.asarray(out.triangle_index)
                           != np.asarray(ref.triangle_index)))
        t_m = float(np.max(np.abs(np.asarray(out.t)
                                  - np.asarray(ref.t))))
        print(f"  {name:16s}  {dt:8.1f} ms ({n/dt/1e3:6.2f} Mr/s) "
              f"tri_mismatch={tri_m} max|dt|={t_m:.2e}", flush=True)


if __name__ == "__main__":
    main()
