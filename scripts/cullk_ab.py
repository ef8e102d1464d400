"""A/B the fused Pallas dense-cull kernels (ops/pallas_cull.py) against
the XLA chunked cull on hardware, per coherence class:

  brdf     — incoherent bounce rays (unsorted path: cand0 key kernel +
             union kernel both engage)
  shadow-z — presorted visibility batch (union kernel only; any-hit)
  pri-z    — presorted primary tiles, exact cull forced (union kernel
             only; production primaries use the interval cull which has
             no dense pass)

Also prints the standalone key/union pass times. Checks hit parity
(expected bit-exact: same f32 op order).

Run from /root/repo:   timeout 900 python scripts/cullk_ab.py [--quick]
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
    args = ap.parse_args()

    import tempfile
    from pathlib import Path

    import jax
    import jax.numpy as jnp
    import numpy as np

    from raytracer2_tpu.models import procedural as proc
    from raytracer2_tpu.ops import pallas_cull as pcull
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
    o_s = (np.asarray(pri.origin)
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
    o_b, d_b = jnp.asarray(o_s), jnp.asarray(d_b)

    # shadow class: surface origins, scattered bounded dirs to one point
    tgt = np.asarray(smin + (smax - smin) * jnp.asarray([0.5, 0.9, 0.5]))
    d_sh = tgt[None, :] - o_s
    dist = np.linalg.norm(d_sh, axis=1, keepdims=True)
    d_sh = jnp.asarray((d_sh / np.maximum(dist, 1e-9)).astype(np.float32))
    tx_sh = jnp.asarray(np.where(~missed, dist[:, 0] * 0.999,
                                 -1.0).astype(np.float32))

    big = clusters.num_clusters >= 512
    kw_inc = dict(bundle_size=128, mb=16 if big else 8,
                  group=8 if big else 4, k_cand=256, lean=True)
    kw_pre = dict(bundle_size=256 if not args.quick else 128, mb=8,
                  group=4, k_cand=256, presorted=True, cull="exact")
    wald = ptm._wald_rows(clusters)
    meta = ptm._tri_meta(clusters, scene.tri_geometry, scene.tri_primitive)
    print(f"tris={scene.num_triangles} clusters={clusters.num_clusters} "
          f"rays={n} platform={jax.default_backend()}", flush=True)

    def timed(fn, *a, **kws):
        out = fn(*a, **kws)
        jax.block_until_ready(out)
        best = np.inf
        for _ in range(args.reps):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*a, **kws))
            best = min(best, time.perf_counter() - t0)
        return best * 1e3, out

    # standalone pass microbench
    boxes = pcull.box_rows(clusters.aabb_min, clusters.aabb_max)
    rays8 = ptm._pack_rays8(o_b, d_b, jnp.full((n,), 1e-3), tx_b)
    npad = (-(n) % 128)
    rays8p = jnp.concatenate(
        [rays8, jnp.tile(jnp.asarray([[0, 0, 0, 0, 0, 1, 0, -1]],
                                     jnp.float32), (npad, 1))]) \
        if npad else rays8

    dt, _ = timed(pcull.nearest_box_pallas, rays8, boxes)
    print(f"  key kernel  standalone {dt:8.1f} ms", flush=True)
    xla_key = jax.jit(lambda: ptm._cand0_sort_key(
        o_b, d_b, jnp.full((n,), 1e-3), tx_b,
        clusters.aabb_min, clusters.aabb_max, smin, smax))
    dt, _ = timed(xla_key)
    print(f"  key XLA     standalone {dt:8.1f} ms (incl. tiebreak)",
          flush=True)
    dt, _ = timed(pcull.bundle_union_pallas, rays8p, boxes, p=128)
    print(f"  union kernel standalone {dt:8.1f} ms", flush=True)

    for cls in ("brdf", "shadow-z", "pri-z"):
        if cls == "brdf":
            def trace(**kws):
                return timed(ptm.closest_hit_bundle_pallas, clusters,
                             scene.tri_geometry, scene.tri_primitive,
                             o_b, d_b, 1e-3, tx_b, smin, smax,
                             wald_rows=wald, meta_rows=meta,
                             **kw_inc, **kws)
        elif cls == "shadow-z":
            def trace(**kws):
                return timed(ptm.occluded_bundle_pallas, clusters,
                             o_b, d_sh, 1e-3, tx_sh, smin, smax,
                             wald_rows=wald, **kw_pre, **kws)
        else:
            def trace(**kws):
                return timed(ptm.closest_hit_bundle_pallas, clusters,
                             scene.tri_geometry, scene.tri_primitive,
                             pri.origin, pri.direction, pri.t_min,
                             pri.t_max, smin, smax, wald_rows=wald,
                             meta_rows=meta, **kw_pre, **kws)

        dt0, ref = trace(cull_kernel=False)
        dt1, out = trace(cull_kernel=True)
        if cls == "shadow-z":
            mism = int(np.sum(np.asarray(out) != np.asarray(ref)))
        else:
            mism = int(np.sum(np.asarray(out.triangle_index)
                              != np.asarray(ref.triangle_index)))
        print(f"  {cls:9s} xla {dt0:7.1f} ms -> kernel {dt1:7.1f} ms "
              f"({dt0/dt1:4.2f}x, {n/dt1/1e3:6.2f} Mr/s) mismatch={mism}",
              flush=True)


if __name__ == "__main__":
    main()
