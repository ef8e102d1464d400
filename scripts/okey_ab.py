"""A/B: sort BRDF-class rays by KNOWN origin cluster + direction octant
instead of the dense-pass cand0 key.

The cand0 key re-derives each ray's nearest overlapped cluster with a
dense [N, C] slab pass (80 ms at 1080p/3072 clusters). A bounce ray's
origin sits ON a triangle whose cluster id the previous trace already
knows — key = (origin_cluster | octant | morton) costs nothing. This
measures whether origin-cluster bundle composition keeps the walk near
cand0 quality.

Run from /root/repo with no PYTHONPATH:

    timeout 580 python scripts/okey_ab.py
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

    # origin cluster of each bounce ray, known from the primary trace
    tri_cluster = np.full(scene.tri_v0.shape[0], -1, np.int64)
    tids = np.asarray(clusters.tri_index).reshape(-1)
    slots = np.arange(tids.shape[0])
    valid = tids >= 0
    tri_cluster[tids[valid]] = slots[valid] // np.asarray(
        clusters.tri_index).shape[1]
    oc = np.where(missed, clusters.num_clusters, tri_cluster[tri_h])

    # octant of the bounce direction + morton of the origin as tiebreak
    octant = ((d[:, 0] >= 0).astype(np.int64)
              | ((d[:, 1] >= 0).astype(np.int64) << 1)
              | ((d[:, 2] >= 0).astype(np.int64) << 2))
    lo, hi = np.asarray(smin), np.asarray(smax)
    q = np.clip((o - lo) / np.maximum(hi - lo, 1e-9) * 255, 0,
                255).astype(np.int64)

    def morton8(x, y, z):
        def part(v):
            v = (v | (v << 16)) & 0x0000FF0000FF
            v = (v | (v << 8)) & 0x00F00F00F00F
            v = (v | (v << 4)) & 0x0C30C30C30C3
            v = (v | (v << 2)) & 0x249249249249
            return v
        return part(x) | (part(y) << 1) | (part(z) << 2)

    mort = morton8(q[:, 0], q[:, 1], q[:, 2])
    key_co = (oc << 27) | (octant << 24) | (mort & 0xFFFFFF)
    key_oc = (octant << 60) | (oc << 24) | (mort & 0xFFFFFF)

    def timed(label, fn, reps=3):
        out = fn()
        jax.block_until_ready(out)
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(fn())
            best = min(best, time.perf_counter() - t0)
        print(f"  {label:30s} {best*1e3:8.1f} ms ({n/best/1e6:6.2f} Mr/s)",
              flush=True)
        return out

    print(f"brdf-class rays={n} clusters={clusters.num_clusters} "
          f"platform={jax.default_backend()}", flush=True)

    kw128 = dict(bundle_size=128, mb=16, group=8, k_cand=256)
    base = timed("cand0 sort (prod)",
                 lambda: ptm.closest_hit_bundle_pallas(
                     clusters, scene.tri_geometry, scene.tri_primitive,
                     o_j, d_j, 1e-3, tx, smin, smax,
                     presorted=False, **kw128))
    base_k128 = timed("cand0 sort k_cand=128",
                      lambda: ptm.closest_hit_bundle_pallas(
                          clusters, scene.tri_geometry, scene.tri_primitive,
                          o_j, d_j, 1e-3, tx, smin, smax, presorted=False,
                          bundle_size=128, mb=16, group=8, k_cand=128))

    # pre-permute on host, trace presorted, measure; then add the cost of
    # an on-device argsort + packed gather (the production form would pay
    # these, but NOT the 80 ms dense key pass)
    for label, key in [("origin-cluster|oct|morton", key_co),
                       ("oct|origin-cluster|morton", key_oc)]:
        perm = np.argsort(key, kind="stable")
        op = jnp.asarray(o[perm])
        dp = jnp.asarray(d[perm])
        txp = jnp.asarray(np.asarray(tx)[perm])
        r = timed(f"{label} (walk only)",
                  lambda op=op, dp=dp, txp=txp:
                  ptm.closest_hit_bundle_pallas(
                      clusters, scene.tri_geometry, scene.tri_primitive,
                      op, dp, 1e-3, txp, smin, smax,
                      presorted=True, **kw128))
        mism = int(np.sum(np.asarray(r.triangle_index)
                          != np.asarray(base.triangle_index)[perm]))
        print(f"    tri mismatches vs prod = {mism} ({mism/n*100:.4f}%)",
              flush=True)

    # cost of the sort machinery the production origin-key path would pay
    key_j = jnp.asarray(key_co)
    packed_in = jnp.concatenate(
        [o_j, d_j, tx[:, None], tx[:, None]], axis=1)
    timed("argsort+gather (overhead)",
          lambda: ptm._apply_permutation(
              jnp.argsort(key_j), [o_j, d_j], [tx, tx]))


if __name__ == "__main__":
    main()
