"""Measure the two-phase walk's potential on the ladder BRDF class.

Idea: walk only the k1 nearest union candidates per bundle (phase 1),
then re-trace ONLY the rays that are not provably done — a ray is done
when its phase-1 best t is strictly below the entry distance of the
first TRUNCATED candidate (every unwalked cluster lies farther than the
committed hit, so it cannot contain a closer one). Incoherent bundles
pay for the ~240-cluster union while each ray only overlaps ~20; if
most rays finish within the first k1 union entries, phase 1 costs
k1/240 of the walk and phase 2 is a small compacted batch.

This probe measures, per k1: survivor fraction, phase-1 walk time vs
the full walk, and verifies the doneness criterion (non-survivors'
t bit-equals the full trace).

Run from /root/repo:   timeout 900 python scripts/twophase_probe.py [--quick]
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
    tn_b = jnp.full((n,), 1e-3, jnp.float32)

    big = clusters.num_clusters >= 512
    kw = dict(bundle_size=128, mb=16 if big else 8,
              group=8 if big else 4, lean=True)
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

    def trace(**kws):
        return timed(ptm.closest_hit_bundle_pallas, clusters,
                     scene.tri_geometry, scene.tri_primitive,
                     o_b, d_b, tn_b, tx_b, smin, smax,
                     wald_rows=wald, meta_rows=meta,
                     overflow_fallback=False, **kw, **kws)

    # full-union prep: ranked entries + perm for the doneness thresholds
    @jax.jit
    def full_prep():
        (perm, _, _, _, _, _, _, cand_t, _, _, b, kp, _, _) = ptm._prep(
            clusters, o_b, d_b, tn_b, tx_b, smin, smax,
            kw["bundle_size"], False, "exact", 512, 32, 12,
            cull_kernel=True)
        return perm, cand_t.reshape(b, kp)

    perm, cand_t_full = full_prep()
    perm = np.asarray(perm)
    cand_t_full = np.asarray(cand_t_full)

    dt_full, ref = trace(k_cand=256)
    t_ref = np.asarray(ref.t)
    print(f"  full (k=256)      {dt_full:8.1f} ms", flush=True)

    p = kw["bundle_size"]
    for k1 in (16, 32, 64, 128):
        dt1, out = trace(k_cand=k1)
        t_1 = np.asarray(out.t)
        thr_b = cand_t_full[:, k1]  # entry of first truncated candidate
        # sorted row -> original ray id (perm): thr per original ray
        rows = np.arange(len(perm))
        thr_ray = np.full((n,), np.inf, np.float32)
        thr_ray[perm[rows]] = thr_b[rows // p]
        surv = t_1 >= thr_ray
        done = ~surv
        exact = np.array_equal(t_1[done], t_ref[done])
        frac = surv.mean()
        print(f"  k1={k1:3d}: {dt1:8.1f} ms, survivors {100*frac:5.2f}% "
              f"({surv.sum()}), done-rays exact={exact}", flush=True)


if __name__ == "__main__":
    main()
