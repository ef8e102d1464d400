"""Fine-grained decomposition of the exact-cull prep for one ray class.

trace_decomp.py showed prep ~85% of an incoherent trace; this splits the
prep itself on hardware:

  key      _cand0_sort_key          (dense [N, C] pass #1, reduced to a key)
  argsort  jnp.argsort(key)
  gather   _apply_permutation       (4 permutation gathers)
  dense    _entry_exact chunked     (dense [N, C] pass #2, entry values)
  union    + reshape-min to [B, C]
  topk     + top_k(k_cand)          (per-bundle ranking)

Run from /root/repo with no PYTHONPATH:

    timeout 580 python scripts/prep_decomp.py [--cpu] [--cls brdf]
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
    ap.add_argument("--cls", default="brdf", choices=["brdf", "pri-z"])
    ap.add_argument("--reps", type=int, default=3)
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

    if args.cls == "brdf":
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
        o = jnp.asarray(o)
        d = jnp.asarray(d)
        tn = jnp.full((n,), 1e-3, jnp.float32)
        tx = jnp.asarray(np.where(~missed, 1e5, -1.0).astype(np.float32))
        bundle_size, k_cand = 128, 256
    else:
        o, d, tn, tx = (pri.origin, pri.direction,
                        jnp.broadcast_to(pri.t_min, (n,)),
                        jnp.broadcast_to(pri.t_max, (n,)))
        bundle_size, k_cand = 256, 256

    print(f"cls={args.cls} rays={n} clusters={clusters.num_clusters} "
          f"platform={jax.default_backend()}", flush=True)

    def timed(label, fn, *a):
        f = jax.jit(fn)
        out = f(*a)
        jax.block_until_ready(out)
        best = np.inf
        for _ in range(args.reps):
            t0 = time.perf_counter()
            jax.block_until_ready(f(*a))
            best = min(best, time.perf_counter() - t0)
        print(f"  {label:10s} {best*1e3:8.1f} ms", flush=True)
        return out

    amin, amax = clusters.aabb_min, clusters.aabb_max
    key = timed("key", lambda oo, dd: ptm._cand0_sort_key(
        oo, dd, tn, tx, amin, amax, smin, smax), o, d)
    perm = timed("argsort", jnp.argsort, key)
    os_, ds_, tns, txs = timed(
        "gather", lambda pp: ptm._apply_permutation(
            pp, [o, d], [tn, tx]), perm)

    p_ = bundle_size
    c = clusters.num_clusters
    cb = max(1, ptm.CULL_CHUNK_BYTES // (4 * c * p_))
    n_bundles = (n + p_ - 1) // p_
    cb = min(cb, n_bundles)
    op, dp, tnp_, txp = ptm._pad_rays(os_, ds_, tns, txs, cb * p_)
    nn = op.shape[0]
    nb = (nn // p_) // cb

    def dense_only(oo, dd, tnn, txx):
        def one(a):
            e = ptm._entry_exact(a[0], a[1], a[2], a[3], amin, amax)
            # cheap full reduce so the dense pass can't be DCE'd
            return jnp.sum(jnp.isfinite(e), axis=-1)
        return jax.lax.map(one, (oo.reshape(nb, cb * p_, 3),
                                 dd.reshape(nb, cb * p_, 3),
                                 tnn.reshape(nb, cb * p_),
                                 txx.reshape(nb, cb * p_)))

    def dense_union(oo, dd, tnn, txx):
        def one(a):
            e = ptm._entry_exact(a[0], a[1], a[2], a[3], amin, amax)
            return jnp.min(e.reshape(cb, p_, c), axis=1)
        return jax.lax.map(one, (oo.reshape(nb, cb * p_, 3),
                                 dd.reshape(nb, cb * p_, 3),
                                 tnn.reshape(nb, cb * p_),
                                 txx.reshape(nb, cb * p_)))

    def union_topk(oo, dd, tnn, txx):
        def one(a):
            e = ptm._entry_exact(a[0], a[1], a[2], a[3], amin, amax)
            ue = jnp.min(e.reshape(cb, p_, c), axis=1)
            neg_t, idx = jax.lax.top_k(-ue, min(k_cand, c))
            return -neg_t, idx.astype(jnp.int32)
        return jax.lax.map(one, (oo.reshape(nb, cb * p_, 3),
                                 dd.reshape(nb, cb * p_, 3),
                                 tnn.reshape(nb, cb * p_),
                                 txx.reshape(nb, cb * p_)))

    timed("dense", dense_only, op, dp, tnp_, txp)
    timed("union", dense_union, op, dp, tnp_, txp)
    timed("topk", union_topk, op, dp, tnp_, txp)

    full_prep = jax.jit(
        partial(ptm._prep, cull="auto", m_super=32, k_sc=12),
        static_argnames=("bundle_size", "presorted", "k_cand", "t_cap"))
    out = full_prep(clusters, o, d, tn, tx, smin, smax,
                    bundle_size=bundle_size, presorted=False,
                    k_cand=k_cand, t_cap=False)
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(args.reps):
        t0 = time.perf_counter()
        jax.block_until_ready(full_prep(
            clusters, o, d, tn, tx, smin, smax,
            bundle_size=bundle_size, presorted=False,
            k_cand=k_cand, t_cap=False))
        best = min(best, time.perf_counter() - t0)
    print(f"  {'FULL prep':10s} {best*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
