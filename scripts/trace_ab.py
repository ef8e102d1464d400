"""Hardware A/B harness for the Pallas walk kernel levers (mm, t_cap).

Times closest-hit and any-hit traversal on the ladder scene for both
coherence classes (Z-order primaries / incoherent rays) across the
{mm} x {t_cap} grid at the production by_sort kernel shapes
(render/app_bridge.py), and reports the debug_steps walk telemetry
(per-bundle steps, candidate counts) so wins decompose into
fewer-steps vs cheaper-steps.

Run from /root/repo with no PYTHONPATH (axon relay registers via
/root/.axon_site):

    timeout 580 python scripts/trace_ab.py [--cpu] [--quick]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--quick", action="store_true",
                    help="small scene + 256x256 rays (CPU-feasible)")
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
    clusters = build_clusters(*_host_tris(scene), cluster_size=128)
    smin = jnp.min(clusters.aabb_min, axis=0)
    smax = jnp.max(clusters.aabb_max, axis=0)
    g_view = cam.planar_view_constants()
    n = w * h

    # coherent batch: the production Z-order primary rays
    zidx, _ = raysmod.zorder_permutation(w, h)
    lin = np.arange(n)
    px_z = jnp.asarray((lin % w).astype(np.int32)[zidx])
    py_z = jnp.asarray((lin // w).astype(np.int32)[zidx])
    pri = raysmod.setup_primary_ray(px_z, py_z, g_view)

    # incoherent batch: random origins in the scene bbox, random dirs
    rng = np.random.default_rng(5)
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
                      group=8 if big else 4, k_cand=256, presorted=False),
    }
    batches = {
        "pri-z": (pri.origin, pri.direction, pri.t_min, pri.t_max),
        "incoh": (o_inc, d_inc, 1e-3, tmax_inc),
    }

    print(f"scene={scene_kind} tris={scene.tri_v0.shape[0]} "
          f"clusters={clusters.num_clusters} rays={n} "
          f"platform={jax.default_backend()}", flush=True)

    def timed(fn, *a, **kw):
        out = fn(*a, **kw)  # compile + warm
        jax.block_until_ready(out)
        best = np.inf
        for _ in range(args.reps):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*a, **kw))
            best = min(best, time.perf_counter() - t0)
        return best

    for cls, (o, d, tn, tx) in batches.items():
        kw = dict(shapes[cls])
        # if the MXU path wins, the VPU budget frees up — check whether
        # a wider group then pays (more clusters per step, fewer steps)
        g_wide = min(kw["group"] * 2, 1024 // 128)  # SLOT_BITS cap
        if g_wide > kw["group"]:
            wide = dict(kw, group=g_wide)
            dt_w = timed(
                ptm.closest_hit_bundle_pallas, clusters,
                scene.tri_geometry, scene.tri_primitive, o, d, tn, tx,
                smin, smax, mm=True, t_cap=True,
                interpret=args.interpret, **wide)
            print(f"{cls} mm=1 t_cap=1 group={g_wide}: closest "
                  f"{dt_w*1e3:8.1f} ms ({n/dt_w/1e6:6.2f} Mr/s)",
                  flush=True)
        for mm in (False, True):
            for t_cap in (False, True):
                dt_c = timed(
                    ptm.closest_hit_bundle_pallas, clusters,
                    scene.tri_geometry, scene.tri_primitive, o, d, tn, tx,
                    smin, smax, mm=mm, t_cap=t_cap,
                    interpret=args.interpret, **kw)
                dt_o = timed(
                    ptm.occluded_bundle_pallas, clusters, o, d, tn, tx,
                    smin, smax, mm=mm, t_cap=t_cap,
                    interpret=args.interpret, **kw)
                print(f"{cls} mm={int(mm)} t_cap={int(t_cap)}: "
                      f"closest {dt_c*1e3:8.1f} ms ({n/dt_c/1e6:6.2f} Mr/s)"
                      f"  anyhit {dt_o*1e3:8.1f} ms ({n/dt_o/1e6:6.2f} Mr/s)",
                      flush=True)
        # walk telemetry at the default config (mm off, t_cap A/B)
        for t_cap in (False, True):
            _, info = ptm.closest_hit_bundle_pallas(
                clusters, scene.tri_geometry, scene.tri_primitive,
                o, d, tn, tx, smin, smax, t_cap=t_cap, debug_steps=True,
                interpret=args.interpret, **kw)
            st = np.asarray(info["steps"])
            cc = np.asarray(info["cand_count"])
            live = cc > 0
            print(f"{cls} t_cap={int(t_cap)} telemetry: bundles={st.size} "
                  f"live={int(live.sum())} steps sum={int(st.sum())} "
                  f"mean={st[live].mean():.1f} p95={np.percentile(st[live], 95):.0f} "
                  f"cand mean={cc[live].mean():.1f} "
                  f"ovf={bool(info['overflowed'])}", flush=True)


if __name__ == "__main__":
    main()
