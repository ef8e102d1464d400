"""Per-pass trace vs non-trace decomposition at the 1080p ladder config.

bench.py --per-pass gives cumulative-prefix pass times; this splits each
hot pass into its RAY-TRACING cost (timed by swapping the production
tracer for a zero-cost stub that returns fixed hit records) vs everything
else (material fetch, packing, resampling math, reservoir updates).
non-trace = stubbed-pass time; trace = full-pass time - stubbed time.

Run from /root/repo with no PYTHONPATH:

    timeout 580 python scripts/pass_decomp.py [--cpu] [--quick]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import tempfile
    from pathlib import Path

    import jax
    import numpy as np

    from raytracer2_tpu.models import procedural as proc
    from raytracer2_tpu.params import default_gconst
    from raytracer2_tpu.render.frame import (
        FRAME_PASSES, create_renderer, init_frame_state, render_frame)
    from raytracer2_tpu.scene import gltf
    from raytracer2_tpu.scene.camera import default_camera
    from raytracer2_tpu.scene.scene import build_scene

    if args.quick:
        w, h = 256, 256
        glb = proc.corridor_glb(segments=12, pillars_per_side=8,
                                lat=12, lon=16)
        cam = default_camera(window_size=(w, h),
                             position=(0, 4, 60), direction=(0, 0, 1))
    else:
        w, h = 1920, 1080
        glb = proc.corridor_glb(segments=24, pillars_per_side=12,
                                lat=34, lon=53)
        cam = default_camera(window_size=(w, h),
                             position=(0, 4, 90), direction=(0, 0, 1))
    with tempfile.TemporaryDirectory() as tmp:
        p = Path(tmp) / "scene.glb"
        proc.write_glb(p, glb)
        scene = build_scene(gltf.load_file(p))

    renderer = create_renderer(scene, w, h)
    g = default_gconst(cam.planar_view_constants(),
                       renderer.scene_lights.num_local_lights)
    g = g.replace(enable_restir_di=1)
    state = init_frame_state(w, h)

    print(f"tris={scene.num_triangles} rays/batch={w*h} "
          f"platform={jax.default_backend()}", flush=True)

    def timed(fn, *a):
        out = fn(*a)
        jax.block_until_ready(out)
        best = np.inf
        for _ in range(args.reps):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*a))
            best = min(best, time.perf_counter() - t0)
        return best * 1e3

    # stub tracers: fixed-t hits on triangle 0 / never-blocked visibility —
    # zero traversal work, same output structure, so a stubbed frame times
    # everything EXCEPT traversal
    import jax.numpy as jnp

    from raytracer2_tpu.ops.intersect import HitRecord
    from raytracer2_tpu.render.app_bridge import Tracers

    def stub_closest(o, d, tn, tx, presorted=False):
        n = o.shape[0]
        geom0 = scene.tri_geometry[0].astype(jnp.uint32)
        return HitRecord(
            t=jnp.full((n,), 5.0, jnp.float32),
            u=jnp.full((n,), 0.3, jnp.float32),
            v=jnp.full((n,), 0.3, jnp.float32),
            geometry_index=jnp.full((n,), geom0, jnp.uint32),
            primitive_id=jnp.zeros((n,), jnp.uint32),
            triangle_index=jnp.zeros((n,), jnp.int32))

    def stub_occluded(o, d, tn, tx, presorted=False):
        return jnp.zeros((o.shape[0],), jnp.bool_)

    stub_tracers = Tracers(closest_hit=stub_closest,
                           occluded=stub_occluded)

    real = renderer
    stub = renderer._replace(tracers=stub_tracers)

    def frame_at(r, stop):
        def f(st):
            return render_frame(r, g, st, stop_after=stop)
        return jax.jit(f)

    # the stencil passes (gi_temporal/gi_spatial) measured < 30 ms each
    # (bench --per-pass); skip their 4 extra full-frame compiles and jump
    # from shade_secondary to gi_final (the diff then includes them)
    passes = [p for p in FRAME_PASSES
              if p not in ("gi_temporal", "gi_spatial", "post")]

    prev_real = prev_stub = 0.0
    print(f"  {'pass':16s} {'full':>9s} {'stub':>9s} "
          f"{'trace':>9s} {'non-trace':>9s}", flush=True)
    for ps in passes:
        dt_real = timed(frame_at(real, ps), state)
        dt_stub = timed(frame_at(stub, ps), state)
        inc_r = dt_real - prev_real
        inc_s = dt_stub - prev_stub
        print(f"  {ps:16s} {inc_r:8.1f}  {inc_s:8.1f}  "
              f"{inc_r - inc_s:8.1f}  {inc_s:8.1f}   (cum "
              f"{dt_real:7.1f} / {dt_stub:7.1f})", flush=True)
        prev_real, prev_stub = dt_real, dt_stub


if __name__ == "__main__":
    main()
