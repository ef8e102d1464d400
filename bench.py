"""Benchmark driver: prints ONE JSON line with the headline metric.

Measures ray throughput (Mrays/s/chip) of the jitted reference path tracer
over the LBVH on a Sponza-class procedural corridor scene — the
BASELINE.md north-star metric (>= 200 Mrays/s/chip at 1080p / 8 spp).
Every launch is width*height closest-hit rays; reference mode traces
spp * bounces launches per frame.

Usage:
    python bench.py            # full benchmark on the available backend
    python bench.py --smoke    # tiny/fast correctness smoke (CPU-friendly)
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

BASELINE_MRAYS = 200.0  # north-star target (BASELINE.md)


def run(width: int, height: int, spp: int, bounces: int, frames: int,
        scene_kind: str, backend: str = "auto") -> dict:
    import jax
    import jax.numpy as jnp

    from raytracer2_tpu.models import procedural as proc
    from raytracer2_tpu.params import default_gconst
    from raytracer2_tpu.render.frame import create_renderer
    from raytracer2_tpu.render.reference import render_reference
    from raytracer2_tpu.scene import gltf
    from raytracer2_tpu.scene.camera import default_camera
    from raytracer2_tpu.scene.scene import build_scene

    with tempfile.TemporaryDirectory() as d:
        p = Path(d) / "scene.glb"
        if scene_kind == "corridor":
            proc.write_glb(p, proc.corridor_glb(
                segments=12, pillars_per_side=8, lat=12, lon=16))
            cam = default_camera(window_size=(width, height),
                                 position=(0, 4, 60), direction=(0, 0, 1))
        else:
            proc.write_glb(p, proc.cornell_box_glb(light_emission=2.0))
            cam = default_camera(window_size=(width, height),
                                 position=(0, 0, -12), direction=(0, 0, -1))
        scene = build_scene(gltf.load_file(p))

    renderer = create_renderer(scene, width, height, use_bvh=True,
                               backend=backend)
    g_const = default_gconst(
        cam.planar_view_constants(),
        renderer.scene_lights.num_local_lights, refrence_mode=1)

    fn = jax.jit(lambda g: render_reference(
        scene, g, width, height, max_bounces=bounces, max_samples=spp,
        trace_fn=renderer.tracers.closest_hit))

    # compile + warmup
    img = fn(g_const)
    jax.block_until_ready(img)

    t0 = time.perf_counter()
    for i in range(frames):
        img = fn(g_const.replace(frame=jnp.uint32(i + 1)))
    jax.block_until_ready(img)
    elapsed = time.perf_counter() - t0

    rays = width * height * spp * bounces * frames
    mrays = rays / elapsed / 1e6
    return {
        "metric": "reference_path_tracer_mrays_per_sec_per_chip",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / BASELINE_MRAYS, 4),
        "detail": {
            "scene": scene_kind,
            "triangles": scene.num_triangles,
            "resolution": f"{width}x{height}",
            "spp": spp,
            "bounces": bounces,
            "frames": frames,
            "seconds": round(elapsed, 3),
            "platform": jax.devices()[0].platform,
            "backend": backend,
        },
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--smoke", action="store_true",
                        help="tiny fast run (CPU-friendly)")
    parser.add_argument("--width", type=int, default=None)
    parser.add_argument("--height", type=int, default=None)
    parser.add_argument("--spp", type=int, default=None)
    parser.add_argument("--bounces", type=int, default=None)
    parser.add_argument("--frames", type=int, default=None)
    parser.add_argument("--scene", default=None,
                        choices=["corridor", "cornell"])
    parser.add_argument("--backend", default="auto",
                        choices=["auto", "bundle", "bundle_pallas",
                                 "scatter", "lbvh", "brute"])
    args = parser.parse_args()

    if args.smoke:
        cfg = dict(width=64, height=64, spp=1, bounces=2, frames=2,
                   scene_kind="cornell")
    else:
        cfg = dict(width=256, height=256, spp=2, bounces=3, frames=8,
                   scene_kind="corridor")
    if args.width:
        cfg["width"] = args.width
    if args.height:
        cfg["height"] = args.height
    if args.spp:
        cfg["spp"] = args.spp
    if args.bounces:
        cfg["bounces"] = args.bounces
    if args.frames:
        cfg["frames"] = args.frames
    if args.scene:
        cfg["scene_kind"] = args.scene
    cfg["backend"] = args.backend

    # the TPU relay on this box occasionally drops the first client after
    # another process exits; retry the whole run once on runtime errors
    try:
        result = run(**cfg)
    except Exception as e:  # noqa: BLE001 - emit a diagnostic line, retry
        print(f"bench attempt 1 failed ({type(e).__name__}); retrying",
              file=sys.stderr)
        time.sleep(30)
        result = run(**cfg)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
