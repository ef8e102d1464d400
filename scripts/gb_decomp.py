"""G-buffer pass internal decomposition (VERDICT r3 #3).

pass_decomp r4 measured the G-buffer as the ONLY pass with meaningful
non-trace cost (152 ms of 223 at 1080p ladder; every other pass is
>= 97% trace). This probe times jitted prefixes of gbuffer_pass's
internal stages on the production layout:

  trace      rays + tracer only (tile-coherent, presorted)
  +fetch     + get_geometry_from_hit ([T, 80] row gather + interp)
  +shadepack + motion vectors + oct/r11g11b10/rgba8 packing + stack
  full       + tile unflatten + plane split (production gbuffer_pass)

Run from /root/repo:  timeout 1200 python scripts/gb_decomp.py [--quick]
"""

from __future__ import annotations

import argparse
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from raytracer2_tpu.models import procedural as proc
    from raytracer2_tpu.params import BACKGROUND_DEPTH, default_gconst
    from raytracer2_tpu.render import rays as raysmod
    from raytracer2_tpu.render.frame import create_renderer
    from raytracer2_tpu.render.gbuffer import gbuffer_pass
    from raytracer2_tpu.scene import gltf
    from raytracer2_tpu.scene.camera import default_camera
    from raytracer2_tpu.scene.scene import build_scene, get_geometry_from_hit
    from raytracer2_tpu.utils import packing as pk

    if args.quick:
        w, h = 512, 512
        glb = proc.corridor_glb(segments=12, pillars_per_side=8,
                                lat=12, lon=16)
        campos = (0, 4, 60)
    else:
        w, h = 1920, 1080
        glb = proc.corridor_glb(segments=24, pillars_per_side=12,
                                lat=34, lon=53)
        campos = (0, 4, 90)
    with tempfile.TemporaryDirectory() as tmp:
        p = Path(tmp) / "scene.glb"
        proc.write_glb(p, glb)
        scene = build_scene(gltf.load_file(p))
    renderer = create_renderer(scene, w, h)
    cam = default_camera(window_size=(w, h), position=campos,
                        direction=(0, 0, 1))
    g = default_gconst(cam.planar_view_constants(),
                       renderer.scene_lights.num_local_lights)

    tiles = raysmod.tile_shape(w, h)
    th, tw = tiles
    zidx = raysmod.tile_permutation(w, h, tw, th)
    lin = np.arange(w * h)
    px_z = jnp.asarray((lin % w).astype(np.int32)[zidx])
    py_z = jnp.asarray((lin // w).astype(np.int32)[zidx])

    def stage_trace(gc):
        rays_z = raysmod.setup_primary_ray(px_z, py_z, gc.view)
        hit = renderer.tracers.closest_hit(
            rays_z.origin, rays_z.direction, rays_z.t_min, rays_z.t_max,
            presorted=True)
        return hit.t, hit.triangle_index

    def stage_fetch(gc):
        rays_z = raysmod.setup_primary_ray(px_z, py_z, gc.view)
        hit = renderer.tracers.closest_hit(
            rays_z.origin, rays_z.direction, rays_z.t_min, rays_z.t_max,
            presorted=True)
        geom = get_geometry_from_hit(
            scene, hit.geometry_index.astype(jnp.int32),
            hit.primitive_id.astype(jnp.int32),
            jnp.stack([hit.u, hit.v], axis=-1),
            triangle_index=hit.triangle_index)
        return geom.normal, geom.diffuse_albedo, hit.t

    def stage_fetch_notex(gc):
        rays_z = raysmod.setup_primary_ray(px_z, py_z, gc.view)
        hit = renderer.tracers.closest_hit(
            rays_z.origin, rays_z.direction, rays_z.t_min, rays_z.t_max,
            presorted=True)
        geom = get_geometry_from_hit(
            scene, hit.geometry_index.astype(jnp.int32),
            hit.primitive_id.astype(jnp.int32),
            jnp.stack([hit.u, hit.v], axis=-1),
            textures_enabled=False,
            triangle_index=hit.triangle_index)
        return geom.normal, geom.diffuse_albedo, hit.t

    def stage_shadepack(gc):
        rays_z = raysmod.setup_primary_ray(px_z, py_z, gc.view)
        hit = renderer.tracers.closest_hit(
            rays_z.origin, rays_z.direction, rays_z.t_min, rays_z.t_max,
            presorted=True)
        geom = get_geometry_from_hit(
            scene, hit.geometry_index.astype(jnp.int32),
            hit.primitive_id.astype(jnp.int32),
            jnp.stack([hit.u, hit.v], axis=-1),
            triangle_index=hit.triangle_index)
        missed = hit.missed
        world_pos = rays_z.origin + rays_z.direction * hit.t[..., None]
        motion = raysmod.get_motion_vector(
            gc.view, gc.prev_view, world_pos, world_pos)
        oct_n = pk.ndir_to_oct_unorm32(geom.normal)
        albedo = pk.pack_r11g11b10_ufloat(geom.diffuse_albedo)
        spec_rough = pk.pack_rgba8_gamma_ufloat(
            jnp.concatenate([geom.specular_f0, geom.roughness[..., None]],
                            axis=-1))

        def ch(x, fill):
            return jnp.where(missed, fill, x)

        def bc(x):
            return jax.lax.bitcast_convert_type(x, jnp.int32)

        packed_z = jnp.stack(
            [bc(ch(hit.t, jnp.float32(BACKGROUND_DEPTH))),
             ch(oct_n, jnp.uint32(0)).astype(jnp.int32),
             ch(albedo, jnp.uint32(0)).astype(jnp.int32),
             ch(spec_rough, jnp.uint32(0)).astype(jnp.int32)], axis=1)
        em_mo_z = bc(jnp.where(missed[:, None], 0.0,
                               jnp.concatenate([geom.emission, motion],
                                               axis=1)))
        return packed_z, em_mo_z

    def stage_full(gc):
        return gbuffer_pass(scene, gc, renderer.tracers.closest_hit, w, h)

    def timed(label, fn):
        jf = jax.jit(fn)
        out = jf(g)
        jax.block_until_ready(out)
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            jax.block_until_ready(jf(g))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        print(f"  {label:12s} min {ts[0]*1e3:8.1f} / med "
              f"{ts[len(ts)//2]*1e3:8.1f} ms", flush=True)
        return ts[0]

    print(f"tris={scene.tri_v0.shape[0]} rays={w*h} "
          f"platform={jax.default_backend()}", flush=True)
    t_tr = timed("trace", stage_trace)
    t_fn = timed("+fetch_notex", stage_fetch_notex)
    t_fe = timed("+fetch", stage_fetch)
    print(f"  texture sampling alone: {1e3*(t_fe-t_fn):6.1f} ms "
          f"(attr gather+interp {1e3*(t_fn-t_tr):6.1f} ms)", flush=True)
    t_sp = timed("+shadepack", stage_shadepack)
    t_fu = timed("full", stage_full)
    print(f"  diffs: fetch {1e3*(t_fe-t_tr):6.1f} ms, shade+pack "
          f"{1e3*(t_sp-t_fe):6.1f} ms, unorder+split "
          f"{1e3*(t_fu-t_sp):6.1f} ms", flush=True)


if __name__ == "__main__":
    main()
