"""Concrete bridge construction: wire scene + traversal + G-buffers into
the RAB closure bundle the restir library consumes.

This is the renderer's implementation of the contract in restir/bridge.py,
mirroring lighting_passes/RtxdiApplicationBridge.glsl. Two traversal backends
are supported: the LBVH (default) and brute force (oracle/testing).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp

from raytracer2_tpu.lights.polymorphic import LightInfo, calc_sample
from raytracer2_tpu.ops.bvh import BVH, build_lbvh
from raytracer2_tpu.ops import traverse
from raytracer2_tpu.ops.intersect import (
    INVALID_INDEX, HitRecord, intersect_brute_force, occluded_brute_force)
from raytracer2_tpu.params import RTXDI_INVALID_LIGHT_INDEX, GConst
from raytracer2_tpu.render.gbuffer import GBuffer, surface_from_gbuffer
from raytracer2_tpu.render.surface import (
    Surface, are_materials_similar, evaluate_brdf, get_surface_brdf_pdf,
    get_surface_brdf_sample)
from raytracer2_tpu.restir.bridge import Bridge
from raytracer2_tpu.scene.scene import Scene
from raytracer2_tpu.utils import brdf as brdfm
from raytracer2_tpu.utils.packing import linear_to_zcurve


def _host_tris(scene: Scene):
    """Triangle soup for the HOST-side acceleration builders: prefer the
    numpy copies build_scene stashes (Scene.host_tri_*) — reading the
    device arrays back through this machine's TPU relay measured 100+ s."""
    if scene.host_tri_v0 is not None:
        return (scene.host_tri_v0, scene.host_tri_edge1,
                scene.host_tri_edge2)
    return scene.tri_v0, scene.tri_edge1, scene.tri_edge2


@dataclasses.dataclass(frozen=True)
class Tracers:
    """Closest-hit + any-hit query closures over a scene."""

    closest_hit: Callable  # (o, d, tmin, tmax) -> HitRecord
    occluded: Callable  # (o, d, tmin, tmax) -> blocked mask
    # (o, d, tmin, tmax) -> bool device scalar: True when the engine's
    # per-bundle candidate truncation overflowed for this batch — i.e.
    # some ray may have falsely missed (VERDICT r2 #4: surfaced, not
    # silent). None for engines with no truncation (brute, lbvh, bundle).
    overflow_probe: Callable | None = None
    # (o, d, tmin, tmax, presorted) -> i32 device scalar: the max
    # per-bundle candidate-union size this batch needs — the k_cand that
    # traverses it with zero truncation (VERDICT r4 #4 auto-sizing)
    union_max: Callable | None = None
    # the per-class k_cand the tracers were built with (for telemetry)
    k_cand_by_class: dict | None = None
    # True when candidate truncation is made EXACT by the bounded
    # per-bundle overflow fallback (overflowed bundles re-trace with
    # full-length lists), i.e. the overflow_probe flag means "fallback
    # engaged", not "possible silent misses"
    overflow_exact_fallback: bool = False


def make_tracers(scene: Scene, bvh: BVH | None = None,
                 use_bvh: bool = True, backend: str = "auto",
                 cluster_size: int | None = None,
                 sort_secondary: bool = True,
                 cull: str | None = None,
                 k_cand: int | None = None,
                 group: int | None = None,
                 bundle_size: int | None = None,
                 sort_key: str | None = None,
                 shadow_order: str = "pixz",
                 k_cand_per_class: dict | None = None,
                 ) -> Tracers:
    """Traversal backends:
    - "auto" (default): "bundle_pallas" on TPU, "bundle" elsewhere (the
      Pallas kernel only lowers on TPU hardware)
    - "bundle": frustum-bundle tracer (ops/traverse_bundle.py);
      fastest for coherent rays, degrades on incoherent batches
    - "scatter": per-ray exact culling + supercluster ray-binning
      (ops/traverse_scatter.py); coherence-independent throughput
    - "bundle_pallas": the bundle walk as a Pallas kernel with in-kernel
      DMA + true per-bundle early exit (ops/pallas_traverse.py), for both
      closest-hit and any-hit occlusion
    - "lbvh": per-ray stack traversal over the device LBVH
    - "brute": all-pairs oracle
    """
    if not use_bvh or scene.num_triangles < 2:
        backend = "brute"
    if backend == "auto":
        backend = ("bundle_pallas" if jax.default_backend() not in
                   ("cpu",) else "bundle")

    if backend == "bundle_pallas":
        from raytracer2_tpu.ops.cluster import build_clusters
        from raytracer2_tpu.ops import pallas_traverse as ptm

        # hardware sweep (round 2, 260k-tri ladder scene): cluster_size 128
        # beats 64 (the dense [rays, C] exact cull scales with C; 1.3 ->
        # 3.6 Mrays/s incoherent) and sidesteps a pathological native-SAH
        # build slowdown at size 64 on large scenes (215 s -> 2 s)
        clusters = build_clusters(
            *_host_tris(scene), cluster_size=cluster_size or 128)
        scene_min = jnp.min(clusters.aabb_min, axis=0)
        scene_max = jnp.max(clusters.aabb_max, axis=0)

        # round-3 bundle sweep (260k-tri ladder, cs=128): coherence sets
        # the best shape. Presorted screen-tile bundles want wide bundles
        # + narrow groups (b=256/mb=8/g=4: 12.7 Mr/s); incoherent rays
        # want b=128/mb=16/g=8 (5.8 vs 5.2 Mr/s) — and CRUCIALLY b=256's
        # unions overflow k_cand=256 on random rays (measured ovf=True,
        # silent misses) while b=128 fits. Small scenes (quick corridor,
        # C=145) keep the round-2 tuning.
        big = clusters.num_clusters >= 512
        by_sort = {  # presorted -> kernel shape
            # pixel-tile primaries: interval cull ([B, C] bundle slab,
            # full-length lists) replaces the dense per-ray [N, C] pass.
            # Walk-step telemetry is IDENTICAL to the exact cull on
            # Z-order tiles (401 vs 407 steps / 832 bundles, cand mean
            # 4.5 vs 4.6 — scripts/trace_decomp.py), so the dense pass
            # is pure savings here.
            True: dict(bundle_size=256 if big else 128, mb=8, group=4,
                       k_cand=256, cull="interval"),
            # lean=True: [P]-wide winner-step carry in the walk kernel
            # (one extra host decode gather). Wins on incoherent bundles
            # (deep walks amortize the decode: 387 -> 380 ms brdf class)
            # but LOSES on coherent tiles (148 -> 156 ms pri-z: few steps,
            # the decode gather dominates) — incoherent-only
            False: dict(bundle_size=128, mb=16 if big else 8,
                        group=8 if big else 4, k_cand=256, lean=True),
            # Z-presorted shadow batches (bridge visibility rays): tile
            # origins but scattered directions — keep the tight
            # incoherent bundle shape while skipping the runtime sort.
            # NOT interval: direction intervals spanning zero balloon
            # the bundle unions (measured 12x slower, trace_decomp
            # shadow-z class)
            "shadow": dict(bundle_size=128, mb=16 if big else 8,
                           group=8 if big else 4, k_cand=256),
        }
        # explicit knobs (app.py --cull/--k-cand/--group/...) win over the
        # scene-size heuristics
        for key, val in (("cull", cull), ("k_cand", k_cand),
                         ("bundle_size", bundle_size), ("group", group),
                         ("sort_key", sort_key)):
            if val is not None:
                for shapes in by_sort.values():
                    shapes[key] = val
        # per-class candidate budgets (auto-sizing, VERDICT r4 #4): keys
        # are by_sort's — True (pixel tiles), False (incoherent), "shadow"
        if k_cand_per_class:
            for cls, val in k_cand_per_class.items():
                if cls in by_sort and val is not None:
                    by_sort[cls]["k_cand"] = int(val)
        # visibility-batch ray ordering (walk-step telemetry, corridor
        # shadow class: pixz 1552 / octz 815 / cand0 495 steps — but
        # octz needs only a [N] u32 argsort and cand0 a dense [N, C]
        # key pass; the hardware A/B picks the default)
        if shadow_order == "octz":
            by_sort["shadow"]["sort_key"] = "octz"
        elif shadow_order == "cand0":
            by_sort["shadow"].pop("sort_key", None)
        shadow_presorted = shadow_order == "pixz"

        # prebuild the kernel's scene tables ONCE: re-deriving the
        # [C, 16, S_pad] Wald row layout and the [C*S_pad, 16] winner
        # meta inside every trace call measured ~53 + ~17 ms of pure
        # fixed cost at 260k tris — per CALL, and a frame makes 5+ calls
        wald_rows = jax.jit(ptm._wald_rows)(clusters)
        meta_rows = jax.jit(ptm._tri_meta)(
            clusters, scene.tri_geometry, scene.tri_primitive)

        def _sortcfg(presorted):
            # presorted="shadow" resolves to the configured shadow order:
            # pixz keeps the arrival order (skip the runtime sort);
            # octz/cand0 re-sort inside the tracer
            if presorted == "shadow" and not shadow_presorted:
                return False
            return bool(presorted)

        def closest(o, d, tmin, tmax, presorted=False):
            return ptm.closest_hit_bundle_pallas(
                clusters, scene.tri_geometry, scene.tri_primitive,
                o, d, tmin, tmax, scene_min, scene_max,
                presorted=_sortcfg(presorted), wald_rows=wald_rows,
                meta_rows=meta_rows, **by_sort[presorted])

        def occl(o, d, tmin, tmax, presorted=False):
            kw = {k: v for k, v in by_sort[presorted].items()
                  if k != "lean"}  # lean is a closest-hit-only lever
            return ptm.occluded_bundle_pallas(
                clusters, o, d, tmin, tmax, scene_min, scene_max,
                presorted=_sortcfg(presorted), wald_rows=wald_rows, **kw)

        def probe(o, d, tmin, tmax, presorted=False):
            _, flag = ptm.closest_hit_bundle_pallas(
                clusters, scene.tri_geometry, scene.tri_primitive,
                o, d, tmin, tmax, scene_min, scene_max,
                presorted=_sortcfg(presorted), with_overflow=True,
                wald_rows=wald_rows, meta_rows=meta_rows,
                **by_sort[presorted])
            return flag

        def occl_probe(o, d, tmin, tmax, presorted=False):
            kw = {k: v for k, v in by_sort[presorted].items()
                  if k != "lean"}
            _, flag = ptm.occluded_bundle_pallas(
                clusters, o, d, tmin, tmax, scene_min, scene_max,
                presorted=_sortcfg(presorted), with_overflow=True,
                wald_rows=wald_rows, **kw)
            return flag

        def umax(o, d, tmin, tmax, presorted=False):
            cfg = by_sort[presorted]
            return ptm.union_max_bundle(
                clusters, o, d, tmin, tmax, scene_min, scene_max,
                bundle_size=cfg["bundle_size"],
                cull=("interval" if cfg.get("cull") == "interval"
                      else "exact"),
                presorted=_sortcfg(presorted))

        return Tracers(closest_hit=closest, occluded=occl,
                       overflow_probe=probe, union_max=umax,
                       k_cand_by_class={cls: cfg["k_cand"]
                                        for cls, cfg in by_sort.items()},
                       overflow_exact_fallback=True)
    elif backend == "pairs":
        # round-4 pair-sweep engine (ops/pallas_pairs.py): exact and
        # tested, but a measured production NEGATIVE (16x slower than
        # the bundle walk at ladder scale — README) — reachable for A/Bs
        from raytracer2_tpu.ops.cluster import build_clusters
        from raytracer2_tpu.ops import pallas_pairs as ppm

        clusters = build_clusters(
            *_host_tris(scene), cluster_size=cluster_size or 128)
        ps = ppm.build_pair_scene(clusters, scene.tri_geometry,
                                  scene.tri_primitive,
                                  group=min(group or 16, 16))
        scene_min = jnp.min(clusters.aabb_min, axis=0)
        scene_max = jnp.max(clusters.aabb_max, axis=0)
        interp = jax.default_backend() == "cpu"

        def closest(o, d, tmin, tmax, presorted=False):
            return ppm.closest_hit_pairs(
                ps, clusters, scene.tri_geometry, scene.tri_primitive,
                o, d, tmin, tmax, scene_min, scene_max,
                k_cand=k_cand or 24, interpret=interp)

        def occl(o, d, tmin, tmax, presorted=False):
            return ppm.occluded_pairs(
                ps, clusters, o, d, tmin, tmax, scene_min, scene_max,
                k_cand=k_cand or 24, interpret=interp)
    elif backend == "scatter":
        from raytracer2_tpu.ops.cluster import build_clusters
        from raytracer2_tpu.ops import traverse_scatter as tsm

        clusters = build_clusters(
            *_host_tris(scene), cluster_size=min(cluster_size or 64, 16))
        sc = tsm.build_superclusters(clusters, group=16)

        def closest(o, d, tmin, tmax, presorted=False):
            return tsm.closest_hit_scatter(
                sc, scene.tri_geometry, scene.tri_primitive,
                o, d, tmin, tmax)

        def occl(o, d, tmin, tmax, presorted=False):
            return tsm.occluded_scatter(sc, o, d, tmin, tmax)
    elif backend == "bundle":
        from raytracer2_tpu.ops.cluster import build_clusters
        from raytracer2_tpu.ops import traverse_bundle as tbm

        clusters = build_clusters(
            *_host_tris(scene), cluster_size=cluster_size or 64)
        scene_min = jnp.min(clusters.aabb_min, axis=0)
        scene_max = jnp.max(clusters.aabb_max, axis=0)

        def closest(o, d, tmin, tmax, presorted=False):
            return tbm.closest_hit_bundle(
                clusters, scene.tri_geometry, scene.tri_primitive,
                o, d, tmin, tmax, scene_min, scene_max,
                sort_rays=sort_secondary)

        def occl(o, d, tmin, tmax, presorted=False):
            return tbm.occluded_bundle(
                clusters, o, d, tmin, tmax, scene_min, scene_max,
                sort_rays=sort_secondary)
    elif backend == "lbvh":
        if bvh is None:
            bvh = build_lbvh(*_host_tris(scene))
        from raytracer2_tpu.ops.bvh import max_depth
        from raytracer2_tpu.ops.traverse import STACK_SIZE

        depth = max_depth(bvh)
        assert depth <= STACK_SIZE, (
            f"LBVH depth {depth} exceeds the traversal stack "
            f"({STACK_SIZE}); overflow would silently drop subtrees "
            "(ADVICE r1) — deepen STACK_SIZE or rebalance the tree")

        def closest(o, d, tmin, tmax, presorted=False):
            return traverse.closest_hit(
                bvh, scene.tri_v0, scene.tri_edge1, scene.tri_edge2,
                scene.tri_geometry, scene.tri_primitive, o, d, tmin, tmax)

        def occl(o, d, tmin, tmax, presorted=False):
            return traverse.occluded(
                bvh, scene.tri_v0, scene.tri_edge1, scene.tri_edge2,
                o, d, tmin, tmax)
    else:
        def closest(o, d, tmin, tmax, presorted=False):
            return intersect_brute_force(
                o, d, scene.tri_v0, scene.tri_edge1, scene.tri_edge2,
                scene.tri_geometry, scene.tri_primitive, tmin, tmax)

        def occl(o, d, tmin, tmax, presorted=False):
            return occluded_brute_force(
                o, d, scene.tri_v0, scene.tri_edge1, scene.tri_edge2,
                tmin, tmax)

    return Tracers(closest_hit=closest, occluded=occl)


def get_light_sample_target_pdf(light_sample, surface: Surface) -> jax.Array:
    """RAB_GetLightSampleTargetPdfForSurface (bridge:478-500)."""
    live = light_sample.solid_angle_pdf > 0.0
    l = brdfm.normalize(light_sample.position - surface.world_pos)
    live &= brdfm.dot3(l, surface.geo_normal) > 0.0

    d = brdfm.lambert(surface.normal, -l)
    s = brdfm.ggx_times_ndotl(
        surface.view_dir, l, surface.normal,
        jnp.maximum(surface.roughness, brdfm.K_MIN_ROUGHNESS),
        surface.specular_f0)
    s = jnp.where((surface.roughness == 0.0)[..., None], 0.0, s)
    reflected = light_sample.radiance * (
        d[..., None] * surface.diffuse_albedo + s)
    pdf = brdfm.luminance(reflected) / jnp.maximum(
        light_sample.solid_angle_pdf, 1e-30)
    return jnp.where(live, pdf, 0.0)


def get_gi_sample_target_pdf(sample_position, sample_radiance,
                             surface: Surface) -> jax.Array:
    """RAB_GetGISampleTargetPdfForSurface (bridge:687-694)."""
    b = evaluate_brdf(surface, sample_position)
    reflected = sample_radiance * (
        b.demodulated_diffuse[..., None] * surface.diffuse_albedo + b.specular)
    return brdfm.luminance_rec709(reflected)


def make_bridge(
    scene: Scene,
    tracers: Tracers,
    gbuffer: GBuffer,
    prev_gbuffer: GBuffer,
    g_const: GConst,
    lights: LightInfo,
    geometry_to_light: jax.Array,  # [G] u32, sentinel INVALID
    local_pdf_mips: tuple[jax.Array, ...] | None,
    env_pdf_mips: tuple[jax.Array, ...] | None,
    neighbor_offsets: jax.Array,
    width: int,
    height: int,
    row_base=0,
) -> Bridge:
    """Assemble the full RAB closure bundle for one frame. row_base maps
    global pixel rows into (halo-padded) G-buffer row tiles (sharding)."""
    view = g_const.view
    prev_view = g_const.prev_view
    environment = g_const.environment

    def get_gbuffer_surface(px, py, previous_frame):
        if previous_frame:
            return surface_from_gbuffer(prev_gbuffer, prev_view, px, py,
                                        width, height, row_base=row_base)
        return surface_from_gbuffer(gbuffer, view, px, py, width, height,
                                    row_base=row_base)

    def get_conservative_visibility(surface: Surface, sample_position):
        from raytracer2_tpu.render.shading import setup_visibility_ray

        o, d, tmin, tmax = setup_visibility_ray(surface, sample_position)
        batch = tmin.shape
        if len(batch) == 2 and batch[0] * batch[1] >= 4096:
            # pixel-grid launch: shadow-ray origins are the (tile-coherent)
            # primary surfaces, so a static coherent reorder + the
            # tracer's presorted path skips the runtime cull sort (a
            # dense per-ray key pass + argsort + permutation gathers).
            # Tile order (8x16 screen tiles) is a pure reshape/transpose
            # both ways — the Z-curve fallback pays one packed [N, 8]
            # gather in and one [N] gather out.
            from raytracer2_tpu.render.rays import (
                tile_flatten, tile_shape, tile_unflatten,
                zorder_permutation)

            h, w = batch
            packed = jnp.concatenate(
                [o, d, tmin[..., None], tmax[..., None]], axis=-1)
            tiles = tile_shape(w, h)
            if tiles is not None:
                th, tw = tiles
                packed = tile_flatten(packed, tw, th)
            else:
                zidx, zinv = zorder_permutation(w, h)
                packed = packed.reshape(-1, 8)[jnp.asarray(zidx)]
            blocked_z = tracers.occluded(
                packed[:, 0:3], packed[:, 3:6], packed[:, 6], packed[:, 7],
                presorted="shadow")
            if tiles is not None:
                return ~tile_unflatten(blocked_z, h, w, tw, th)
            return ~blocked_z[jnp.asarray(zinv)].reshape(batch)
        blocked = tracers.occluded(o.reshape(-1, 3), d.reshape(-1, 3),
                                   tmin.reshape(-1), tmax.reshape(-1))
        return ~blocked.reshape(batch)

    def get_temporal_conservative_visibility(cur_surface, prev_surface,
                                             sample_position):
        # uses the previous surface + current AS (bridge:242-245)
        return get_conservative_visibility(prev_surface, sample_position)

    def sample_polymorphic_light(light_info, surface, uv):
        return calc_sample(light_info, uv, surface.world_pos,
                           skybox=scene.skybox if environment else None)

    def load_light_info(index, previous_frame):
        i = jnp.maximum(index.astype(jnp.int32), 0)
        return LightInfo(*(leaf[i] for leaf in lights))

    def trace_ray_for_local_light(origins, directions, t_min, t_max):
        """(bridge:639-669): closest-hit, then geometry -> light-table index."""
        batch = t_min.shape
        hit = tracers.closest_hit(
            origins.reshape(-1, 3), directions.reshape(-1, 3),
            jnp.broadcast_to(t_min, batch).reshape(-1),
            jnp.broadcast_to(t_max, batch).reshape(-1))
        hit = jax.tree_util.tree_map(lambda a: a.reshape(batch), hit)
        hit_anything = ~hit.missed
        geom = jnp.where(hit_anything, hit.geometry_index, 0).astype(jnp.int32)
        base = geometry_to_light[geom]
        # one-sided emitters: a hit on the BACK face of an emissive
        # triangle identifies no light. The solid-angle pdf cancels out of
        # the RIS estimator (radiance * invPdf / sapdf with invPdf ~
        # sapdf/brdfPdf), so without this test back-face hits contribute
        # FULL front radiance — measured +41% direct light on a Cornell
        # box whose lamp back is reachable. (The reference has the same
        # leak, latent because its scene hides every emitter's back.)
        tri = jnp.maximum(hit.triangle_index, 0)
        tri_n = jnp.cross(scene.tri_edge1[tri], scene.tri_edge2[tri])
        front = brdfm.dot3(directions.reshape(batch + (3,)), tri_n) < 0.0
        light_index = jnp.where(
            (base != jnp.uint32(RTXDI_INVALID_LIGHT_INDEX)) & hit_anything
            & front,
            base + hit.primitive_id, jnp.uint32(RTXDI_INVALID_LIGHT_INDEX))
        bary = brdfm.hit_uv_to_barycentric(
            jnp.stack([hit.u, hit.v], axis=-1))
        rand_xy = jnp.where(
            (light_index != jnp.uint32(RTXDI_INVALID_LIGHT_INDEX))[..., None],
            brdfm.random_from_barycentric(bary), 0.0)
        return hit_anything, light_index, rand_xy

    def evaluate_local_light_source_pdf(light_index):
        """(bridge:420-434) — with a bias fix the reference lacks: the
        reference always returns the POWER pdf from the pdf texture even
        though its app samples local lights UNIFORMLY (presampling compiled
        out), so the BRDF candidate stream MIS-weights against a different
        selection pdf than the light stream uses — inconsistent balance
        denominators = biased MIS (measured +6% on Cornell with local
        candidates enabled; dormant at reference defaults because
        numPrimaryLocalLightSamples=0 makes localLightMisWeight 0). We
        return the pdf of the ACTIVE local sampling mode: uniform for
        mode 0, the power texture for modes 1/2."""
        mode = (g_const.restir_di.initial_sampling_params
                .local_light_sampling_mode)
        region = g_const.light_buffer_params.local_light_buffer_region
        if mode == 0 or local_pdf_mips is None:
            return jnp.full(light_index.shape,
                            1.0 / max(region.num_lights, 1), jnp.float32)
        from raytracer2_tpu.lights.pdf_texture import evaluate_pdf_texture

        x, y = linear_to_zcurve(light_index)
        return evaluate_pdf_texture(local_pdf_mips, x.astype(jnp.int32),
                                    y.astype(jnp.int32))

    def evaluate_environment_map_sampling_pdf(direction):
        """(bridge:397-418)."""
        if (env_pdf_mips is None or
                g_const.restir_di.initial_sampling_params
                .environment_map_importance_sampling == 0):
            return jnp.ones(direction.shape[:-1], jnp.float32)
        from raytracer2_tpu.lights.pdf_texture import evaluate_pdf_texture

        uv = brdfm.direction_to_equirect_uv(direction)
        h, w = env_pdf_mips[0].shape
        x = (uv[..., 0] * w).astype(jnp.int32)
        y = (uv[..., 1] * h).astype(jnp.int32)
        return evaluate_pdf_texture(env_pdf_mips, x, y)

    return Bridge(
        get_gbuffer_surface=get_gbuffer_surface,
        get_light_sample_target_pdf=get_light_sample_target_pdf,
        get_gi_sample_target_pdf=get_gi_sample_target_pdf,
        get_conservative_visibility=get_conservative_visibility,
        get_temporal_conservative_visibility=get_temporal_conservative_visibility,
        are_materials_similar=are_materials_similar,
        sample_polymorphic_light=sample_polymorphic_light,
        load_light_info=load_light_info,
        get_surface_brdf_sample=get_surface_brdf_sample,
        get_surface_brdf_pdf=get_surface_brdf_pdf,
        trace_ray_for_local_light=trace_ray_for_local_light,
        evaluate_local_light_source_pdf=evaluate_local_light_source_pdf,
        evaluate_environment_map_sampling_pdf=evaluate_environment_map_sampling_pdf,
        neighbor_offsets=neighbor_offsets,
        viewport=(width, height),
    )


def suggest_k_cand(renderer, view=None, margin: float = 1.25,
                   quantum: int = 64, k_floor: int = 96,
                   n_incoherent: int = 65536,
                   timeout: float = 60.0) -> dict | None:
    """Auto-size the per-class candidate budgets (VERDICT r4 #4): probe
    the max per-bundle candidate union for (a) this camera's primary
    tiles (interval cull, presorted Z/tile order — the class the bench
    overflow probe measures) and (b) a deterministic synthetic incoherent
    batch (in-AABB origins, random directions — the worst-case proxy for
    BRDF/shadow batches), then return the by_sort-keyed k_cand dict a
    zero-truncation traversal needs, or None when the current budgets
    already match (or the probe/readback is unavailable). The bounded
    overflow fallback stays on as the safety net for frame-to-frame
    variation beyond the probe's margin.

    Callers rebuild with:
        tracers = make_tracers(scene, backend=..., k_cand_per_class=sug)
        renderer = renderer._replace(tracers=tracers)
    """
    import numpy as np

    from raytracer2_tpu.render import rays as raysmod
    from raytracer2_tpu.utils.readback import guarded_scalar

    tr = renderer.tracers
    if tr.union_max is None or tr.k_cand_by_class is None:
        return None
    scene = renderer.scene
    if scene.host_tri_v0 is None or scene.num_triangles < 2:
        return None
    lo = scene.host_tri_v0.min(axis=0)
    hi = scene.host_tri_v0.max(axis=0)

    rng = np.random.default_rng(0)
    o_inc = jnp.asarray(rng.uniform(lo, hi, (n_incoherent, 3))
                        .astype(np.float32))
    v = rng.normal(size=(n_incoherent, 3)).astype(np.float32)
    d_inc = jnp.asarray(v / np.linalg.norm(v, axis=1, keepdims=True))
    tn = jnp.full((n_incoherent,), 1e-3, jnp.float32)
    tx = jnp.full((n_incoherent,), 1e5, jnp.float32)
    maxes = [tr.union_max(o_inc, d_inc, tn, tx, presorted=False)]

    if view is not None:
        w, h = renderer.width, renderer.height
        px, py = raysmod.pixel_grid(w, h)
        pr = raysmod.setup_primary_ray(px.reshape(-1), py.reshape(-1),
                                       view)
        tiles = raysmod.tile_shape(w, h)
        if tiles is not None:
            zidx = raysmod.tile_permutation(w, h, tiles[1], tiles[0])
        else:
            zidx, _ = raysmod.zorder_permutation(w, h)
        maxes.append(tr.union_max(
            pr.origin[zidx], pr.direction[zidx], pr.t_min, pr.t_max,
            presorted=True))

    host = guarded_scalar(jnp.stack(maxes), timeout=timeout)
    if host is None:
        return None

    def size(mx):
        need = max(int(np.ceil(mx * margin / quantum)) * quantum, k_floor)
        return need

    k_inc = size(int(host[0]))
    sug = {False: k_inc, "shadow": k_inc}
    if view is not None:
        sug[True] = size(int(host[1]))
    cur = tr.k_cand_by_class
    if all(sug[c] == cur.get(c) for c in sug):
        return None
    return sug
