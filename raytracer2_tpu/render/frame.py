"""The frame graph: one jittable function from (frame state, GConst) to
(new frame state, display image).

TPU-native replacement for the reference's pass orchestration
(light_passes.rs:550-663 + the main-loop scheduling main.rs:644-721):
XLA's dataflow replaces every manual barrier; double-buffered G-buffers and
reservoir ping-pong (main.rs:649-651, light_passes.rs:517-537) become a
functional swap of pytrees inside FrameState.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from raytracer2_tpu.lights.prepare import SceneLights, prepare_lights
from raytracer2_tpu.params import GConst
from raytracer2_tpu.render.app_bridge import Tracers, make_bridge, make_tracers
from raytracer2_tpu.render.di_passes import di_fused_resampling_pass
from raytracer2_tpu.render.gbuffer import GBuffer, empty_gbuffer, gbuffer_pass
from raytracer2_tpu.render.gi_passes import (
    SecondaryGBuffer, brdf_rays_pass, empty_secondary_gbuffer,
    gi_final_shading_pass, gi_spatial_pass, gi_temporal_pass,
    shade_secondary_surfaces_pass)
from raytracer2_tpu.render.postprocess import PostProcessInputs, post_process
from raytracer2_tpu.render.reference import render_reference
from raytracer2_tpu.restir.gi_reservoir import GIReservoir, empty_gi_reservoir
from raytracer2_tpu.restir.di_reservoir import DIReservoir, empty_di_reservoir
from raytracer2_tpu.restir.initial_sampling import LightSamplingContext
from raytracer2_tpu.lights.pdf_texture import fill_neighbor_offsets
from raytracer2_tpu.scene.scene import Scene
from raytracer2_tpu.utils import packing as pk


class FrameState(NamedTuple):
    """Persistent cross-frame GPU state (render_resources.rs:130-342
    equivalent, as one pytree). Ping-pong = leaf swap."""

    gbuffer: GBuffer  # current (becomes prev next frame)
    prev_gbuffer: GBuffer
    motion: jax.Array  # [H, W, 3]
    diffuse_lighting: jax.Array  # [H, W, 3]
    specular_lighting: jax.Array  # [H, W, 3]
    gi_reservoirs: tuple[GIReservoir, GIReservoir]  # 2 slots [H, W]
    di_reservoirs: tuple[DIReservoir, DIReservoir]
    secondary: SecondaryGBuffer


def init_frame_state(width: int, height: int) -> FrameState:
    return FrameState(
        gbuffer=empty_gbuffer(height, width),
        prev_gbuffer=empty_gbuffer(height, width),
        motion=jnp.zeros((height, width, 3), jnp.float32),
        diffuse_lighting=jnp.zeros((height, width, 3), jnp.float32),
        specular_lighting=jnp.zeros((height, width, 3), jnp.float32),
        gi_reservoirs=(empty_gi_reservoir((height, width)),
                       empty_gi_reservoir((height, width))),
        di_reservoirs=(empty_di_reservoir((height, width)),
                       empty_di_reservoir((height, width))),
        secondary=empty_secondary_gbuffer(height, width),
    )


class Renderer(NamedTuple):
    """Per-scene immutable resources: scene arrays, traversal closures,
    light table, neighbor offsets. Built once at load (the reference's
    frame-1 prepare/presample/mip block, main.rs:663-697)."""

    scene: Scene
    tracers: Tracers
    scene_lights: SceneLights
    neighbor_offsets: jax.Array
    width: int
    height: int

    def light_ctx(self, g_const: GConst,
                  ris_buffer=None) -> LightSamplingContext:
        return LightSamplingContext(
            lights=self.scene_lights.lights,
            light_buffer_params=g_const.light_buffer_params,
            local_light_sampling_mode=(
                g_const.restir_di.initial_sampling_params
                .local_light_sampling_mode),
            enable_presampling=ris_buffer is not None,
            ris_buffer=ris_buffer,
            local_ris_params=g_const.local_lights_risbuffer_segment_params,
            env_ris_params=g_const.environment_light_risbuffer_segment_params,
        )


def create_renderer(scene: Scene, width: int, height: int,
                    use_bvh: bool = True,
                    backend: str = "auto") -> Renderer:
    return Renderer(
        scene=scene,
        tracers=make_tracers(scene, use_bvh=use_bvh, backend=backend),
        scene_lights=prepare_lights(scene),
        neighbor_offsets=fill_neighbor_offsets(),
        width=width,
        height=height,
    )


def render_frame(renderer: Renderer, g_const: GConst,
                 state: FrameState) -> tuple[FrameState, jax.Array]:
    """Execute one frame (light_passes.rs:550-663 + post-process +
    frame-state rotation). Returns (new state, display image [H, W, 3])."""
    scene = renderer.scene
    width, height = renderer.width, renderer.height
    gi_idx = g_const.restir_gi.buffer_indices

    # previous frame's G-buffer is the one rendered last frame
    prev_gbuffer = state.gbuffer

    if g_const.refrence_mode:
        radiance = render_reference(
            scene, g_const, width, height,
            trace_fn=renderer.tracers.closest_hit)
        from raytracer2_tpu.render.shading import store_shading_output

        diffuse, spec_out = store_shading_output(
            state.diffuse_lighting, state.specular_lighting,
            radiance, jnp.zeros_like(radiance), is_first_pass=True,
            enable_accumulation=g_const.enable_accumulation,
            blend_factor=g_const.blend_factor)
        new_state = state._replace(
            prev_gbuffer=prev_gbuffer,
            diffuse_lighting=diffuse,
            specular_lighting=spec_out)
        inputs = PostProcessInputs(
            depth=jnp.zeros((height, width), jnp.float32),
            diffuse_albedo=jnp.zeros((height, width, 3), jnp.float32),
            specular_f0=jnp.zeros((height, width, 3), jnp.float32),
            emissive=jnp.zeros((height, width, 3), jnp.float32),
            diffuse=diffuse,
            specular=new_state.specular_lighting)
        output, _ = post_process(scene, g_const, inputs)
        return new_state, output

    # 1. G-buffer pass (light_passes.rs:598-606)
    gbuffer, motion = gbuffer_pass(
        scene, g_const, renderer.tracers.closest_hit, width, height)

    bridge = make_bridge(
        scene, renderer.tracers, gbuffer, prev_gbuffer, g_const,
        renderer.scene_lights.lights,
        renderer.scene_lights.geometry_to_light,
        renderer.scene_lights.local_pdf_mips,
        renderer.scene_lights.env_pdf_mips,
        renderer.neighbor_offsets, width, height)
    light_ctx = renderer.light_ctx(g_const)

    # lighting images persist across frames: lanes whose stores don't execute
    # keep last frame's values, and accumulation mode blends against them
    # (ShadingHelpers.glsl:68-81)
    diffuse = state.diffuse_lighting
    specular = state.specular_lighting
    gi_slots = list(state.gi_reservoirs)
    di_slots = list(state.di_reservoirs)
    secondary = state.secondary

    # 2. DI fused resampling (light_passes.rs:608-619)
    if g_const.enable_restir_di:
        di_res, diffuse, specular = di_fused_resampling_pass(
            g_const, bridge, light_ctx, diffuse, specular, width, height)
        di_slots[g_const.restir_di.buffer_indices.shading_input_buffer_index] \
            = di_res

    # 3. ReSTIR GI chain (light_passes.rs:621-660)
    if g_const.enable_restir_gi:
        secondary, diffuse, specular = brdf_rays_pass(
            scene, g_const, renderer.tracers, bridge, diffuse, specular,
            width, height)
        gi_initial, secondary, diffuse, specular = \
            shade_secondary_surfaces_pass(
                scene, g_const, renderer.tracers, bridge, light_ctx,
                secondary, diffuse, specular, width, height)
        gi_slots[gi_idx.secondary_surface_restir_di_output_buffer_index] = \
            gi_initial

        current = gi_initial
        if g_const.enable_temporal_resampling:
            prev_src = state.gi_reservoirs[
                gi_idx.temporal_resampling_input_buffer_index]
            current = gi_temporal_pass(
                g_const, bridge, current, prev_src, motion, width, height)
            gi_slots[gi_idx.temporal_resampling_output_buffer_index] = current
        if g_const.enable_spatial_resampling:
            current = gi_spatial_pass(
                g_const, bridge, current, width, height)
            gi_slots[gi_idx.spatial_resampling_output_buffer_index] = current

        diffuse, specular = gi_final_shading_pass(
            g_const, bridge, current, secondary, diffuse, specular,
            width, height)

    # accumulation blending happens inside store_shading_output per pass; the
    # persistent lighting buffers feed it next frame
    new_state = FrameState(
        gbuffer=gbuffer,
        prev_gbuffer=prev_gbuffer,
        motion=motion,
        diffuse_lighting=diffuse,
        specular_lighting=specular,
        gi_reservoirs=(gi_slots[0], gi_slots[1]),
        di_reservoirs=(di_slots[0], di_slots[1]),
        secondary=secondary,
    )

    # 4. post-process (post_processing.comp)
    inputs = PostProcessInputs(
        depth=gbuffer.depth,
        diffuse_albedo=pk.unpack_r11g11b10_ufloat(gbuffer.diffuse_albedo),
        specular_f0=pk.unpack_rgba8_gamma_ufloat(
            gbuffer.specular_rough)[..., :3],
        emissive=gbuffer.emissive,
        diffuse=diffuse,
        specular=specular)
    output, env_motion = post_process(scene, g_const, inputs)
    new_state = new_state._replace(
        motion=new_state.motion.at[..., :2].set(
            jnp.where((gbuffer.depth == jnp.float32(100000.0))[..., None],
                      env_motion, new_state.motion[..., :2])))
    return new_state, output
