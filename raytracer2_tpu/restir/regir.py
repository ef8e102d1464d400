"""ReGIR: world-space light-grid presampling (grid layout).

Port of rtxdi/ReGIR.h + ReGIRSampling.hlsli + the grid build pass
(PresamplingFunctions.hlsli:168-249). The reference ships this code but
compiles it out (RTXDI_REGIR_DISABLED) and the host never enables it
(SURVEY.md §2.3); the rebuild provides the GRID layout as a working
capability — each grid cell holds `lights_per_cell` RIS-selected lights
weighted by their contribution to the cell volume, and local-light sampling
mode 2 draws candidates from the surface's (jittered) cell.

The onion layout's host-side layer tables are not implemented (the grid
covers the capability; the reference never executes either).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from raytracer2_tpu.lights.polymorphic import (
    LightInfo, get_light_type, unpack_light_color, _create_triangle,
    K_POINT, K_TRIANGLE)
from raytracer2_tpu.params import LightBufferRegion
from raytracer2_tpu.utils import brdf
from raytracer2_tpu.utils import rng as rtrng


@dataclasses.dataclass(frozen=True)
class ReGIRGridParameters:
    """ReGIR_CommonParameters + ReGIR_GridParameters (rtxdi/ReGIRParameters.h),
    grid layout only. All static."""

    center: tuple[float, float, float] = (0.0, 0.0, 0.0)
    cell_size: float = 1.0
    cells: tuple[int, int, int] = (16, 16, 16)
    lights_per_cell: int = 128
    sampling_jitter: float = 1.0
    num_build_samples: int = 8

    @property
    def num_cells(self) -> int:
        return self.cells[0] * self.cells[1] * self.cells[2]


def get_jitter_scale(params: ReGIRGridParameters) -> float:
    """(ReGIRSampling.hlsli:16-19)."""
    return params.sampling_jitter * params.cell_size


def world_pos_to_cell_index(params: ReGIRGridParameters,
                            world_pos: jax.Array) -> jax.Array:
    """(ReGIRSampling.hlsli:21-34): [-1] outside the grid."""
    center = jnp.asarray(params.center, jnp.float32)
    counts = jnp.asarray(params.cells, jnp.int32)
    origin = center - counts.astype(jnp.float32) * (params.cell_size * 0.5)
    cell = jnp.floor((world_pos - origin) / params.cell_size).astype(jnp.int32)
    inside = jnp.all((cell >= 0) & (cell < counts), axis=-1)
    idx = (cell[..., 0] + (cell[..., 1] + cell[..., 2] * counts[1])
           * counts[0])
    return jnp.where(inside, idx, -1)


def cell_index_to_world_pos(params: ReGIRGridParameters,
                            cell_index: jax.Array
                            ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """(ReGIRSampling.hlsli:36-60): (valid, center [..,3], radius)."""
    center = jnp.asarray(params.center, jnp.float32)
    counts = jnp.asarray(params.cells, jnp.int32)
    origin = center - counts.astype(jnp.float32) * (params.cell_size * 0.5)
    x = cell_index % counts[0]
    y = (cell_index // counts[0]) % counts[1]
    z = cell_index // (counts[0] * counts[1])
    valid = (cell_index >= 0) & (z < counts[2])
    pos = (jnp.stack([x, y, z], axis=-1).astype(jnp.float32) + 0.5) \
        * params.cell_size + origin
    radius = jnp.full(cell_index.shape, params.cell_size * jnp.sqrt(3.0))
    return valid, pos, radius


# ---------------------------------------------------------------------------
# Light weight for a volume (PolymorphicLight.glsl:473-490)
# ---------------------------------------------------------------------------

def _average_distance_to_volume(distance, radius):
    """(PolymorphicLight.glsl:129-139)."""
    nonlinear = 1.1547
    return distance + radius * radius ** 2 / jnp.maximum(
        (distance + radius * nonlinear) ** 2, 1e-20)


def get_light_weight_for_volume(info: LightInfo, volume_center: jax.Array,
                                volume_radius) -> jax.Array:
    """RAB_GetLightTargetPdfForVolume (bridge:504-507 ->
    PolymorphicLight.glsl:473-490), incl. the shaped-light sphere-cone cull
    (PolymorphicLight.glsl:175-178)."""
    from raytracer2_tpu.lights.polymorphic import get_shaping
    from raytracer2_tpu.lights.shaping import (
        test_sphere_intersection_for_shaped_light)

    ltype = get_light_type(info.color_type_and_flags)

    # point lights (:175-184)
    flux = unpack_light_color(info)
    d_point = jnp.linalg.norm(volume_center - info.center, axis=-1)
    d_point = _average_distance_to_volume(d_point, volume_radius)
    w_point = brdf.luminance(flux) / jnp.maximum(d_point ** 2, 1e-20)
    cone_ok = test_sphere_intersection_for_shaped_light(
        info.center, 0.0, get_shaping(info), volume_center, volume_radius)
    w_point = jnp.where(cone_ok, w_point, 0.0)

    # triangle lights (:302-316)
    tri = _create_triangle(info)
    dist_to_plane = brdf.dot3(volume_center - tri.base, tri.normal)
    barycenter = tri.base + (tri.edge1 + tri.edge2) / 3.0
    d_tri = jnp.linalg.norm(barycenter - volume_center, axis=-1)
    d_tri = _average_distance_to_volume(d_tri, volume_radius)
    solid_angle = jnp.minimum(
        tri.surface_area / jnp.maximum(d_tri ** 2, 1e-20), 2.0 * brdf.PI)
    w_tri = jnp.where(dist_to_plane < -volume_radius, 0.0,
                      solid_angle * brdf.luminance(tri.radiance))

    w = jnp.where(ltype == K_POINT, w_point, 0.0)
    return jnp.where(ltype == K_TRIANGLE, w_tri, w)


# ---------------------------------------------------------------------------
# Grid build (PresamplingFunctions.hlsli:168-249)
# ---------------------------------------------------------------------------

def presample_regir_grid(
    rng_seed: int,
    lights: LightInfo,
    local_region: LightBufferRegion,
    params: ReGIRGridParameters,
) -> jax.Array:
    """Fill the ReGIR RIS buffer: [num_cells * lights_per_cell, 2] u32 of
    (light index, RIS weight bits). One RIS stream per light slot, each
    drawing `num_build_samples` uniform candidates weighted by the light's
    contribution to the slot's cell volume."""
    n_slots = params.num_cells * params.lights_per_cell
    slot = jnp.arange(n_slots, dtype=jnp.uint32)
    cell_index = (slot // params.lights_per_cell).astype(jnp.int32)
    valid_cell, cell_center, cell_radius = cell_index_to_world_pos(
        params, cell_index)
    cell_radius = cell_radius * (params.sampling_jitter + 1.0)  # (:196)

    state = rtrng.RngState(seed=rtrng.jenkins_hash(slot) + jnp.uint32(rng_seed),
                           index=jnp.ones_like(slot))

    num_lights = max(local_region.num_lights, 1)
    inv_num_samples = 1.0 / max(params.num_build_samples, 1)

    selected = jnp.zeros((n_slots,), jnp.uint32)
    selected_pdf = jnp.zeros((n_slots,), jnp.float32)
    weight_sum = jnp.zeros((n_slots,), jnp.float32)

    for _ in range(params.num_build_samples):
        r, state = rtrng.sample_uniform(state)
        light_index = (local_region.first_light_index + jnp.minimum(
            (r * num_lights).astype(jnp.uint32), num_lights - 1))
        info = LightInfo(*(leaf[light_index.astype(jnp.int32)]
                           for leaf in lights))
        target = get_light_weight_for_volume(info, cell_center, cell_radius)
        inv_source_pdf = float(num_lights) * inv_num_samples
        ris_w = target * inv_source_pdf
        weight_sum = weight_sum + ris_w
        rr, state = rtrng.sample_uniform(state)
        take = rr * weight_sum < ris_w
        selected = jnp.where(take, light_index, selected)
        selected_pdf = jnp.where(take, target, selected_pdf)

    weight = jnp.where(selected_pdf > 0.0,
                       weight_sum / jnp.maximum(selected_pdf, 1e-30), 0.0)
    weight = jnp.where(valid_cell & (local_region.num_lights > 0),
                       weight, 0.0)
    return jnp.stack(
        [jnp.where(weight > 0, selected, jnp.uint32(0)),
         jax.lax.bitcast_convert_type(weight, jnp.uint32)], axis=-1)


def select_light_from_regir_cell(
    rng: rtrng.RngState,
    ris_buffer: jax.Array,  # [num_cells * lights_per_cell, 2]
    cell_index: jax.Array,  # [...] int32 (-1 = no cell)
    params: ReGIRGridParameters,
) -> tuple[jax.Array, jax.Array, jax.Array, rtrng.RngState]:
    """RTXDI_SelectLocalLightReGIRRISTile + tile draw: returns
    (light_index, inv_source_pdf, valid, rng)."""
    r, rng = rtrng.sample_uniform(rng)
    in_cell = jnp.minimum((r * params.lights_per_cell).astype(jnp.int32),
                          params.lights_per_cell - 1)
    ptr = jnp.maximum(cell_index, 0) * params.lights_per_cell + in_cell
    entry = ris_buffer[ptr]
    light_index = entry[..., 0]
    inv_pdf = jax.lax.bitcast_convert_type(entry[..., 1], jnp.float32)
    valid = (cell_index >= 0) & (inv_pdf > 0.0)
    return light_index, inv_pdf, valid, rng
