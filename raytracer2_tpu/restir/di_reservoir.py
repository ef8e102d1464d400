"""DI light reservoirs + streaming RIS core.

Pure-functional port of rtxdi/DIReservoir.hlsli: the reservoir is a NamedTuple
of SoA arrays over pixels, the streaming algorithms (RTXDI_StreamSample,
RTXDI_InternalSimpleResample, RTXDI_CombineDIReservoirs,
RTXDI_FinalizeResampling — DIReservoir.hlsli:241-340) become elementwise
masked updates over the whole image, and the packed 24-byte form
(RTXDI_PackedDIReservoir, RtxdiParameters.h:96-104) is kept byte-compatible
for storage-parity tests. "Storage" is a [slots, H, W] pytree — frame
ping-pong is a functional swap instead of the reference's XOR'd buffer
indices (main.rs:649-651).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

# Packing constants (DIReservoir.hlsli:62-80)
VISIBILITY_MASK = 0x3FFFF
VISIBILITY_CHANNEL_MAX = 0x3F
VISIBILITY_CHANNEL_SHIFT = 6
M_SHIFT = 18
MAX_M = 0x3FFF
DISTANCE_CHANNEL_BITS = 8
DISTANCE_X_SHIFT = 0
DISTANCE_Y_SHIFT = 8
AGE_SHIFT = 16
MAX_AGE = 0xFF
DISTANCE_MASK = (1 << DISTANCE_CHANNEL_BITS) - 1
MAX_DISTANCE = (1 << (DISTANCE_CHANNEL_BITS - 1)) - 1
LIGHT_VALID_BIT = 0x80000000
LIGHT_INDEX_MASK = 0x7FFFFFFF


class DIReservoir(NamedTuple):
    """RTXDI_DIReservoir (DIReservoir.hlsli:29-60), SoA over pixels."""

    light_data: jax.Array  # [...] u32: light index | valid bit
    uv_data: jax.Array  # [...] u32: 2x16 fixed-point sample uv
    weight_sum: jax.Array  # [...] f32 (RIS wsum, then invPdf after finalize)
    target_pdf: jax.Array  # [...] f32
    m: jax.Array  # [...] f32
    packed_visibility: jax.Array  # [...] u32
    spatial_distance: jax.Array  # [..., 2] i32
    age: jax.Array  # [...] u32
    canonical_weight: jax.Array  # [...] f32


def empty_di_reservoir(shape) -> DIReservoir:
    """(DIReservoir.hlsli:117-130)."""
    return DIReservoir(
        light_data=jnp.zeros(shape, jnp.uint32),
        uv_data=jnp.zeros(shape, jnp.uint32),
        weight_sum=jnp.zeros(shape, jnp.float32),
        target_pdf=jnp.zeros(shape, jnp.float32),
        m=jnp.zeros(shape, jnp.float32),
        packed_visibility=jnp.zeros(shape, jnp.uint32),
        spatial_distance=jnp.zeros(shape + (2,), jnp.int32),
        age=jnp.zeros(shape, jnp.uint32),
        canonical_weight=jnp.zeros(shape, jnp.float32),
    )


def is_valid(res: DIReservoir) -> jax.Array:
    """(DIReservoir.hlsli:219-222)."""
    return res.light_data != 0


def light_index(res: DIReservoir) -> jax.Array:
    """(DIReservoir.hlsli:224-227)."""
    return res.light_data & jnp.uint32(LIGHT_INDEX_MASK)


def sample_uv(res: DIReservoir) -> jax.Array:
    """(DIReservoir.hlsli:229-232)."""
    return jnp.stack(
        [(res.uv_data & 0xFFFF).astype(jnp.float32),
         (res.uv_data >> 16).astype(jnp.float32)], axis=-1) / 65535.0


def inv_pdf(res: DIReservoir) -> jax.Array:
    """(DIReservoir.hlsli:234-237)."""
    return res.weight_sum


def _where_res(mask, a: DIReservoir, b: DIReservoir) -> DIReservoir:
    """Select reservoir fields lane-wise: mask ? a : b."""
    m2 = mask[..., None]
    return DIReservoir(
        light_data=jnp.where(mask, a.light_data, b.light_data),
        uv_data=jnp.where(mask, a.uv_data, b.uv_data),
        weight_sum=jnp.where(mask, a.weight_sum, b.weight_sum),
        target_pdf=jnp.where(mask, a.target_pdf, b.target_pdf),
        m=jnp.where(mask, a.m, b.m),
        packed_visibility=jnp.where(mask, a.packed_visibility,
                                    b.packed_visibility),
        spatial_distance=jnp.where(m2, a.spatial_distance, b.spatial_distance),
        age=jnp.where(mask, a.age, b.age),
        canonical_weight=jnp.where(mask, a.canonical_weight,
                                   b.canonical_weight),
    )


def stream_sample(
    res: DIReservoir,
    new_light_index: jax.Array,
    uv: jax.Array,  # [..., 2]
    random: jax.Array,
    target_pdf: jax.Array,
    inv_source_pdf: jax.Array,
    active: jax.Array | None = None,
) -> tuple[DIReservoir, jax.Array]:
    """Streaming weighted reservoir sampling, Algorithm 3
    (DIReservoir.hlsli:241-271). `active=False` lanes pass through unchanged
    (the GLSL control-flow equivalent). Returns (reservoir, selected)."""
    if active is None:
        active = jnp.ones(res.weight_sum.shape, bool)
    ris_weight = target_pdf * inv_source_pdf
    m = res.m + jnp.where(active, 1.0, 0.0)
    weight_sum = res.weight_sum + jnp.where(active, ris_weight, 0.0)
    select = active & (random * weight_sum < ris_weight)

    uv_packed = (
        jnp.clip(uv[..., 0], 0, 1) * 65535.0).astype(jnp.uint32) | (
        (jnp.clip(uv[..., 1], 0, 1) * 65535.0).astype(jnp.uint32) << 16)
    out = DIReservoir(
        light_data=jnp.where(
            select,
            new_light_index.astype(jnp.uint32) | jnp.uint32(LIGHT_VALID_BIT),
            res.light_data),
        uv_data=jnp.where(select, uv_packed, res.uv_data),
        weight_sum=weight_sum,
        target_pdf=jnp.where(select, target_pdf, res.target_pdf),
        m=m,
        packed_visibility=res.packed_visibility,
        spatial_distance=res.spatial_distance,
        age=res.age,
        canonical_weight=res.canonical_weight,
    )
    return out, select


def internal_simple_resample(
    res: DIReservoir,
    new_res: DIReservoir,
    random: jax.Array,
    target_pdf,
    sample_normalization,
    sample_m,
    active: jax.Array | None = None,
) -> tuple[DIReservoir, jax.Array]:
    """(DIReservoir.hlsli:277-310)."""
    if active is None:
        active = jnp.ones(res.weight_sum.shape, bool)
    ris_weight = target_pdf * sample_normalization
    m = res.m + jnp.where(active, sample_m, 0.0)
    weight_sum = res.weight_sum + jnp.where(active, ris_weight, 0.0)
    select = active & (random * weight_sum < ris_weight)

    out = DIReservoir(
        light_data=jnp.where(select, new_res.light_data, res.light_data),
        uv_data=jnp.where(select, new_res.uv_data, res.uv_data),
        weight_sum=weight_sum,
        target_pdf=jnp.where(select, target_pdf, res.target_pdf),
        m=m,
        packed_visibility=jnp.where(select, new_res.packed_visibility,
                                    res.packed_visibility),
        spatial_distance=jnp.where(select[..., None],
                                   new_res.spatial_distance,
                                   res.spatial_distance),
        age=jnp.where(select, new_res.age, res.age),
        canonical_weight=res.canonical_weight,
    )
    return out, select


def combine_reservoirs(
    res: DIReservoir,
    new_res: DIReservoir,
    random: jax.Array,
    target_pdf: jax.Array,
    active: jax.Array | None = None,
) -> tuple[DIReservoir, jax.Array]:
    """Algorithm 4: combining streams (DIReservoir.hlsli:315-329)."""
    return internal_simple_resample(
        res, new_res, random, target_pdf,
        new_res.weight_sum * new_res.m, new_res.m, active)


def finalize_resampling(
    res: DIReservoir,
    normalization_numerator,
    normalization_denominator,
    active: jax.Array | None = None,
) -> DIReservoir:
    """Equation 6 normalization (DIReservoir.hlsli:332-340)."""
    denominator = res.target_pdf * normalization_denominator
    new_w = jnp.where(
        denominator == 0.0, 0.0,
        res.weight_sum * normalization_numerator
        / jnp.where(denominator == 0.0, 1.0, denominator))
    if active is not None:
        new_w = jnp.where(active, new_w, res.weight_sum)
    return res._replace(weight_sum=new_w)


def store_visibility(res: DIReservoir, visibility: jax.Array,
                     discard_if_invisible,
                     active: jax.Array | None = None) -> DIReservoir:
    """(DIReservoir.hlsli:164-182)."""
    if active is None:
        active = jnp.ones(res.weight_sum.shape, bool)
    v = jnp.clip(visibility, 0.0, 1.0)
    packed = ((v[..., 0] * VISIBILITY_CHANNEL_MAX).astype(jnp.uint32)
              | ((v[..., 1] * VISIBILITY_CHANNEL_MAX).astype(jnp.uint32)
                 << VISIBILITY_CHANNEL_SHIFT)
              | ((v[..., 2] * VISIBILITY_CHANNEL_MAX).astype(jnp.uint32)
                 << (VISIBILITY_CHANNEL_SHIFT * 2)))
    invisible = jnp.all(visibility == 0.0, axis=-1)
    discard = active & invisible & discard_if_invisible
    return DIReservoir(
        light_data=jnp.where(discard, jnp.uint32(0), res.light_data),
        uv_data=res.uv_data,
        weight_sum=jnp.where(discard, 0.0, res.weight_sum),
        target_pdf=res.target_pdf,
        m=res.m,
        packed_visibility=jnp.where(active, packed, res.packed_visibility),
        spatial_distance=jnp.where(active[..., None], 0,
                                   res.spatial_distance),
        age=jnp.where(active, jnp.uint32(0), res.age),
        canonical_weight=res.canonical_weight,
    )


def get_reservoir_visibility(res: DIReservoir, max_age, max_distance
                             ) -> tuple[jax.Array, jax.Array]:
    """(DIReservoir.hlsli:199-217). Returns (reusable_mask, visibility)."""
    dist = jnp.linalg.norm(res.spatial_distance.astype(jnp.float32), axis=-1)
    ok = (res.age > 0) & (res.age <= max_age) & (dist < max_distance)
    cm = jnp.float32(VISIBILITY_CHANNEL_MAX)
    vis = jnp.stack(
        [(res.packed_visibility & VISIBILITY_CHANNEL_MAX).astype(jnp.float32) / cm,
         ((res.packed_visibility >> VISIBILITY_CHANNEL_SHIFT)
          & VISIBILITY_CHANNEL_MAX).astype(jnp.float32) / cm,
         ((res.packed_visibility >> (2 * VISIBILITY_CHANNEL_SHIFT))
          & VISIBILITY_CHANNEL_MAX).astype(jnp.float32) / cm],
        axis=-1)
    return ok, jnp.where(ok[..., None], vis, 0.0)


# ---------------------------------------------------------------------------
# Packed form (byte-compatible with RTXDI_PackedDIReservoir)
# ---------------------------------------------------------------------------

class PackedDIReservoir(NamedTuple):
    """(RtxdiParameters.h:96-104): 6 u32 words."""

    light_data: jax.Array  # u32
    uv_data: jax.Array  # u32
    m_visibility: jax.Array  # u32
    distance_age: jax.Array  # u32
    target_pdf: jax.Array  # f32
    weight: jax.Array  # f32


def pack_di_reservoir(res: DIReservoir) -> PackedDIReservoir:
    """(DIReservoir.hlsli:82-103)."""
    sd = jnp.clip(res.spatial_distance, -MAX_DISTANCE, MAX_DISTANCE)
    age = jnp.minimum(res.age, MAX_AGE)
    m_vis = (res.packed_visibility
             | (jnp.minimum(res.m.astype(jnp.uint32), MAX_M) << M_SHIFT))
    dist_age = (((sd[..., 0].astype(jnp.uint32) & DISTANCE_MASK)
                 << DISTANCE_X_SHIFT)
                | ((sd[..., 1].astype(jnp.uint32) & DISTANCE_MASK)
                   << DISTANCE_Y_SHIFT)
                | (age << AGE_SHIFT))
    return PackedDIReservoir(
        light_data=res.light_data, uv_data=res.uv_data,
        m_visibility=m_vis, distance_age=dist_age,
        target_pdf=res.target_pdf, weight=res.weight_sum)


def unpack_di_reservoir(p: PackedDIReservoir) -> DIReservoir:
    """(DIReservoir.hlsli:132-153), incl. the Inf/NaN discard."""
    def sext(word, shift):
        shifted = (word << (32 - shift - DISTANCE_CHANNEL_BITS)).astype(jnp.int32)
        return shifted >> (32 - DISTANCE_CHANNEL_BITS)

    res = DIReservoir(
        light_data=p.light_data,
        uv_data=p.uv_data,
        weight_sum=p.weight,
        target_pdf=p.target_pdf,
        m=((p.m_visibility >> M_SHIFT) & MAX_M).astype(jnp.float32),
        packed_visibility=p.m_visibility & VISIBILITY_MASK,
        spatial_distance=jnp.stack(
            [sext(p.distance_age, DISTANCE_X_SHIFT),
             sext(p.distance_age, DISTANCE_Y_SHIFT)], axis=-1),
        age=(p.distance_age >> AGE_SHIFT) & MAX_AGE,
        canonical_weight=jnp.zeros_like(p.weight),
    )
    bad = ~jnp.isfinite(res.weight_sum)
    return _where_res(bad, empty_di_reservoir(bad.shape), res)
