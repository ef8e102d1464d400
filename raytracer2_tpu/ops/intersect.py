"""Ray-triangle / ray-AABB intersection kernels.

These replace the Vulkan RT pipeline's traceRayEXT + hit shaders
(src/shaders/rayhit.rchit:60-65, raymiss.rmiss:12-16): the traversal result is
exactly the reference's payload — {depth t, barycentric uv, geometryIndex,
primitiveId} with geometryIndex == INVALID_INDEX on miss (common.glsl:23-28).
No backface culling, matching the TLAS instance flags (model.rs:67-70,
TRIANGLE_CULL_DISABLE).

Two paths:
- `intersect_brute_force`: all-pairs Möller-Trumbore, scanned over triangle
  chunks; the correctness oracle for BVH traversal and fine for small scenes.
- slab-test helpers consumed by the LBVH traversal in ops/traverse.py.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# plain numpy so importing this module never initializes a JAX backend
INVALID_INDEX = np.uint32(0xFFFFFFFF)


class HitRecord(NamedTuple):
    """Traversal result, SoA over rays (ref payload: common.glsl:23-28)."""

    t: jax.Array  # [...] hit distance; BACKGROUND_DEPTH-like tmax on miss
    u: jax.Array  # [...] barycentric u
    v: jax.Array  # [...] barycentric v
    geometry_index: jax.Array  # [...] uint32; INVALID_INDEX on miss
    primitive_id: jax.Array  # [...] uint32
    triangle_index: jax.Array  # [...] int32 global tri id; -1 on miss

    @property
    def missed(self) -> jax.Array:
        return self.geometry_index == INVALID_INDEX


def moller_trumbore(
    origin: jax.Array,  # [..., 3]
    direction: jax.Array,  # [..., 3]
    v0: jax.Array,  # [..., 3] (broadcastable against rays)
    edge1: jax.Array,
    edge2: jax.Array,
    t_min,
    t_max,
    eps: float = 1e-9,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Vectorized Möller-Trumbore; returns (hit_mask, t, u, v).

    Double-sided (no culling). All inputs broadcast elementwise, so callers
    shape them [rays, tris, 3] for all-pairs or [rays, 3] for one-to-one.
    """
    pvec = jnp.cross(direction, edge2)
    det = jnp.sum(edge1 * pvec, axis=-1)
    inv_det = jnp.where(jnp.abs(det) > eps, 1.0 / det, 0.0)

    tvec = origin - v0
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, edge1)
    v = jnp.sum(direction * qvec, axis=-1) * inv_det
    t = jnp.sum(edge2 * qvec, axis=-1) * inv_det

    hit = (
        (jnp.abs(det) > eps)
        & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
        & (t > t_min) & (t < t_max)
    )
    return hit, t, u, v


def ray_aabb(
    origin: jax.Array,  # [..., 3]
    inv_direction: jax.Array,  # [..., 3] precomputed 1/d (inf-safe)
    box_min: jax.Array,  # [..., 3]
    box_max: jax.Array,  # [..., 3]
    t_min,
    t_max,
) -> tuple[jax.Array, jax.Array]:
    """Slab test; returns (hit_mask, entry_t). Robust to axis-parallel rays
    via the min/max ordering trick."""
    t0 = (box_min - origin) * inv_direction
    t1 = (box_max - origin) * inv_direction
    t_near = jnp.max(jnp.minimum(t0, t1), axis=-1)
    t_far = jnp.min(jnp.maximum(t0, t1), axis=-1)
    hit = (t_near <= t_far) & (t_far >= t_min) & (t_near <= t_max)
    return hit, jnp.maximum(t_near, t_min)


def safe_inv_dir(direction: jax.Array, eps: float = 1e-12) -> jax.Array:
    """1/d with tiny-component clamping so slab tests stay finite-robust."""
    d = jnp.where(jnp.abs(direction) < eps,
                  jnp.where(direction >= 0.0, eps, -eps), direction)
    return 1.0 / d


def intersect_brute_force(
    origins: jax.Array,  # [N, 3]
    directions: jax.Array,  # [N, 3]
    tri_v0: jax.Array,  # [T, 3]
    tri_edge1: jax.Array,  # [T, 3]
    tri_edge2: jax.Array,  # [T, 3]
    tri_geometry: jax.Array,  # [T] int32
    tri_primitive: jax.Array,  # [T] int32
    t_min,
    t_max,
    chunk: int = 512,
) -> HitRecord:
    """Closest-hit over every triangle; the BVH-free correctness oracle
    (SURVEY.md §7 step 2). Scans triangle chunks to bound the [N, chunk]
    broadcast footprint; N should be the flattened pixel/ray count.
    """
    n = origins.shape[0]
    t_cap = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))
    num_tris = tri_v0.shape[0]
    pad = (-num_tris) % chunk
    if pad:
        padv = jnp.zeros((pad, 3), tri_v0.dtype)
        tri_v0 = jnp.concatenate([tri_v0, padv])
        # degenerate padding (zero edges) never intersects
        tri_edge1 = jnp.concatenate([tri_edge1, padv])
        tri_edge2 = jnp.concatenate([tri_edge2, padv])
        tri_geometry = jnp.concatenate(
            [tri_geometry, jnp.zeros((pad,), tri_geometry.dtype)])
        tri_primitive = jnp.concatenate(
            [tri_primitive, jnp.zeros((pad,), tri_primitive.dtype)])
    n_chunks = tri_v0.shape[0] // chunk

    v0c = tri_v0.reshape(n_chunks, chunk, 3)
    e1c = tri_edge1.reshape(n_chunks, chunk, 3)
    e2c = tri_edge2.reshape(n_chunks, chunk, 3)

    init = (
        t_cap,  # best t
        jnp.zeros((n,), jnp.float32),  # u
        jnp.zeros((n,), jnp.float32),  # v
        jnp.full((n,), -1, jnp.int32),  # best global tri index
    )

    def body(carry, ci):
        best_t, best_u, best_v, best_tri = carry
        v0 = v0c[ci]  # [chunk, 3]
        e1 = e1c[ci]
        e2 = e2c[ci]
        hit, t, u, v = moller_trumbore(
            origins[:, None, :], directions[:, None, :],
            v0[None, :, :], e1[None, :, :], e2[None, :, :],
            t_min[:, None], best_t[:, None])
        t = jnp.where(hit, t, jnp.inf)
        arg = jnp.argmin(t, axis=-1)  # [N]
        row = jnp.arange(n)
        t_best_chunk = t[row, arg]
        better = t_best_chunk < best_t
        best_t = jnp.where(better, t_best_chunk, best_t)
        best_u = jnp.where(better, u[row, arg], best_u)
        best_v = jnp.where(better, v[row, arg], best_v)
        best_tri = jnp.where(better, ci * chunk + arg.astype(jnp.int32),
                             best_tri)
        return (best_t, best_u, best_v, best_tri), None

    (best_t, best_u, best_v, best_tri), _ = jax.lax.scan(
        body, init, jnp.arange(n_chunks))

    missed = best_tri < 0
    safe_tri = jnp.maximum(best_tri, 0)
    geom = jnp.where(missed, INVALID_INDEX,
                     tri_geometry[safe_tri].astype(jnp.uint32))
    prim = jnp.where(missed, jnp.uint32(0),
                     tri_primitive[safe_tri].astype(jnp.uint32))
    return HitRecord(
        t=jnp.where(missed, t_cap, best_t), u=best_u, v=best_v,
        geometry_index=geom, primitive_id=prim, triangle_index=best_tri)


def occluded_brute_force(
    origins: jax.Array,  # [N, 3]
    directions: jax.Array,  # [N, 3]
    tri_v0: jax.Array,
    tri_edge1: jax.Array,
    tri_edge2: jax.Array,
    t_min,
    t_max,  # [N] or scalar
    chunk: int = 512,
) -> jax.Array:
    """Any-hit visibility query: True where the segment is blocked.

    Separate from closest-hit because visibility rays dominate the ray budget
    (ShadingHelpers.glsl:34-38) and need no hit attributes.
    """
    n = origins.shape[0]
    num_tris = tri_v0.shape[0]
    pad = (-num_tris) % chunk
    if pad:
        padv = jnp.zeros((pad, 3), tri_v0.dtype)
        tri_v0 = jnp.concatenate([tri_v0, padv])
        tri_edge1 = jnp.concatenate([tri_edge1, padv])
        tri_edge2 = jnp.concatenate([tri_edge2, padv])
    n_chunks = tri_v0.shape[0] // chunk
    v0c = tri_v0.reshape(n_chunks, chunk, 3)
    e1c = tri_edge1.reshape(n_chunks, chunk, 3)
    e2c = tri_edge2.reshape(n_chunks, chunk, 3)
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))

    def body(blocked, ci):
        hit, _, _, _ = moller_trumbore(
            origins[:, None, :], directions[:, None, :],
            v0c[ci][None], e1c[ci][None], e2c[ci][None],
            t_min[:, None], t_max[:, None])
        return blocked | jnp.any(hit, axis=-1), None

    blocked, _ = jax.lax.scan(body, jnp.zeros((n,), bool), jnp.arange(n_chunks))
    return blocked
