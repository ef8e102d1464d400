"""Pallas traversal kernel: per-bundle candidate walk with in-kernel DMA.

The XLA bundle walk (ops/traverse_bundle.py) runs all bundles in lockstep —
every while_loop step pays for every bundle, so one deep bundle stalls the
whole batch, and each step is a chain of XLA ops with dispatch overhead.
This kernel moves the walk INSIDE a Pallas program, one grid step per
bundle:

- the bundle's rays, candidate cluster ids and entry distances sit in VMEM;
- cluster Wald blocks are DMA'd from HBM on demand, double-buffered so the
  fetch of candidate k+1 overlaps the intersection of candidate k;
- the walk terminates per bundle the moment the next candidate's entry
  distance exceeds the bundle's worst committed hit — cheap bundles cost a
  handful of iterations, and TOTAL time tracks the sum of per-bundle work
  instead of (num steps of the worst bundle) x (cost of all bundles).

The kernel returns (t, u, v, candidate k, slot) per ray; the host maps
(k, slot) back to triangle ids with one gather. Correctness is validated
against the brute-force oracle in interpret mode and on hardware by
tests/test_bvh.py::TestPallasTracer.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracer2_tpu.ops.cluster import Clusters
from raytracer2_tpu.ops.intersect import INVALID_INDEX, HitRecord

LANE_PAD = 128  # pad the per-cluster triangle count to a lane multiple


def _wald_rows(clusters: Clusters) -> jax.Array:
    """Re-layout [C, 4, 3S] -> [C, 12, S_pad]: row (k*3 + c) holds transform
    input k (x, y, z, bias) for output component c (u, v, z), so the kernel
    computes each component as lane-parallel FMAs with no reshapes. Padding
    triangles have all-zero transforms (d'_z == 0 -> never hit)."""
    c, _, w3 = clusters.wald.shape
    s = w3 // 3
    sp = ((s + LANE_PAD - 1) // LANE_PAD) * LANE_PAD
    rows = (clusters.wald.reshape(c, 4, s, 3)
            .transpose(0, 1, 3, 2)  # [C, 4, 3, S]
            .reshape(c, 12, s))
    # pad rows 12 -> 16 and S -> lane multiple: DMA slices need 8-aligned
    # leading dims and 128-aligned lanes
    rows = jnp.pad(rows, ((0, 0), (0, 4), (0, sp - s)))
    return rows


def _walk_kernel(cand_count_ref,
                 o_ref, d_ref, tmin_ref, tmax_ref,
                 cand_idx_hbm, cand_t_hbm, wald_hbm,
                 t_out, u_out, v_out, k_out, slot_out,
                 idx_row, t_row, scratch, sems, row_sems):
    """One bundle per grid step. Candidate rows are DMA'd HBM->SMEM up
    front; cluster Wald blocks stream HBM->VMEM double-buffered."""
    p = o_ref.shape[0]
    i = pl.program_id(0)
    n_cand = cand_count_ref[i]
    kr, kc = idx_row.shape  # [8, K/8] row-major candidate layout
    k_max = kr * kc

    idx_dma = pltpu.make_async_copy(cand_idx_hbm.at[i], idx_row,
                                    row_sems.at[0])
    t_dma = pltpu.make_async_copy(cand_t_hbm.at[i], t_row, row_sems.at[1])
    idx_dma.start()
    t_dma.start()
    idx_dma.wait()
    t_dma.wait()

    def cand_at(ref, k):
        return ref[jax.lax.div(k, kc), jax.lax.rem(k, kc)]

    def fetch(k, slot):
        ci = cand_at(idx_row, k)
        return pltpu.make_async_copy(
            wald_hbm.at[ci], scratch.at[slot], sems.at[slot])

    # warm up: fill the prefetch pipeline (the walk is HBM-latency bound -
    # each cluster fetch is ~1us while its intersection is ~50ns, so keep
    # DEPTH fetches in flight)
    depth = scratch.shape[0]
    for j in range(depth - 1):
        @pl.when(j < n_cand)
        def _(j=j):
            fetch(j, j % depth).start()

    ox = o_ref[:, 0:1]
    oy = o_ref[:, 1:2]
    oz = o_ref[:, 2:3]
    dx = d_ref[:, 0:1]
    dy = d_ref[:, 1:2]
    dz3 = d_ref[:, 2:3]

    init = (
        jnp.int32(0),  # k
        tmax_ref[0, 0],  # best t  [P]
        jnp.zeros((p,), jnp.float32),  # u
        jnp.zeros((p,), jnp.float32),  # v
        jnp.full((p,), -1, jnp.int32),  # best candidate k
        jnp.full((p,), -1, jnp.int32),  # best slot within cluster
    )

    def cond(state):
        k, best_t, *_ = state
        worst = jnp.max(best_t)
        more = k < n_cand
        near_enough = cand_at(t_row, jnp.minimum(k, k_max - 1)) <= worst
        return more & near_enough

    def body(state):
        k, best_t, best_u, best_v, best_k, best_slot = state
        slot = jax.lax.rem(k, depth)

        @pl.when(k + depth - 1 < n_cand)
        def _():
            fetch(k + depth - 1, jax.lax.rem(k + depth - 1, depth)).start()

        fetch(k, slot).wait()
        w = scratch[slot]  # [12, S_pad]: rows = input k * 3 + component c

        def affine(c, px, py2, pz, bias):
            out = px * w[0 + c][None] + py2 * w[3 + c][None] \
                + pz * w[6 + c][None]
            if bias:
                out = out + w[9 + c][None]
            return out

        op_u = affine(0, ox, oy, oz, True)
        op_v = affine(1, ox, oy, oz, True)
        op_z = affine(2, ox, oy, oz, True)
        dp_u = affine(0, dx, dy, dz3, False)
        dp_v = affine(1, dx, dy, dz3, False)
        dz = affine(2, dx, dy, dz3, False)
        safe = jnp.where(jnp.abs(dz) > 1e-12, dz, 1.0)
        t = -op_z / safe
        uu = op_u + t * dp_u
        vv = op_v + t * dp_v
        hit = ((jnp.abs(dz) > 1e-12)
               & (uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0)
               & (t > tmin_ref[0, 0][:, None]) & (t < best_t[:, None]))
        t = jnp.where(hit, t, jnp.inf)
        # reduce-based winner selection (Mosaic has no 2D fancy gather):
        # min-t, then the lowest slot achieving it, then one-hot extract u/v
        tb = jnp.min(t, axis=-1)
        s_pad = t.shape[-1]
        slot_iota = jax.lax.broadcasted_iota(jnp.int32, (p, s_pad), 1)
        at_min = t == tb[:, None]
        new_slot = jnp.min(jnp.where(at_min, slot_iota, jnp.int32(1 << 30)),
                           axis=-1)
        one_hot = slot_iota == new_slot[:, None]
        u_new = jnp.sum(jnp.where(one_hot, uu, 0.0), axis=-1)
        v_new = jnp.sum(jnp.where(one_hot, vv, 0.0), axis=-1)
        better = tb < best_t
        best_t = jnp.where(better, tb, best_t)
        best_u = jnp.where(better, u_new, best_u)
        best_v = jnp.where(better, v_new, best_v)
        best_k = jnp.where(better, k, best_k)
        best_slot = jnp.where(better, new_slot, best_slot)
        return k + 1, best_t, best_u, best_v, best_k, best_slot

    k_final, best_t, best_u, best_v, best_k, best_slot = jax.lax.while_loop(
        cond, body, init)

    # drain: an early exit (entry distance > worst hit) leaves up to
    # depth-1 prefetches in flight; wait on them or the semaphore counts
    # leak into the next grid step and the DMA engine aborts
    for off in range(depth - 1):
        @pl.when(k_final + off < n_cand)
        def _(off=off):
            fetch(k_final + off, jax.lax.rem(k_final + off, depth)).wait()

    t_out[0, 0, :] = best_t
    u_out[0, 0, :] = best_u
    v_out[0, 0, :] = best_v
    k_out[0, 0, :] = best_k
    slot_out[0, 0, :] = best_slot


def _occlude_kernel(cand_count_ref,
                    o_ref, d_ref, tmin_ref, tmax_ref,
                    cand_idx_hbm, cand_t_hbm, wald_hbm,
                    hit_out,
                    idx_row, t_row, scratch, sems, row_sems):
    """Any-hit variant of _walk_kernel: a ray is done at its first hit; the
    bundle exits once every live ray is blocked or candidates run out."""
    p = o_ref.shape[0]
    i = pl.program_id(0)
    n_cand = cand_count_ref[i]
    kr, kc = idx_row.shape
    k_max = kr * kc

    idx_dma = pltpu.make_async_copy(cand_idx_hbm.at[i], idx_row,
                                    row_sems.at[0])
    t_dma = pltpu.make_async_copy(cand_t_hbm.at[i], t_row, row_sems.at[1])
    idx_dma.start()
    t_dma.start()
    idx_dma.wait()
    t_dma.wait()

    def cand_at(ref, k):
        return ref[jax.lax.div(k, kc), jax.lax.rem(k, kc)]

    def fetch(k, slot):
        ci = cand_at(idx_row, k)
        return pltpu.make_async_copy(
            wald_hbm.at[ci], scratch.at[slot], sems.at[slot])

    depth = scratch.shape[0]
    for j in range(depth - 1):
        @pl.when(j < n_cand)
        def _(j=j):
            fetch(j, j % depth).start()

    ox = o_ref[:, 0:1]
    oy = o_ref[:, 1:2]
    oz = o_ref[:, 2:3]
    dx = d_ref[:, 0:1]
    dy = d_ref[:, 1:2]
    dz3 = d_ref[:, 2:3]
    tn = tmin_ref[0, 0]
    tx = tmax_ref[0, 0]

    # padded rays carry t_max < t_min: done from the start. The done mask
    # is carried as int32 (Mosaic cannot yield i1 vectors from loops).
    init = (jnp.int32(0), (tx <= tn).astype(jnp.int32))

    def cond(state):
        k, done = state
        # the farthest t_max among live rays bounds useful candidates; once
        # every ray is done the max is -inf and the walk stops
        worst = jnp.max(jnp.where(done != 0, -jnp.inf, tx))
        more = k < n_cand
        near_enough = cand_at(t_row, jnp.minimum(k, k_max - 1)) <= worst
        return more & near_enough

    def body(state):
        k, done = state
        slot = jax.lax.rem(k, depth)

        @pl.when(k + depth - 1 < n_cand)
        def _():
            fetch(k + depth - 1, jax.lax.rem(k + depth - 1, depth)).start()

        fetch(k, slot).wait()
        w = scratch[slot]

        def affine(c, px, py2, pz, bias):
            out = px * w[0 + c][None] + py2 * w[3 + c][None] \
                + pz * w[6 + c][None]
            if bias:
                out = out + w[9 + c][None]
            return out

        op_u = affine(0, ox, oy, oz, True)
        op_v = affine(1, ox, oy, oz, True)
        op_z = affine(2, ox, oy, oz, True)
        dp_u = affine(0, dx, dy, dz3, False)
        dp_v = affine(1, dx, dy, dz3, False)
        dz = affine(2, dx, dy, dz3, False)
        safe = jnp.where(jnp.abs(dz) > 1e-12, dz, 1.0)
        t = -op_z / safe
        uu = op_u + t * dp_u
        vv = op_v + t * dp_v
        hit = ((jnp.abs(dz) > 1e-12)
               & (uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0)
               & (t > tn[:, None]) & (t < tx[:, None]))
        return k + 1, done | jnp.any(hit, axis=-1).astype(jnp.int32)

    k_final, done = jax.lax.while_loop(cond, body, init)

    for off in range(depth - 1):
        @pl.when(k_final + off < n_cand)
        def _(off=off):
            fetch(k_final + off, jax.lax.rem(k_final + off, depth)).wait()

    hit_out[0, 0, :] = done * (tx > tn).astype(jnp.int32)


@partial(jax.jit, static_argnames=("bundle_size", "interpret"))
def occluded_bundle_pallas(
    clusters: Clusters,
    origins: jax.Array,
    directions: jax.Array,
    t_min,
    t_max,
    scene_min: jax.Array,
    scene_max: jax.Array,
    bundle_size: int = 64,
    interpret: bool = False,
) -> jax.Array:
    """Any-hit visibility batch via the Pallas walk: True where blocked.
    Shadow-ray counterpart of traceVisibilityRay (reference
    lighting_passes/TraceVisibility.glsl semantics)."""
    from raytracer2_tpu.ops.traverse_bundle import (
        _bundle_bounds, sort_rays_for_coherence)
    from raytracer2_tpu.ops.cluster import bundle_cluster_overlap

    n_orig = origins.shape[0]
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n_orig,))
    t_max_a = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n_orig,))

    perm = sort_rays_for_coherence(origins, directions, scene_min, scene_max)
    inv_perm = jnp.argsort(perm)
    o = origins[perm]
    d = directions[perm]
    tn = t_min[perm]
    tx = t_max_a[perm]

    pad = (-n_orig) % bundle_size
    if pad:
        o = jnp.concatenate([o, jnp.zeros((pad, 3))])
        d = jnp.concatenate(
            [d, jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (pad, 1))])
        tn = jnp.concatenate([tn, jnp.zeros((pad,))])
        tx = jnp.concatenate([tx, jnp.full((pad,), -1.0)])
    n = o.shape[0]
    b = n // bundle_size
    p = bundle_size

    tn2 = tn.reshape(-1, 1, p)
    tx2 = tx.reshape(-1, 1, p)
    o_min, o_max, inv_lo, inv_hi, bundle_tmax = _bundle_bounds(
        o, d, tx, bundle_size)
    may_hit, t_enter = bundle_cluster_overlap(
        o_min, o_max, inv_lo, inv_hi, bundle_tmax,
        clusters.aabb_min, clusters.aabb_max)
    entry = jnp.where(may_hit, jnp.maximum(t_enter, 0.0), jnp.inf)
    order = jnp.argsort(entry, axis=-1)
    cand_t = jnp.take_along_axis(entry, order, axis=-1)
    cand_idx = order.astype(jnp.int32)
    cand_count = jnp.sum(jnp.isfinite(cand_t), axis=-1).astype(jnp.int32)

    wald = _wald_rows(clusters)
    w3 = wald.shape[-1]
    k = cand_idx.shape[1]
    kp = ((k + 8 * LANE_PAD - 1) // (8 * LANE_PAD)) * (8 * LANE_PAD)
    if kp != k:
        cand_idx = jnp.pad(cand_idx, ((0, 0), (0, kp - k)))
        cand_t = jnp.pad(cand_t, ((0, 0), (0, kp - k)),
                         constant_values=jnp.inf)
    cand_idx = cand_idx.reshape(b, 8, kp // 8)
    cand_t = cand_t.reshape(b, 8, kp // 8)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((p, 3), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p, 3), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, p), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, p), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, p), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.SMEM((8, kp // 8), jnp.int32),
            pltpu.SMEM((8, kp // 8), jnp.float32),
            pltpu.VMEM((4, 16, w3), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    (hit,) = pl.pallas_call(
        _occlude_kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((b, 1, p), jnp.int32)],
        interpret=interpret,
    )(cand_count, o, d, tn2, tx2, cand_idx, cand_t, wald)
    return hit.reshape(n)[:n_orig][inv_perm].astype(jnp.bool_)


@partial(jax.jit, static_argnames=("bundle_size", "interpret"))
def closest_hit_bundle_pallas(
    clusters: Clusters,
    tri_geometry: jax.Array,
    tri_primitive: jax.Array,
    origins: jax.Array,  # [N, 3]
    directions: jax.Array,
    t_min,
    t_max,
    scene_min: jax.Array,
    scene_max: jax.Array,
    bundle_size: int = 128,
    interpret: bool = False,
) -> HitRecord:
    """Closest-hit via the Pallas walk. Rays are sorted for coherence and
    culled per bundle exactly like ops/traverse_bundle (same candidate
    lists); only the walk itself runs in-kernel."""
    from raytracer2_tpu.ops.traverse_bundle import (
        _bundle_bounds, sort_rays_for_coherence)
    from raytracer2_tpu.ops.cluster import bundle_cluster_overlap

    n_orig = origins.shape[0]
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n_orig,))
    t_max_a = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n_orig,))

    perm = sort_rays_for_coherence(origins, directions, scene_min, scene_max)
    inv_perm = jnp.argsort(perm)
    o = origins[perm]
    d = directions[perm]
    tn = t_min[perm]
    tx = t_max_a[perm]

    pad = (-n_orig) % bundle_size
    if pad:
        o = jnp.concatenate([o, jnp.zeros((pad, 3))])
        d = jnp.concatenate(
            [d, jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (pad, 1))])
        tn = jnp.concatenate([tn, jnp.zeros((pad,))])
        tx = jnp.concatenate([tx, jnp.full((pad,), -1.0)])
    n = o.shape[0]
    b = n // bundle_size

    tn2 = tn.reshape(-1, 1, bundle_size)
    tx2 = tx.reshape(-1, 1, bundle_size)
    o_min, o_max, inv_lo, inv_hi, bundle_tmax = _bundle_bounds(
        o, d, tx, bundle_size)
    may_hit, t_enter = bundle_cluster_overlap(
        o_min, o_max, inv_lo, inv_hi, bundle_tmax,
        clusters.aabb_min, clusters.aabb_max)
    entry = jnp.where(may_hit, jnp.maximum(t_enter, 0.0), jnp.inf)
    order = jnp.argsort(entry, axis=-1)
    cand_t = jnp.take_along_axis(entry, order, axis=-1)
    cand_idx = order.astype(jnp.int32)
    cand_count = jnp.sum(jnp.isfinite(cand_t), axis=-1).astype(jnp.int32)

    wald = _wald_rows(clusters)
    w3 = wald.shape[-1]
    k = cand_idx.shape[1]
    p = bundle_size

    # candidate rows as [B, 8, kp/8]: DMA-sliceable (8-aligned leading dim,
    # lane-multiple rows)
    kp = ((k + 8 * LANE_PAD - 1) // (8 * LANE_PAD)) * (8 * LANE_PAD)
    if kp != k:
        cand_idx = jnp.pad(cand_idx, ((0, 0), (0, kp - k)))
        cand_t = jnp.pad(cand_t, ((0, 0), (0, kp - k)),
                         constant_values=jnp.inf)
    cand_idx_flat = cand_idx  # [B, kp] view for the final triangle gather
    cand_idx = cand_idx.reshape(b, 8, kp // 8)
    cand_t = cand_t.reshape(b, 8, kp // 8)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # cand_count
        grid=(b,),
        in_specs=[
            pl.BlockSpec((p, 3), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),  # o
            pl.BlockSpec((p, 3), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),  # d
            pl.BlockSpec((1, 1, p), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),  # t_min
            pl.BlockSpec((1, 1, p), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),  # t_max
            pl.BlockSpec(memory_space=pltpu.ANY),  # cand_idx (HBM)
            pl.BlockSpec(memory_space=pltpu.ANY),  # cand_t (HBM)
            pl.BlockSpec(memory_space=pltpu.ANY),  # wald (HBM, manual DMA)
        ],
        out_specs=[
            pl.BlockSpec((1, 1, p), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(5)
        ],
        scratch_shapes=[
            pltpu.SMEM((8, kp // 8), jnp.int32),
            pltpu.SMEM((8, kp // 8), jnp.float32),
            pltpu.VMEM((4, 16, w3), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    t_flat, u_flat, v_flat, k_flat, slot_flat = pl.pallas_call(
        _walk_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, p), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, p), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, p), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, p), jnp.int32),
            jax.ShapeDtypeStruct((b, 1, p), jnp.int32),
        ],
        interpret=interpret,
    )(cand_count, o, d, tn2, tx2, cand_idx, cand_t, wald)
    t_flat, u_flat, v_flat, k_flat, slot_flat = (
        x.reshape(n) for x in (t_flat, u_flat, v_flat, k_flat, slot_flat))

    # map (bundle, candidate k, slot) -> original triangle
    bundle_of_ray = jnp.arange(n) // p
    missed = k_flat < 0
    ci = cand_idx_flat[bundle_of_ray, jnp.maximum(k_flat, 0)]
    slot3 = jnp.maximum(slot_flat, 0)
    tri = jnp.where(missed, -1, clusters.tri_index[ci, jnp.minimum(
        slot3, clusters.cluster_size - 1)])
    # padded wald columns beyond the real cluster never hit (zero transform),
    # so slot < cluster_size always holds for hits

    # undo the coherence sort (padding sits at the end, slice first)
    t_r = t_flat[:n_orig][inv_perm]
    u_r = u_flat[:n_orig][inv_perm]
    v_r = v_flat[:n_orig][inv_perm]
    tri_r = tri[:n_orig][inv_perm]
    missed_r = tri_r < 0

    safe = jnp.maximum(tri_r, 0)
    geom = jnp.where(missed_r, INVALID_INDEX,
                     tri_geometry[safe].astype(jnp.uint32))
    prim = jnp.where(missed_r, jnp.uint32(0),
                     tri_primitive[safe].astype(jnp.uint32))
    return HitRecord(
        t=jnp.where(missed_r, t_max_a, t_r), u=u_r, v=v_r,
        geometry_index=geom, primitive_id=prim, triangle_index=tri_r)
