"""Pair-sweep traversal engine: per-ray-exact (ray, supercluster) pairs
swept by a Pallas kernel with scalar-prefetch block indexing.

The round-3 postmortem (README, VERDICT r3 #2): the bundle walk's SIMD
candidate UNION taxes incoherent rays ~12x (a 256-ray bundle's union is
~240 clusters vs ~20 for any single ray), while the XLA scatter engine
(ops/traverse_scatter.py) is per-ray-tight but dies on dispatch - its
HBM-bounded `lax.map` sweep degenerates into thousands of sequential ~3 ms
steps and materializes [chunk, 16, W] Wald gathers in HBM (measured 12.6 s
vs the bundle's 388 ms on the ladder brdf class). This engine keeps the
scatter formulation's exactness and moves the sweep INSIDE one Pallas
program:

1. slab-test every ray against every supercluster AABB (exact, dense);
2. per-ray `k_cand` nearest superclusters (entry-ranked top_k), one global
   sort of the (ray, sc) pairs by supercluster, gather-only padded binning
   into P-ray blocks (the proven traverse_scatter layout);
3. ONE pallas_call over all pair blocks: the block's supercluster id is a
   scalar-prefetch argument, so the [16, W] Wald block rides the automatic
   pipeline straight HBM->VMEM (the index_map picks the supercluster row;
   consecutive blocks of the same supercluster elide the re-fetch) - no
   HBM-materialized gathers, no per-chunk dispatch;
4. per-pair packed winner keys ((t bits & ~SLOT_MASK) | lane slot) reduce
   back per ray with one scatter-min; the winner decodes through the SAME
   [C*S_pad, 16] meta-row table + 12-FMA exact (t, u, v) re-evaluation as
   the bundle engine (ops/pallas_traverse._tri_meta).

Coherence-independent by construction: bounce rays cost the same as
primaries. Replaces traceRayEXT's secondary-ray cost (reference
src/shaders/lighting_passes/brdf_rays.rgen:19); the recorded bar this
engine must clear is the bundle engine's 388 ms / 2.07 M brdf rays at
ladder scale (scripts/scatter_ab.py r3).

Capacity contract: per-ray candidates truncate at `k_cand` nearest
superclusters and the pair pool is worst-case sized (n * k_cand plus one
padding block per supercluster), so the only truncation hazard is a ray
overlapping more than k_cand superclusters; `overflowed` reports it and
closest_hit_pairs/occluded_pairs re-trace the whole batch through the
bundle engine under lax.cond when it fires (exact by construction,
costs nothing otherwise).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracer2_tpu.ops.cluster import Clusters
from raytracer2_tpu.ops.intersect import INVALID_INDEX, HitRecord
from raytracer2_tpu.ops.pallas_traverse import (
    _intersect_block, _s_pad, _tri_meta, _wald_sc_rows)

PAIR_P = 128  # rays per pair block (one grid step)
MISS_KEY = 0x7F000000  # bits of ~1.7e38: above any real hit key


class PairScene(NamedTuple):
    """Per-scene tables for the pair engine (built once by make_tracers)."""

    sc_min: jax.Array  # [C2, 3] supercluster AABB minima
    sc_max: jax.Array  # [C2, 3]
    wald_sc: jax.Array  # [C2, 16, W] member-major Wald rows (W = m * S_pad)
    meta_rows: jax.Array  # [C * S_pad, 16] winner-code decode table
    group: int  # clusters per supercluster (m)
    s_pad: int

    @property
    def num_superclusters(self) -> int:
        return self.sc_min.shape[0]

    @property
    def lanes(self) -> int:  # W
        return self.wald_sc.shape[-1]


def build_pair_scene(clusters: Clusters, tri_geometry, tri_primitive,
                     group: int = 16) -> PairScene:
    """Regroup clusters into superclusters of `group`, all in jnp (no
    device->host readbacks: scene build must stay transfer-free on this
    box's TPU relay, VERDICT r3 weak #1)."""
    c = clusters.num_clusters
    sp = _s_pad(clusters)
    assert group * sp <= 2048, "pair keys carry the lane slot in 11 bits"
    pad = (-c) % group
    amin = clusters.aabb_min
    amax = clusters.aabb_max
    if pad:
        amin = jnp.concatenate(
            [amin, jnp.full((pad, 3), 1e30, jnp.float32)])
        amax = jnp.concatenate(
            [amax, jnp.full((pad, 3), -1e30, jnp.float32)])
    c2 = (c + pad) // group
    sc_min = amin.reshape(c2, group, 3).min(axis=1)
    sc_max = amax.reshape(c2, group, 3).max(axis=1)
    return PairScene(
        sc_min=sc_min,
        sc_max=sc_max,
        wald_sc=_wald_sc_rows(clusters, group),  # pads C -> c2 * group
        meta_rows=_tri_meta(clusters, tri_geometry, tri_primitive),
        group=group,
        s_pad=sp,
    )


def _slot_mask(w: int) -> int:
    bits = max((w - 1).bit_length(), 1)
    return (1 << bits) - 1


def _pair_kernel(block_sc_ref, block_live_ref, rays_ref, wald_ref, out_ref):
    """One grid step = one P-ray block vs one supercluster's W triangles.
    rays_ref [P, 8] (ox oy oz dx dy dz tn tx; dead pairs carry tx < 0),
    wald_ref [1, 16, W] (auto-pipelined via the scalar-prefetched
    supercluster id), out [1, 1, P] packed winner keys."""
    i = pl.program_id(0)
    p = rays_ref.shape[0]
    w_lanes = wald_ref.shape[-1]
    slot_mask = _slot_mask(w_lanes)
    slot_iota = jax.lax.broadcasted_iota(jnp.int32, (p, w_lanes), 1)

    @pl.when(block_live_ref[i] > 0)
    def _():
        rt = rays_ref[...]
        t, uu, vv, valid = _intersect_block(wald_ref[0], rt)
        hit = (valid & (uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0)
               & (t > rt[:, 6:7]) & (t < rt[:, 7:8]))
        key = jnp.where(
            hit,
            (pltpu.bitcast(t, jnp.int32) & ~slot_mask) | slot_iota,
            jnp.int32(MISS_KEY))
        out_ref[0, 0, :] = jnp.min(key, axis=-1)

    @pl.when(block_live_ref[i] == 0)
    def _():
        out_ref[0, 0, :] = jnp.full((p,), MISS_KEY, jnp.int32)


def _sweep_pairs(ps: PairScene, rays8_pairs, block_sc, block_live,
                 interpret: bool):
    """All pair blocks through one pallas_call. rays8_pairs [nblk*P, 8],
    block_sc/block_live [nblk]; returns [nblk * P] i32 keys."""
    nblk = block_sc.shape[0]
    p = PAIR_P
    w = ps.lanes
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # block_sc, block_live
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((p, 8), lambda i, bsc, lv: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 16, w), lambda i, bsc, lv: (bsc[i], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, p), lambda i, bsc, lv: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        _pair_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nblk, 1, p), jnp.int32),
        interpret=interpret,
    )(block_sc, block_live, rays8_pairs, ps.wald_sc)
    return out.reshape(nblk * p)


def _bin_pairs(ps: PairScene, origins, directions, t_min, t_max,
               k_cand: int):
    """Exact cull + gather-only binning (traverse_scatter layout): returns
    (pair_ray [tp], block_sc [nblk], block_live [nblk], overflow)."""
    n = origins.shape[0]
    c2 = ps.num_superclusters
    p = PAIR_P
    k = min(k_cand, c2)

    eps = 1e-12
    d_safe = jnp.where(jnp.abs(directions) < eps,
                       jnp.where(directions >= 0, eps, -eps), directions)
    inv = 1.0 / d_safe
    t0 = (ps.sc_min[None] - origins[:, None]) * inv[:, None]
    t1 = (ps.sc_max[None] - origins[:, None]) * inv[:, None]
    near = jnp.max(jnp.minimum(t0, t1), axis=-1)  # [n, C2]
    far = jnp.min(jnp.maximum(t0, t1), axis=-1)
    mask = ((near <= far) & (far >= t_min[:, None])
            & (near <= t_max[:, None]) & (t_max >= 0.0)[:, None])
    entry = jnp.where(mask, jnp.maximum(near, 0.0), jnp.inf)

    overflow = jnp.any(jnp.sum(mask, axis=-1) > k)

    neg_entry, cand_sc = jax.lax.top_k(-entry, k)  # [n, K] nearest-first
    cand_live = jnp.isfinite(neg_entry)

    flat_sc = jnp.where(cand_live, cand_sc, c2).astype(jnp.uint32).reshape(-1)
    order = jnp.argsort(flat_sc)
    sorted_sc = flat_sc[order]
    sorted_ray = (jnp.arange(n * k, dtype=jnp.int32) // k)[order]

    count_sc = jnp.bincount(jnp.minimum(sorted_sc, c2), length=c2 + 1)[:c2]
    base_sc = jnp.concatenate(
        [jnp.zeros((1,), count_sc.dtype), jnp.cumsum(count_sc)[:-1]])
    padded_sc = ((count_sc + p - 1) // p) * p
    padded_cum = jnp.cumsum(padded_sc)
    padded_base = padded_cum - padded_sc
    total_needed = padded_cum[-1] if c2 else 0

    tp = ((n * k + c2 * p) // p) * p  # static worst-case pool
    slots = jnp.arange(tp, dtype=jnp.int32)
    slot_sc = jnp.searchsorted(padded_cum, slots,
                               side="right").astype(jnp.int32)
    slot_sc = jnp.minimum(slot_sc, c2 - 1)
    src = slots - padded_base[slot_sc] + base_sc[slot_sc].astype(jnp.int32)
    in_range = (slots < total_needed) & (
        src < (base_sc[slot_sc] + count_sc[slot_sc]).astype(jnp.int32))
    src = jnp.clip(src, 0, n * k - 1)
    pair_ray = jnp.where(in_range, sorted_ray[src], -1)

    block_sc = slot_sc.reshape(-1, p)[:, 0]
    # a block is live iff its FIRST slot is (padded slots trail the live
    # ones within each supercluster's region)
    block_live = in_range.reshape(-1, p)[:, 0].astype(jnp.int32)
    return pair_ray, block_sc, block_live, overflow


def _trace_pairs_batch(ps: PairScene, origins, directions, t_min, t_max,
                       k_cand: int, interpret: bool):
    """One ray batch: returns (winner code [n] i32 with 0x7FFFFFFF = miss,
    best key [n], overflow)."""
    n = origins.shape[0]
    pair_ray, block_sc, block_live, overflow = _bin_pairs(
        ps, origins, directions, t_min, t_max, k_cand)
    tp = pair_ray.shape[0]
    live = pair_ray >= 0
    safe_ray = jnp.maximum(pair_ray, 0)

    # per-pair ray records in pair order (ONE [tp, 8] row gather); dead
    # pairs get t_max = -1 so the kernel can never hit them
    rays8 = jnp.concatenate(
        [origins, directions, t_min[:, None], t_max[:, None]], axis=1)
    rays8_pairs = rays8[safe_ray]
    rays8_pairs = jnp.where(live[:, None], rays8_pairs,
                            jnp.asarray([0, 0, 0, 0, 0, 1, 0, -1.0],
                                        jnp.float32)[None])

    keys = _sweep_pairs(ps, rays8_pairs, block_sc, block_live, interpret)

    big = jnp.int32(0x7FFFFFFF)
    keys = jnp.where(live, keys, big)
    best_key = jnp.full((n,), big, jnp.int32).at[safe_ray].min(
        keys, mode="drop")

    # winner pair -> global code (cluster * S_pad + lane slot): lane slot
    # rides the key's low bits, the supercluster comes from the pair's block
    w = ps.lanes
    slot_mask = _slot_mask(w)
    pair_code = (jnp.repeat(block_sc, PAIR_P) * w
                 + (keys & slot_mask))
    win = live & (keys < big) & (keys == best_key[safe_ray])
    code = jnp.full((n,), big, jnp.int32).at[safe_ray].min(
        jnp.where(win, pair_code, big), mode="drop")
    code = jnp.where(best_key >= jnp.int32(MISS_KEY), big, code)
    return code, best_key, overflow


@partial(jax.jit, static_argnames=("k_cand", "ray_batch", "interpret",
                                   "fallback", "with_overflow"))
def closest_hit_pairs(
    ps: PairScene,
    clusters: Clusters,
    tri_geometry: jax.Array,
    tri_primitive: jax.Array,
    origins: jax.Array,
    directions: jax.Array,
    t_min,
    t_max,
    scene_min: jax.Array,
    scene_max: jax.Array,
    k_cand: int = 24,
    ray_batch: int = 262144,
    interpret: bool = False,
    fallback: bool = True,
    with_overflow: bool = False,
) -> HitRecord:
    """Closest-hit through the pair sweep. Returns the rayhit.rchit payload
    contract (t, u, v, geometry, primitive; reference
    src/shaders/common.glsl:23-28)."""
    n = origins.shape[0]
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))
    t_max_a = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))

    batch = min(ray_batch, n)
    pad = (-n) % batch
    o = jnp.concatenate([origins, jnp.zeros((pad, 3))]) if pad else origins
    d = (jnp.concatenate(
        [directions, jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (pad, 1))])
        if pad else directions)
    tn = jnp.concatenate([t_min, jnp.zeros((pad,))]) if pad else t_min
    tx = (jnp.concatenate([t_max_a, jnp.full((pad,), -1.0)])
          if pad else t_max_a)
    nb = o.shape[0] // batch

    def one(args):
        oo, dd, tnn, txx = args
        code, _, ovf = _trace_pairs_batch(
            ps, oo, dd, tnn, txx, k_cand, interpret)
        return code, ovf

    if nb == 1:
        code, ovf = one((o, d, tn, tx))
        overflow = ovf
    else:
        code, ovf = jax.lax.map(
            one, (o.reshape(nb, batch, 3), d.reshape(nb, batch, 3),
                  tn.reshape(nb, batch), tx.reshape(nb, batch)))
        code = code.reshape(-1)
        overflow = jnp.any(ovf)
    code = code[:n]

    # winner decode + exact re-evaluation (the bundle engine's tail):
    # one [n, 16] meta-row gather, 12 FMAs
    big = jnp.int32(0x7FFFFFFF)
    missed = code == big
    meta = ps.meta_rows[jnp.where(missed, 0, code)]
    tri_r = jnp.where(missed, -1, meta[:, 12])
    geom_r = jnp.where(missed, -1, meta[:, 13])
    prim_r = jnp.where(missed, 0, meta[:, 14])

    wf = jax.lax.bitcast_convert_type(meta[:, 0:12], jnp.float32)
    on, dn = origins, directions
    op_u = (wf[:, 0] * on[:, 0] + wf[:, 3] * on[:, 1]
            + wf[:, 6] * on[:, 2] + wf[:, 9])
    op_v = (wf[:, 1] * on[:, 0] + wf[:, 4] * on[:, 1]
            + wf[:, 7] * on[:, 2] + wf[:, 10])
    op_z = (wf[:, 2] * on[:, 0] + wf[:, 5] * on[:, 1]
            + wf[:, 8] * on[:, 2] + wf[:, 11])
    dp_u = (wf[:, 0] * dn[:, 0] + wf[:, 3] * dn[:, 1]
            + wf[:, 6] * dn[:, 2])
    dp_v = (wf[:, 1] * dn[:, 0] + wf[:, 4] * dn[:, 1]
            + wf[:, 7] * dn[:, 2])
    dzv = (wf[:, 2] * dn[:, 0] + wf[:, 5] * dn[:, 1]
           + wf[:, 8] * dn[:, 2])
    t_r = -op_z / jnp.where(dzv == 0.0, 1.0, dzv)
    u_r = op_u + t_r * dp_u
    v_r = op_v + t_r * dp_v
    missed_r = tri_r < 0

    rec = HitRecord(
        t=jnp.where(missed_r, t_max_a, t_r),
        u=jnp.where(missed_r, 0.0, u_r),
        v=jnp.where(missed_r, 0.0, v_r),
        geometry_index=jnp.where(missed_r, INVALID_INDEX,
                                 geom_r.astype(jnp.uint32)),
        primitive_id=jnp.where(missed_r, jnp.uint32(0),
                               prim_r.astype(jnp.uint32)),
        triangle_index=tri_r)

    if fallback:
        from raytracer2_tpu.ops.pallas_traverse import \
            closest_hit_bundle_pallas

        def _fix():
            return closest_hit_bundle_pallas(
                clusters, tri_geometry, tri_primitive, origins, directions,
                t_min, t_max_a, scene_min, scene_max,
                interpret=interpret)

        rec = jax.lax.cond(overflow, _fix, lambda: rec)
    if with_overflow:
        return rec, overflow
    return rec


@partial(jax.jit, static_argnames=("k_cand", "ray_batch", "interpret",
                                   "fallback"))
def occluded_pairs(
    ps: PairScene,
    clusters: Clusters,
    origins: jax.Array,
    directions: jax.Array,
    t_min,
    t_max,
    scene_min: jax.Array,
    scene_max: jax.Array,
    k_cand: int = 24,
    ray_batch: int = 262144,
    interpret: bool = False,
    fallback: bool = True,
) -> jax.Array:
    """Any-hit visibility through the pair sweep: True where blocked."""
    n = origins.shape[0]
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))
    t_max_a = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))

    batch = min(ray_batch, n)
    pad = (-n) % batch
    o = jnp.concatenate([origins, jnp.zeros((pad, 3))]) if pad else origins
    d = (jnp.concatenate(
        [directions, jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (pad, 1))])
        if pad else directions)
    tn = jnp.concatenate([t_min, jnp.zeros((pad,))]) if pad else t_min
    tx = (jnp.concatenate([t_max_a, jnp.full((pad,), -1.0)])
          if pad else t_max_a)
    nb = o.shape[0] // batch

    def one(args):
        oo, dd, tnn, txx = args
        _, best_key, ovf = _trace_pairs_batch(
            ps, oo, dd, tnn, txx, k_cand, interpret)
        return best_key < jnp.int32(MISS_KEY), ovf

    if nb == 1:
        blocked, overflow = one((o, d, tn, tx))
    else:
        blocked, ovf = jax.lax.map(
            one, (o.reshape(nb, batch, 3), d.reshape(nb, batch, 3),
                  tn.reshape(nb, batch), tx.reshape(nb, batch)))
        blocked = blocked.reshape(-1)
        overflow = jnp.any(ovf)
    blocked = blocked[:n]

    if fallback:
        from raytracer2_tpu.ops.pallas_traverse import \
            occluded_bundle_pallas

        def _fix():
            return occluded_bundle_pallas(
                clusters, origins, directions, t_min, t_max_a,
                scene_min, scene_max, interpret=interpret)

        blocked = jax.lax.cond(overflow, _fix, lambda: blocked)
    return blocked
