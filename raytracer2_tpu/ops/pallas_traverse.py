"""Pallas traversal kernels: exact per-ray culling + grouped candidate walk.

The XLA bundle walk (ops/traverse_bundle.py) runs all bundles in lockstep —
every while_loop step pays for every bundle, so one deep bundle stalls the
whole batch, and each step is a chain of XLA ops with dispatch overhead.
This kernel moves the walk INSIDE a Pallas program, one grid step per
bundle. Two generations of candidate generation exist:

- cull="interval" (round 1): conservative interval-arithmetic frustum test
  per bundle (ops/cluster.py bundle_cluster_overlap). Cheap, but the
  interval test collapses for incoherent bundles (direction intervals span
  zero -> every cluster is a candidate: measured 147 candidates/bundle for
  random rays on an 18.5k-tri corridor where the EXACT per-ray overlap is
  1.8 clusters).
- cull="exact": every ray is slab-tested exactly against every
  cluster AABB (dense [rays, C] VPU map, chunked), rays are sorted by their
  NEAREST overlapped cluster id (morton tiebreak) so that bundles share
  candidates, and the per-bundle candidate list is the exact UNION of
  member overlaps ranked nearest-first by lax.top_k. Measured on the
  corridor: 147 -> ~20 candidates/bundle for incoherent rays, and miss
  rays (sky) compact into empty bundles the kernel skips in ~1 us.
- cull="exact_iv" (MEASURED NEGATIVE, kept for A/B): exact per-ray sort
  key, but the per-bundle union from the conservative INTERVAL test over
  all clusters (no dense second pass, no truncation). Hardware numbers
  (260k-tri ladder, r3): incoherent rays 4.6 s vs 0.40 s for "exact" —
  even exact-sorted bundles span enough direction spread that the
  interval inverse collapses; and 2.2x slower on coherent Z-tile
  primaries (the frustum interval widens with distance, so candidate
  lists bloat and entry ranking degrades). The per-ray exact union is
  load-bearing; do not swap it out for the cheap bundle test.
- cull="hier" (EXPERIMENTAL, not reachable from "auto"): two-level version
  of "exact" — the dense per-ray pass runs against C/m_super supercluster
  AABBs, then only clusters inside a bundle's k_sc nearest superclusters
  are refined exactly. ~k_sc*m_super/C of the dense cull cost, BUT the
  per-bundle k_sc truncation measured 3-10% false misses on a 260k-tri
  scene (incoherent bundles overlap more SCs than any fixed k_sc): keep
  off the default path until a per-bundle overflow fallback exists.
- cull="sc" (MEASURED NEGATIVE, kept for A/B): supercluster-walk — dense
  cull against C/m_super SC AABBs only, full-length per-bundle SC-union
  lists (no truncation -> zero false misses, hardware-verified exact),
  SC-contiguous Wald layout so each walk step is ONE contiguous DMA.
  Ladder hardware numbers (260k tris, r3): pri-z 5.0 vs 12.7 Mr/s,
  incoherent 1.1 vs 5.2 for "exact". Root cause: per-bundle union
  INFLATION, not the dense cull — an incoherent 256-ray bundle's cluster
  union (~240) is already ~12x any single ray's overlap set (~20), and
  SC granularity walks ~8x more geometry on top. The dense [rays, C]
  pass is ~20% of the trace at C=3072; the walk's Wald lane work is the
  wall, so candidate TIGHTNESS beats cull asymptotics at this scale.
- cull="auto" (default): "exact" (correct at every size).

Kernel structure (per grid step = one bundle):

- the bundle's rays sit in VMEM, candidate cluster ids + entry distances in
  SMEM (one small HBM->SMEM copy per bundle);
- cluster Wald blocks are DMA'd from HBM on demand, multi-buffered so the
  fetch of group g+d overlaps the intersection of group g;
- GROUPED walk: each loop step intersects the bundle against `group`
  clusters at once ([P, group*S_pad] lanes) — the per-step fixed cost
  (loop bookkeeping, packed-key reduce, DMA waits) measured ~0.9 us on
  v5e, far above the ~0.1 us of VPU compute, so wider steps are the main
  throughput lever;
- the walk terminates per bundle the moment the next group's best entry
  distance exceeds the bundle's worst committed hit;
- winner tracking is a packed min-reduce per step: for t >= 0 the IEEE
  bit pattern is monotone, so key = (bitcast(t) & ~SLOT_MASK) | slot orders
  first by t (low mantissa bits dropped) then by slot; the winning lane's
  EXACT (t, u, v) and its cluster id are then extracted in-kernel with
  equality-masked min-reduces (r3: this replaced a host-side [rays, 12]
  Wald-row gather + re-evaluation that cost ~half the trace time — [2M]
  -scale gathers are the most expensive op class on TPU).

The kernel returns (key, cluster, t, u, v) per ray; the host maps
(cluster, key slot) to (triangle, geometry, primitive) with ONE packed
[rays, 4] row gather from a precomputed per-slot table. Correctness is
validated against the brute-force oracle in interpret mode and on hardware
by tests/test_bvh.py::TestPallasTracer.

Replaces traceRayEXT / create_acceleration_structure of the reference
(/root/reference/src/context.rs:824) — the reference gets traversal from
RT cores; this kernel is the TPU rebuild of that fixed-function unit.

Mosaic gotchas encoded here (hard-won, do not "simplify" away):
- DMA slices need 8-aligned leading dims + 128-lane rows (candidate rows as
  [8, K/8], Wald rows padded 12 -> 16);
- 1D kernel operands get XLA layout T(1024) vs Mosaic T(128) — pass [B,1,P]
  with (1,1,P) blocks;
- no i1 vectors through while_loop carries (use int32);
- an early exit that leaves a prefetch DMA un-waited corrupts semaphores
  across grid steps and ABORTS the device — always drain after the loop;
- bitcast has no 1D form — bounce [P] vectors through [1, P].
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracer2_tpu.ops import pallas_cull as pcull
from raytracer2_tpu.ops.cluster import Clusters, bundle_cluster_overlap
from raytracer2_tpu.ops.intersect import INVALID_INDEX, HitRecord

LANE_PAD = 128  # pad the per-cluster triangle count to a lane multiple

SLOT_BITS = 10  # group*S_pad <= 1024; low key bits carry the winning slot
SLOT_MASK = (1 << SLOT_BITS) - 1
MISS_KEY = 0x7F000000  # bits of ~1.7e38: above any real hit key

CULL_CHUNK_BYTES = 48 << 20  # bound on the [rays, C] cull intermediates


def _s_pad(clusters: Clusters) -> int:
    s = clusters.cluster_size
    return ((s + LANE_PAD - 1) // LANE_PAD) * LANE_PAD


def _wald_rows(clusters: Clusters) -> jax.Array:
    """Re-layout [C, 4, 3S] -> [C, 16, S_pad]: row (k*3 + c) holds transform
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


def _wald_rows_mm(clusters: Clusters) -> jax.Array:
    """Component-major twin of _wald_rows for the MXU intersect path:
    row (c*4 + k) holds transform input k (x, y, z, bias) of output
    component c, so rows [c*4:(c+1)*4] form the [4, S_pad] matrix of one
    affine and the kernel evaluates all six Wald affines as three
    [2P, 4] @ [4, W] dots on the MXU (_intersect_block_mm). Same
    [C, 16, S_pad] shape/DMA footprint as _wald_rows."""
    c, _, w3 = clusters.wald.shape
    s = w3 // 3
    sp = ((s + LANE_PAD - 1) // LANE_PAD) * LANE_PAD
    rows = (clusters.wald.reshape(c, 4, s, 3)
            .transpose(0, 3, 1, 2)  # [C, 3(c), 4(k), S]
            .reshape(c, 12, s))
    rows = jnp.pad(rows, ((0, 0), (0, 4), (0, sp - s)))
    return rows


def _wald_sc_rows(clusters: Clusters, m: int) -> jax.Array:
    """SC-contiguous Wald layout [SC, 16, m*S_pad]: supercluster s's m
    clusters sit side by side in the lane dimension, so ONE DMA per walk
    step fetches the whole supercluster (the per-candidate start/wait
    pairs are the walk's measured fixed cost). Padding clusters are
    all-zero transforms (d'_z == 0 -> never hit)."""
    rows = _wald_rows(clusters)  # [C, 16, S_pad]
    c, r, sp = rows.shape
    n_sc = (c + m - 1) // m
    rows = jnp.pad(rows, ((0, n_sc * m - c), (0, 0), (0, 0)))
    return (rows.reshape(n_sc, m, r, sp)
            .transpose(0, 2, 1, 3)
            .reshape(n_sc, r, m * sp))


def _tri_meta(clusters: Clusters, tri_geometry, tri_primitive) -> jax.Array:
    """[C*S_pad, 16] i32 rows addressed by cluster * S_pad + slot:
    [0:12] the triangle's 12 Wald coefficients (bitcast f32, row order
    k*3+m as in _wald_rows), [12:15] (tri, geometry, primitive), [15]
    pad. ONE row gather turns the kernel's winner code into both the
    rayhit.rchit payload ids AND the data to re-evaluate the winner's
    exact (t, u, v) on the host — so the kernel's inner loop carries no
    per-step t/u/v extraction reduces (r3.2: the five masked min-reduces
    per step were ~a third of the walk's lane work)."""
    c, s = clusters.tri_index.shape
    sp = _s_pad(clusters)
    tri = clusters.tri_index
    safe = jnp.maximum(tri, 0)
    geom = jnp.where(tri >= 0, tri_geometry[safe].astype(jnp.int32), -1)
    prim = jnp.where(tri >= 0, tri_primitive[safe].astype(jnp.int32), 0)
    meta = jnp.stack([tri, geom, prim, jnp.zeros_like(tri)], axis=-1)
    if sp != s:
        pad = jnp.broadcast_to(
            jnp.asarray([-1, -1, 0, 0], jnp.int32), (c, sp - s, 4))
        meta = jnp.concatenate([meta, pad], axis=1)
    wald = _wald_rows(clusters)  # [C, 16, S_pad]; rows 0:12 = coeffs
    coeff = jax.lax.bitcast_convert_type(
        wald[:, :12, :].transpose(0, 2, 1), jnp.int32)  # [C, S_pad, 12]
    return jnp.concatenate([coeff, meta], axis=-1).reshape(c * sp, 16)


def _apply_permutation(perm, arrays_3, arrays_1):
    """Permute rays with ONE row gather: [N,3] x2 + [N] x2 pack into [N,8]
    (three separate [N,3] gathers measured 3.3x slower than one [N,8])."""
    packed = jnp.concatenate(
        [a for a in arrays_3]
        + [a[:, None] for a in arrays_1], axis=1)
    packed = packed[perm]
    n3 = len(arrays_3)
    outs3 = [packed[:, 3 * i:3 * i + 3] for i in range(n3)]
    outs1 = [packed[:, 3 * n3 + i] for i in range(len(arrays_1))]
    return outs3 + outs1


def _pad_rays(o, d, tn, tx, multiple):
    pad = (-o.shape[0]) % multiple
    if pad:
        o = jnp.concatenate([o, jnp.zeros((pad, 3))])
        d = jnp.concatenate(
            [d, jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (pad, 1))])
        tn = jnp.concatenate([tn, jnp.zeros((pad,))])
        tx = jnp.concatenate([tx, jnp.full((pad,), -1.0)])
    return o, d, tn, tx


def _entry_exact(o, d, tn, tx, amin, amax):
    """Exact per-ray slab test vs every cluster AABB: [n, C] conservative
    entry distance, +inf where the ray's [tn, tx] segment misses the box.
    Dead rays (tx < 0) get all-inf rows. Axes are unrolled by hand so every
    intermediate is rank-2 [n, C] — the broadcast [n, C, 3] form defeated
    XLA fusion and went HBM-bound (measured ~2x slower)."""
    eps = 1e-12
    ds = jnp.where(jnp.abs(d) < eps, jnp.where(d >= 0, eps, -eps), d)
    inv = 1.0 / ds  # [n, 3]
    near = jnp.full(o.shape[:1] + amin.shape[:1], -jnp.inf, jnp.float32)
    far = jnp.full(o.shape[:1] + amin.shape[:1], jnp.inf, jnp.float32)
    for ax in range(3):
        ia = inv[:, ax:ax + 1]
        oa = o[:, ax:ax + 1]
        t0 = (amin[None, :, ax] - oa) * ia  # [n, C]
        t1 = (amax[None, :, ax] - oa) * ia
        near = jnp.maximum(near, jnp.minimum(t0, t1))
        far = jnp.minimum(far, jnp.maximum(t0, t1))
    hit = ((near <= far) & (far >= tn[:, None]) & (near <= tx[:, None])
           & (tx >= 0.0)[:, None])
    return jnp.where(hit, jnp.maximum(near, 0.0), jnp.inf)


def _entry_exact_cap(o, d, tn, tx, amin, amax):
    """_entry_exact + per-ray hit cap: alongside the [n, C] entry
    distances, return each ray's farthest EXIT distance over the clusters
    it overlaps. Any committable hit's triangle lies inside some
    overlapped cluster's AABB, so its t can never exceed that cluster's
    far slab — min(t_max, cap) is a CORRECT tighter t_max. Rays
    overlapping nothing return -inf (they cannot hit anything and retire
    immediately). The cap is inflated by a relative epsilon downstream to
    absorb f32 rounding differences between the slab far and the Wald t."""
    eps = 1e-12
    ds = jnp.where(jnp.abs(d) < eps, jnp.where(d >= 0, eps, -eps), d)
    inv = 1.0 / ds  # [n, 3]
    near = jnp.full(o.shape[:1] + amin.shape[:1], -jnp.inf, jnp.float32)
    far = jnp.full(o.shape[:1] + amin.shape[:1], jnp.inf, jnp.float32)
    for ax in range(3):
        ia = inv[:, ax:ax + 1]
        oa = o[:, ax:ax + 1]
        t0 = (amin[None, :, ax] - oa) * ia  # [n, C]
        t1 = (amax[None, :, ax] - oa) * ia
        near = jnp.maximum(near, jnp.minimum(t0, t1))
        far = jnp.minimum(far, jnp.maximum(t0, t1))
    hit = ((near <= far) & (far >= tn[:, None]) & (near <= tx[:, None])
           & (tx >= 0.0)[:, None])
    entry = jnp.where(hit, jnp.maximum(near, 0.0), jnp.inf)
    cap = jnp.max(jnp.where(hit, far, -jnp.inf), axis=-1)
    return entry, cap


def _apply_t_cap(tx, cap):
    """Clamp per-ray t_max to the overlapped-cluster exit cap (see
    _entry_exact_cap). Epsilon-inflated so boundary hits survive f32
    rounding. Nothing-overlapped rays (cap = -inf) clamp to the finite
    -1.0 dead-ray convention — bits(-inf) | SLOT_MASK is a NaN pattern
    that would poison the kernel's max-reduce early-exit bound and kill
    the whole bundle's walk."""
    return jnp.minimum(tx, jnp.maximum(cap * 1.0001 + 1e-6, -1.0))


def _octz_sort_key(d, tx, scene_min, scene_max):
    """Dense-pass-free cull-order key for batches whose ARRIVAL order is
    already spatially coherent (e.g. shadow rays pre-gathered in pixel
    Z-curve order): direction octant | t_max bucket | arrival rank.
    Splitting same-tile rays by octant + ray length nearly halves the
    bundle-union walk work vs pure pixel order (measured 1552 -> 815
    steps on the corridor shadow class) at the cost of one [N] u32
    argsort — no per-ray dense pass, unlike the cand0 key."""
    n = d.shape[0]
    octant = ((d[:, 0] >= 0).astype(jnp.uint32)
              | ((d[:, 1] >= 0).astype(jnp.uint32) << 1)
              | ((d[:, 2] >= 0).astype(jnp.uint32) << 2))
    diag = jnp.linalg.norm(scene_max - scene_min)
    t_bucket = jnp.clip(
        (4.0 * tx / jnp.maximum(diag, 1e-12)).astype(jnp.uint32), 0, 3)
    rank = jnp.arange(n, dtype=jnp.uint32) & jnp.uint32((1 << 27) - 1)
    return (octant << 29) | (t_bucket << 27) | rank


def _cand0_sort_key(o, d, tn, tx, amin, amax, scene_min, scene_max,
                    use_kernel=False, interpret=False):
    """Per-ray sort key: [nearest exactly-overlapped box id | morton
    tiebreak]. Boxes are cluster AABBs (exact cull) or supercluster AABBs
    (hier cull). Rays that touch nothing key to C and compact into empty
    bundles the kernel skips; the morton tiebreak keeps same-box rays
    spatially grouped so 2nd/3rd candidates also shared.

    use_kernel=True computes the dense pass with the fused Pallas kernel
    (ops/pallas_cull.py) — identical argmin result. Hardware verdict:
    SLOWER (117 vs 80 ms at ladder scale, pallas_cull.py docstring);
    default off, kept for re-testing."""
    from raytracer2_tpu.ops.traverse_bundle import (
        _expand_bits)  # morton helper

    n = o.shape[0]
    c = amin.shape[0]
    if use_kernel and pcull.cull_kernel_fits(c):
        boxes = pcull.box_rows(amin, amax)
        cand0 = pcull.nearest_box_pallas(
            _pack_rays8(o, d, tn, tx), boxes, interpret=interpret)
        cand0 = jnp.minimum(cand0, c).astype(jnp.uint32)
    else:
        chunk = max(1024,
                    (CULL_CHUNK_BYTES // (4 * max(c, 1))) // 1024 * 1024)
        chunk = min(chunk, ((n + 1023) // 1024) * 1024)
        o_p, d_p, tn_p, tx_p = _pad_rays(o, d, tn, tx, chunk)

        def one(args):
            oo, dd, tnn, txx = args
            e = _entry_exact(oo, dd, tnn, txx, amin, amax)
            nearest = jnp.min(e, axis=-1)
            cand0 = jnp.argmin(e, axis=-1).astype(jnp.uint32)
            return jnp.where(jnp.isfinite(nearest), cand0, jnp.uint32(c))

        nb = o_p.shape[0] // chunk
        if nb == 1:
            cand0 = one((o_p, d_p, tn_p, tx_p))
        else:
            cand0 = jax.lax.map(
                one, (o_p.reshape(nb, chunk, 3), d_p.reshape(nb, chunk, 3),
                      tn_p.reshape(nb, chunk), tx_p.reshape(nb, chunk))
            ).reshape(-1)
        cand0 = cand0[:n]

    # tiebreak (t_max bucket | octant | origin morton): short rays bundle
    # together so bounded shadow batches don't inherit the long rays'
    # candidate unions (a no-op for uniform-t_max closest-hit batches —
    # one bucket); then direction octant + origin morton for coherence
    octant = ((d[:, 0] >= 0).astype(jnp.uint32)
              | ((d[:, 1] >= 0).astype(jnp.uint32) << 1)
              | ((d[:, 2] >= 0).astype(jnp.uint32) << 2))
    extent = jnp.maximum(scene_max - scene_min, 1e-12)
    diag = jnp.linalg.norm(scene_max - scene_min)
    q = jnp.clip((o - scene_min) / extent, 0.0, 0.999)
    ocell = (q * 32.0).astype(jnp.uint32)
    o_morton = (_expand_bits(ocell[:, 0], 5)
                | (_expand_bits(ocell[:, 1], 5) << 1)
                | (_expand_bits(ocell[:, 2], 5) << 2))
    t_bucket = jnp.clip(
        (4.0 * tx / jnp.maximum(diag, 1e-12)).astype(jnp.uint32), 0, 3)
    tie = (t_bucket << 18) | (octant << 15) | o_morton  # 20 bits

    bits_c = max((c + 1).bit_length(), 1)
    tie_bits = max(32 - bits_c, 0)
    if tie_bits >= 20:
        tie_part = tie << (tie_bits - 20)
    else:
        tie_part = tie >> (20 - tie_bits)
    return (cand0 << tie_bits) | tie_part


def _cand2_sort_key(o, d, tn, tx, amin, amax, scene_min, scene_max):
    """Richer bundle-composition key than cand0: the nearest TWO
    exactly-overlapped cluster ids (24 bits) | direction octant (3) |
    coarse origin morton (5). Rationale: three recorded A/Bs (okey, hier,
    sc4 — README r3) all showed bundle composition quality is worth far
    more than key-pass cost, and every prior variant made the key
    CHEAPER/coarser; this one makes it richer — rays sharing their two
    nearest clusters overlap most of their candidate sets, so the bundle
    union should tighten where the SIMD union tax lives.

    HARDWARE VERDICT (scripts/cand2_ab.py, ladder, r5): NEGATIVE on both
    counts. Composition does NOT improve — per-bundle union statistics
    are IDENTICAL to cand0 (mean 20.9 vs 21.1, p50 1, p95 120 at 128-ray
    bundles on the 262k-tri corridor): the cand0 key + octant + 15-bit
    origin morton already groups rays so well that the second-nearest id
    adds nothing. And the key pass is ~10x more expensive (jax.lax.top_k
    lowers to a full per-row sort on TPU; trace 3.62 s vs 0.32 s).
    Hit parity exact (1.000000 agreement). Kept as a tested, recorded
    data point; cand0 stays the default."""
    n = o.shape[0]
    c = amin.shape[0]
    chunk = max(1024,
                (CULL_CHUNK_BYTES // (4 * max(c, 1))) // 1024 * 1024)
    chunk = min(chunk, ((n + 1023) // 1024) * 1024)
    o_p, d_p, tn_p, tx_p = _pad_rays(o, d, tn, tx, chunk)

    def one(args):
        oo, dd, tnn, txx = args
        e = _entry_exact(oo, dd, tnn, txx, amin, amax)
        neg_t, ids = jax.lax.top_k(-e, 2)
        id0 = jnp.where(jnp.isfinite(neg_t[:, 0]),
                        ids[:, 0].astype(jnp.uint32), jnp.uint32(c))
        id1 = jnp.where(jnp.isfinite(neg_t[:, 1]),
                        ids[:, 1].astype(jnp.uint32), jnp.uint32(c))
        return id0, id1

    nb = o_p.shape[0] // chunk
    if nb == 1:
        id0, id1 = one((o_p, d_p, tn_p, tx_p))
    else:
        id0, id1 = jax.lax.map(
            one, (o_p.reshape(nb, chunk, 3), d_p.reshape(nb, chunk, 3),
                  tn_p.reshape(nb, chunk), tx_p.reshape(nb, chunk)))
        id0 = id0.reshape(-1)
        id1 = id1.reshape(-1)
    id0, id1 = id0[:n], id1[:n]

    from raytracer2_tpu.ops.traverse_bundle import _expand_bits

    octant = ((d[:, 0] >= 0).astype(jnp.uint32)
              | ((d[:, 1] >= 0).astype(jnp.uint32) << 1)
              | ((d[:, 2] >= 0).astype(jnp.uint32) << 2))
    extent = jnp.maximum(scene_max - scene_min, 1e-12)
    q = jnp.clip((o - scene_min) / extent, 0.0, 0.999)
    ocell = (q * 4.0).astype(jnp.uint32)  # 2 bits per axis -> 6, keep 5
    o_morton = (_expand_bits(ocell[:, 0], 2)
                | (_expand_bits(ocell[:, 1], 2) << 1)
                | (_expand_bits(ocell[:, 2], 2) << 2)) & jnp.uint32(0x1F)

    # id0 | OCTANT | id1 | morton: the octant must outrank id1 — rays
    # sharing their nearest cluster but pointing opposite ways must not
    # bundle (first cand2 A/B packed octant below id1 and lost 11x to
    # ballooned direction intervals)
    bits_c = max((c + 1).bit_length(), 1)  # <= 12 for C <= 4095
    if 2 * bits_c + 8 > 32:  # huge C: fall back to id0-only packing
        return (id0 << 8) | (octant << 5) | o_morton
    shift1 = 5
    shift_oct = shift1 + bits_c
    shift0 = shift_oct + 3
    return ((id0 << shift0) | (octant << shift_oct) | (id1 << shift1)
            | o_morton)


def _rank_rows(cand_idx, cand_t, b, kp):
    """Pad candidate lists to kp and lay them out as DMA-sliceable rows."""
    k = cand_idx.shape[1]
    if kp != k:
        cand_idx = jnp.pad(cand_idx, ((0, 0), (0, kp - k)))
        cand_t = jnp.pad(cand_t, ((0, 0), (0, kp - k)),
                         constant_values=jnp.inf)
    cand_idx_flat = cand_idx  # [B, kp] view for the final triangle gather
    return (cand_idx_flat, cand_idx.reshape(b, 8, kp // 8),
            cand_t.reshape(b, 8, kp // 8))


@partial(jax.jit, static_argnames=("bundle_size", "cull", "presorted"))
def union_max_bundle(clusters, origins, directions, t_min, t_max,
                     scene_min, scene_max, bundle_size: int = 128,
                     cull: str = "exact", presorted: bool = False):
    """Max per-bundle candidate-union size for this batch — i.e. the
    k_cand a zero-truncation traversal of these rays needs (VERDICT r4
    #4: auto-size the candidate budget instead of shipping a default
    that silently leans on the overflow fallback). Mirrors the bundle
    composition of the real prep for the given cull: cand0-sorted exact
    slab unions, or interval slab unions on presorted tiles. Returns a
    device i32 scalar (callers read it back guarded)."""
    from raytracer2_tpu.ops.traverse_bundle import (
        _bundle_bounds, sort_rays_for_coherence)

    n_orig = origins.shape[0]
    p = bundle_size
    c = clusters.num_clusters
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n_orig,))
    t_max_a = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n_orig,))
    if presorted:
        o, d, tn, tx = origins, directions, t_min, t_max_a
    else:
        if cull == "interval":
            perm = sort_rays_for_coherence(origins, directions,
                                           scene_min, scene_max)
        else:
            key = _cand0_sort_key(origins, directions, t_min, t_max_a,
                                  clusters.aabb_min, clusters.aabb_max,
                                  scene_min, scene_max)
            perm = jnp.argsort(key)
        o, d, tn, tx = _apply_permutation(perm, [origins, directions],
                                          [t_min, t_max_a])

    if cull == "interval":
        o, d, tn, tx = _pad_rays(o, d, tn, tx, p)
        o_min, o_max, inv_lo, inv_hi, bundle_tmax = _bundle_bounds(
            o, d, tx, p)
        may_hit, _ = bundle_cluster_overlap(
            o_min, o_max, inv_lo, inv_hi, bundle_tmax,
            clusters.aabb_min, clusters.aabb_max)
        return jnp.max(jnp.sum(may_hit.astype(jnp.int32), axis=-1))

    # exact per-ray cull, chunked like _prepare_bundles_exact
    cb = max(1, CULL_CHUNK_BYTES // (4 * max(c, 1) * p))
    n_bundles = (n_orig + p - 1) // p
    cb = min(cb, n_bundles)
    o, d, tn, tx = _pad_rays(o, d, tn, tx, cb * p)
    nb = o.shape[0] // (cb * p)

    def one(args):
        oo, dd, tnn, txx = args
        e = _entry_exact(oo, dd, tnn, txx,
                         clusters.aabb_min, clusters.aabb_max)
        ue = jnp.min(e.reshape(cb, p, c), axis=1)
        return jnp.sum(jnp.isfinite(ue), axis=-1)

    if nb == 1:
        n_union = one((o, d, tn, tx))
    else:
        n_union = jax.lax.map(
            one, (o.reshape(nb, cb * p, 3), d.reshape(nb, cb * p, 3),
                  tn.reshape(nb, cb * p), tx.reshape(nb, cb * p)))
    return jnp.max(n_union)


def _prepare_bundles(clusters, origins, directions, t_min, t_max,
                     scene_min, scene_max, bundle_size, presorted,
                     exact_key=False, k_cand=256, sort_key="morton"):
    """Interval-union prep: per-bundle candidate lists from the
    conservative interval slab test over ALL clusters, ranked
    nearest-first by top_k(k_cand) — NOT a full-length argsort: ranking
    all C entries per bundle measured 410 ms vs 152 ms for the whole
    exact trace on the 1080p/260k-tri primary class (trace_decomp r3.3,
    the argsort + kp=C candidate rows dominate), while coherent-tile
    unions average ~5 clusters. Truncation is reported via the returned
    overflow flag and covered by the same XLA-walk fallback the exact
    cull uses.

    exact_key=False is the round-1 octant|morton ray sort (cull=
    "interval"). exact_key=True (cull="exact_iv") sorts rays by their
    exact nearest-cluster id instead, which is what makes the interval
    test tight: bundle members then share an octant and a nearest
    cluster, so direction intervals don't span zero and the union stays
    near the exact per-ray union at 1/bundle_size of the dense-cull
    cost (the per-ray [n, C] pass runs once, for the key, not twice)."""
    from raytracer2_tpu.ops.traverse_bundle import (
        _bundle_bounds, sort_rays_for_coherence)

    n_orig = origins.shape[0]
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n_orig,))
    t_max_a = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n_orig,))

    if presorted:
        perm = None
        o, d, tn, tx = origins, directions, t_min, t_max_a
    else:
        if exact_key:
            key = _cand0_sort_key(origins, directions, t_min, t_max_a,
                                  clusters.aabb_min, clusters.aabb_max,
                                  scene_min, scene_max)
            perm = jnp.argsort(key)
        elif sort_key == "octz":
            key = _octz_sort_key(directions, t_max_a, scene_min, scene_max)
            perm = jnp.argsort(key)
        else:
            perm = sort_rays_for_coherence(origins, directions,
                                           scene_min, scene_max)
        o, d, tn, tx = _apply_permutation(perm, [origins, directions],
                                          [t_min, t_max_a])

    o, d, tn, tx = _pad_rays(o, d, tn, tx, bundle_size)
    n = o.shape[0]
    b = n // bundle_size

    o_min, o_max, inv_lo, inv_hi, bundle_tmax = _bundle_bounds(
        o, d, tx, bundle_size)
    may_hit, t_enter = bundle_cluster_overlap(
        o_min, o_max, inv_lo, inv_hi, bundle_tmax,
        clusters.aabb_min, clusters.aabb_max)
    entry = jnp.where(may_hit, jnp.maximum(t_enter, 0.0), jnp.inf)
    c = entry.shape[1]
    k = min(k_cand, c)
    if k <= 384 and k < c:
        neg_t, idx = jax.lax.top_k(-entry, k)  # nearest-first
        cand_t = -neg_t
        cand_idx = idx.astype(jnp.int32)
    else:
        # top_k cost scales with k (k=C measured 427 ms on [32, 3072]
        # rows vs ~2 ms for argsort); auto-sized budgets (VERDICT r4 #4)
        # can push k past 512, where a full argsort + slice wins. Ties
        # break by index in both, so candidate order is identical.
        cand_idx = jnp.argsort(entry, axis=-1)[:, :k].astype(jnp.int32)
        cand_t = jnp.take_along_axis(entry, cand_idx, axis=-1)
    n_union = jnp.sum(jnp.isfinite(entry), axis=-1)
    cand_count = jnp.minimum(
        jnp.sum(jnp.isfinite(cand_t), axis=-1), n_union).astype(jnp.int32)
    overflowed = n_union > k  # per-bundle [B]

    kp = ((k + 8 * LANE_PAD - 1) // (8 * LANE_PAD)) * (8 * LANE_PAD)
    cand_idx_flat, cand_idx, cand_t = _rank_rows(cand_idx, cand_t, b, kp)
    return (perm, o, d, tn, tx, cand_idx_flat, cand_idx, cand_t, cand_count,
            n, b, kp, t_max_a, overflowed)


def _prepare_bundles_exact(clusters, origins, directions, t_min, t_max,
                           scene_min, scene_max, bundle_size, presorted,
                           k_cand, t_cap=False, sort_key="cand0",
                           cull_kernel=False, interpret=False):
    """Exact-cull prep: per-ray slab tests, cand0 ray sort, per-bundle
    union candidate lists ranked nearest-first (module docstring).
    t_cap=True additionally clamps each ray's t_max to its farthest
    overlapped-cluster exit (_entry_exact_cap). Default OFF: on v5e the
    cap's extra far-exit reduction adds real HBM traffic to the dense
    pass (+14% incoherent, +2.2x on coherent rays) while the walk-step
    saving measured ~1% (47.9k -> 47.4k steps on the ladder scene) —
    prep, not the walk, is where the trace time lives (trace_ab r3).
    sort_key="hier" computes the cull-order key at supercluster
    granularity + a per-SC refine (_hier_sort_key): ~1/m_super of the
    cand0 key's dense [N, C] pass, <0.1% key mismatch (the CANDIDATE
    cull below stays per-ray exact either way — only bundle composition
    changes, so hits are identical; the union tightness is what the key
    quality buys)."""
    n_orig = origins.shape[0]
    p = bundle_size
    c = clusters.num_clusters
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n_orig,))
    t_max_a = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n_orig,))

    if presorted:
        perm = None
        o, d, tn, tx = origins, directions, t_min, t_max_a
    else:
        if sort_key == "hier":
            m_key = 32
            sc_min, sc_max = _supercluster_boxes(clusters, m_key)
            key = _hier_sort_key(origins, directions, t_min, t_max_a,
                                 clusters, sc_min, sc_max, m_key,
                                 scene_min, scene_max)
        elif sort_key == "sc4":
            # cand0 at 4-cluster-supercluster granularity: same
            # direction-aware nearest-box semantics, 1/4 the dense key
            # pass (the per-ray CANDIDATE cull below stays cluster-exact
            # either way — only bundle composition changes)
            sc_min, sc_max = _supercluster_boxes(clusters, 4)
            key = _cand0_sort_key(origins, directions, t_min, t_max_a,
                                  sc_min, sc_max, scene_min, scene_max)
        elif sort_key == "octz":
            key = _octz_sort_key(directions, t_max_a,
                                 scene_min, scene_max)
        elif sort_key == "cand2":
            key = _cand2_sort_key(origins, directions, t_min, t_max_a,
                                  clusters.aabb_min, clusters.aabb_max,
                                  scene_min, scene_max)
        else:
            key = _cand0_sort_key(origins, directions, t_min, t_max_a,
                                  clusters.aabb_min, clusters.aabb_max,
                                  scene_min, scene_max,
                                  use_kernel=cull_kernel,
                                  interpret=interpret)
        perm = jnp.argsort(key)
        o, d, tn, tx = _apply_permutation(perm, [origins, directions],
                                          [t_min, t_max_a])

    k = min(k_cand, c)

    if cull_kernel and not t_cap and pcull.cull_kernel_fits(c):
        # fused Pallas union: ue [B, C] is the only HBM write.
        # Bit-identical entries -> identical candidate sets/ordering.
        # Hardware verdict: wins standalone (68 vs 79 ms) but in-context
        # a wash — XLA overlaps the union with the rest of the fused
        # prep (pallas_cull.py docstring). Default off.
        o, d, tn, tx = _pad_rays(o, d, tn, tx, p)
        n = o.shape[0]
        b = n // p
        boxes = pcull.box_rows(clusters.aabb_min, clusters.aabb_max)
        ue = pcull.bundle_union_pallas(
            _pack_rays8(o, d, tn, tx), boxes, p=p,
            interpret=interpret)[:, :c]
        n_union = jnp.sum(jnp.isfinite(ue), axis=-1).astype(jnp.int32)
        if k >= c:
            cand_idx = jnp.argsort(ue, axis=-1).astype(jnp.int32)
            cand_t = jnp.take_along_axis(ue, cand_idx, axis=-1)
        else:
            neg_t, idx = jax.lax.top_k(-ue, k)
            cand_t, cand_idx = -neg_t, idx.astype(jnp.int32)
        cand_count = jnp.minimum(
            jnp.sum(jnp.isfinite(cand_t), axis=-1), n_union
        ).astype(jnp.int32)
        overflowed = n_union > k
        kp = ((k + 8 * LANE_PAD - 1) // (8 * LANE_PAD)) * (8 * LANE_PAD)
        cand_idx_flat, cand_idx, cand_t = _rank_rows(cand_idx, cand_t,
                                                     b, kp)
        return (perm, o, d, tn, tx, cand_idx_flat, cand_idx, cand_t,
                cand_count, n, b, kp, t_max_a, overflowed)

    # chunk the [rays, C] cull so Sponza-class cluster counts stay in HBM
    # budget; chunks are whole bundles
    cb = max(1, CULL_CHUNK_BYTES // (4 * max(c, 1) * p))
    n_bundles = (n_orig + p - 1) // p
    cb = min(cb, n_bundles)
    o, d, tn, tx = _pad_rays(o, d, tn, tx, cb * p)
    n = o.shape[0]
    b = n // p

    def one(args):
        oo, dd, tnn, txx = args  # [cb*p, ...]
        if t_cap:
            e, cap = _entry_exact_cap(oo, dd, tnn, txx,
                                      clusters.aabb_min, clusters.aabb_max)
        else:
            e = _entry_exact(oo, dd, tnn, txx,
                             clusters.aabb_min, clusters.aabb_max)
            cap = jnp.zeros(oo.shape[:1], jnp.float32)
        ue = jnp.min(e.reshape(cb, p, c), axis=1)  # [cb, C] union entry
        n_union = jnp.sum(jnp.isfinite(ue), axis=-1)
        if k >= c:
            # full-length lists (the overflow fallback's k_cand=C
            # sub-trace): top_k(k=C) measured 427 ms on [32, 3072] rows
            # while a plain argsort is ~2 ms — top_k cost scales with k
            idx = jnp.argsort(ue, axis=-1).astype(jnp.int32)
            sorted_t = jnp.take_along_axis(ue, idx, axis=-1)
            return sorted_t, idx, n_union.astype(jnp.int32), cap
        neg_t, idx = jax.lax.top_k(-ue, k)  # nearest-first
        return -neg_t, idx.astype(jnp.int32), n_union.astype(jnp.int32), cap

    nb = b // cb
    if nb == 1:
        cand_t, cand_idx, n_union, cap = one((o, d, tn, tx))
    else:
        cand_t, cand_idx, n_union, cap = jax.lax.map(
            one, (o.reshape(nb, cb * p, 3), d.reshape(nb, cb * p, 3),
                  tn.reshape(nb, cb * p), tx.reshape(nb, cb * p)))
        cand_t = cand_t.reshape(b, k)
        cand_idx = cand_idx.reshape(b, k)
        n_union = n_union.reshape(b)
        cap = cap.reshape(n)
    if t_cap:
        tx = _apply_t_cap(tx, cap)

    cand_count = jnp.minimum(
        jnp.sum(jnp.isfinite(cand_t), axis=-1), n_union).astype(jnp.int32)
    overflowed = n_union > k  # per-bundle [B]

    kp = ((k + 8 * LANE_PAD - 1) // (8 * LANE_PAD)) * (8 * LANE_PAD)
    cand_idx_flat, cand_idx, cand_t = _rank_rows(cand_idx, cand_t, b, kp)
    return (perm, o, d, tn, tx, cand_idx_flat, cand_idx, cand_t, cand_count,
            n, b, kp, t_max_a, overflowed)


def _supercluster_boxes(clusters: Clusters, m: int):
    """Group M consecutive clusters (the SAH builder emits tree order, so
    neighbors are spatially close) into supercluster AABBs [SC, 3]. Empty
    clusters carry never-hit boxes (1e30/-1e30) that vanish in the union."""
    c = clusters.num_clusters
    sc = (c + m - 1) // m
    pad = sc * m - c
    amin = jnp.pad(clusters.aabb_min, ((0, pad), (0, 0)),
                   constant_values=1e30)
    amax = jnp.pad(clusters.aabb_max, ((0, pad), (0, 0)),
                   constant_values=-1e30)
    return (amin.reshape(sc, m, 3).min(1), amax.reshape(sc, m, 3).max(1))


def _hier_sort_key(o, d, tn, tx, clusters, sc_min, sc_max, m,
                   scene_min, scene_max):
    """Cluster-granularity sort key without the dense [n, C] pass: find each
    ray's nearest supercluster ([n, SC] dense), then its nearest cluster
    WITHIN that supercluster ([n, m] gather-test). Grouping rays by nearest
    cluster (not SC) is what keeps bundle unions small enough for the k_sc
    cap — SC-level sorting measured 18% false misses on a 260k-tri scene,
    cluster-level < 0.1%."""
    from raytracer2_tpu.ops.traverse_bundle import _expand_bits

    n = o.shape[0]
    c = clusters.num_clusters
    n_sc = sc_min.shape[0]
    chunk = max(1024,
                (CULL_CHUNK_BYTES // (4 * max(n_sc + m, 1))) // 1024 * 1024)
    chunk = min(chunk, ((n + 1023) // 1024) * 1024)
    o_p, d_p, tn_p, tx_p = _pad_rays(o, d, tn, tx, chunk)

    def one(args):
        oo, dd, tnn, txx = args
        e_sc = _entry_exact(oo, dd, tnn, txx, sc_min, sc_max)
        sc0 = jnp.argmin(e_sc, axis=-1)
        any_sc = jnp.isfinite(jnp.min(e_sc, axis=-1))
        cl = jnp.minimum(sc0[:, None] * m + jnp.arange(m)[None, :], c - 1)
        e_cl = _entry_exact_rows(oo, dd, tnn, txx,
                                 clusters.aabb_min[cl],
                                 clusters.aabb_max[cl])
        local = jnp.argmin(e_cl, axis=-1)
        any_cl = jnp.isfinite(jnp.min(e_cl, axis=-1))
        # rays overlapping the SC box but none of its clusters keep the
        # SC-granularity key; rays touching nothing compact to the end
        cand0 = jnp.where(any_cl, sc0 * m + local, sc0 * m)
        return jnp.where(any_sc, cand0, c).astype(jnp.uint32)

    nb = o_p.shape[0] // chunk
    if nb == 1:
        cand0 = one((o_p, d_p, tn_p, tx_p))
    else:
        cand0 = jax.lax.map(
            one, (o_p.reshape(nb, chunk, 3), d_p.reshape(nb, chunk, 3),
                  tn_p.reshape(nb, chunk), tx_p.reshape(nb, chunk))
        ).reshape(-1)
    cand0 = cand0[:n]

    octant = ((d[:, 0] >= 0).astype(jnp.uint32)
              | ((d[:, 1] >= 0).astype(jnp.uint32) << 1)
              | ((d[:, 2] >= 0).astype(jnp.uint32) << 2))
    extent = jnp.maximum(scene_max - scene_min, 1e-12)
    diag = jnp.linalg.norm(scene_max - scene_min)
    q = jnp.clip((o - scene_min) / extent, 0.0, 0.999)
    ocell = (q * 32.0).astype(jnp.uint32)
    o_morton = (_expand_bits(ocell[:, 0], 5)
                | (_expand_bits(ocell[:, 1], 5) << 1)
                | (_expand_bits(ocell[:, 2], 5) << 2))
    # t_max bucket first, as in _cand0_sort_key: short rays bundle
    # together so bounded shadow batches don't inherit long-ray unions
    t_bucket = jnp.clip(
        (4.0 * tx / jnp.maximum(diag, 1e-12)).astype(jnp.uint32), 0, 3)
    tie = (t_bucket << 18) | (octant << 15) | o_morton  # 20 bits

    bits_c = max((c + 1).bit_length(), 1)
    tie_bits = max(32 - bits_c, 0)
    if tie_bits >= 20:
        tie_part = tie << (tie_bits - 20)
    else:
        tie_part = tie >> (20 - tie_bits)
    return (cand0 << tie_bits) | tie_part


def _entry_exact_rows(o, d, tn, tx, amin, amax):
    """Per-ray slab test against per-ray box rows: o [n,3], amin [n,K,3]
    -> [n, K] entry distances (+inf on miss). Axis-unrolled like
    _entry_exact."""
    eps = 1e-12
    ds = jnp.where(jnp.abs(d) < eps, jnp.where(d >= 0, eps, -eps), d)
    inv = 1.0 / ds  # [n, 3]
    k = amin.shape[1]
    near = jnp.full((o.shape[0], k), -jnp.inf, jnp.float32)
    far = jnp.full((o.shape[0], k), jnp.inf, jnp.float32)
    for ax in range(3):
        ia = inv[:, ax:ax + 1]
        oa = o[:, ax:ax + 1]
        t0 = (amin[:, :, ax] - oa) * ia  # [n, K]
        t1 = (amax[:, :, ax] - oa) * ia
        near = jnp.maximum(near, jnp.minimum(t0, t1))
        far = jnp.minimum(far, jnp.maximum(t0, t1))
    hit = ((near <= far) & (far >= tn[:, None]) & (near <= tx[:, None])
           & (tx >= 0.0)[:, None])
    return jnp.where(hit, jnp.maximum(near, 0.0), jnp.inf)


def _prepare_bundles_hier(clusters, origins, directions, t_min, t_max,
                          scene_min, scene_max, bundle_size, presorted,
                          k_cand, m_super, k_sc):
    """Two-level exact cull for large scenes: the dense per-ray slab pass
    runs against SC = C/m_super supercluster AABBs, then refines only the
    clusters inside each bundle's k_sc nearest superclusters. Candidate
    quality matches the flat exact cull (per-ray exact cluster entries,
    union per bundle, nearest-first) at ~C/(k_sc*m_super) of its cost."""
    n_orig = origins.shape[0]
    p = bundle_size
    c = clusters.num_clusters
    sc_min, sc_max = _supercluster_boxes(clusters, m_super)
    n_sc = sc_min.shape[0]
    k_sc = min(k_sc, n_sc)
    kk = k_sc * m_super  # clusters refined per bundle
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n_orig,))
    t_max_a = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n_orig,))

    if presorted:
        perm = None
        o, d, tn, tx = origins, directions, t_min, t_max_a
    else:
        key = _hier_sort_key(origins, directions, t_min, t_max_a, clusters,
                             sc_min, sc_max, m_super, scene_min, scene_max)
        perm = jnp.argsort(key)
        o, d, tn, tx = _apply_permutation(perm, [origins, directions],
                                          [t_min, t_max_a])

    # chunk whole bundles so the [cb*p, kk] refine intermediate stays small
    cb = max(1, CULL_CHUNK_BYTES // (4 * max(kk, n_sc) * p))
    n_bundles = (n_orig + p - 1) // p
    cb = min(cb, n_bundles)
    o, d, tn, tx = _pad_rays(o, d, tn, tx, cb * p)
    n = o.shape[0]
    b = n // p

    k = min(k_cand, kk)

    def one(args):
        oo, dd, tnn, txx = args  # [cb*p, ...]
        # level 1: dense supercluster cull + per-bundle SC union
        e_sc = _entry_exact(oo, dd, tnn, txx, sc_min, sc_max)
        ue_sc = jnp.min(e_sc.reshape(cb, p, n_sc), axis=1)  # [cb, SC]
        sc_neg, sc_idx = jax.lax.top_k(-ue_sc, k_sc)  # nearest-first
        sc_dropped = jnp.sum(jnp.isfinite(ue_sc), axis=-1) > k_sc
        # level 2: exact per-ray entries for the selected SCs' clusters
        cl = (sc_idx[:, :, None] * m_super
              + jnp.arange(m_super)[None, None, :]).reshape(cb, kk)
        cl = jnp.minimum(cl, c - 1).astype(jnp.int32)
        amin = clusters.aabb_min[cl]  # [cb, kk, 3]
        amax = clusters.aabb_max[cl]
        oo_b = oo.reshape(cb, p, 3)
        dd_b = dd.reshape(cb, p, 3)
        eps = 1e-12
        ds = jnp.where(jnp.abs(dd_b) < eps,
                       jnp.where(dd_b >= 0, eps, -eps), dd_b)
        inv = 1.0 / ds
        # axes unrolled: rank-3 [cb, p, kk] intermediates only (the rank-4
        # broadcast form defeats XLA fusion; see _entry_exact)
        near = jnp.full((cb, p, kk), -jnp.inf, jnp.float32)
        far = jnp.full((cb, p, kk), jnp.inf, jnp.float32)
        for ax in range(3):
            ia = inv[:, :, ax:ax + 1]
            oa = oo_b[:, :, ax:ax + 1]
            t0 = (amin[:, None, :, ax] - oa) * ia  # [cb, p, kk]
            t1 = (amax[:, None, :, ax] - oa) * ia
            near = jnp.maximum(near, jnp.minimum(t0, t1))
            far = jnp.minimum(far, jnp.maximum(t0, t1))
        tnn_b = tnn.reshape(cb, p)
        txx_b = txx.reshape(cb, p)
        hit = ((near <= far) & (far >= tnn_b[..., None])
               & (near <= txx_b[..., None]) & (txx_b >= 0.0)[..., None])
        e = jnp.where(hit, jnp.maximum(near, 0.0), jnp.inf)
        # clusters of unselected (inf-entry) SCs are stale gathers: mask
        sc_ok = jnp.isfinite(-sc_neg)  # [cb, k_sc]
        e = jnp.where(jnp.repeat(sc_ok, m_super, axis=-1)[:, None, :],
                      e, jnp.inf)
        ue = jnp.min(e, axis=1)  # [cb, kk] union entry per cluster
        n_union = jnp.sum(jnp.isfinite(ue), axis=-1)
        neg_t, ii = jax.lax.top_k(-ue, k)
        cand_idx = jnp.take_along_axis(cl, ii, axis=1)
        return (-neg_t, cand_idx, n_union.astype(jnp.int32), sc_dropped)

    nb = b // cb
    if nb == 1:
        cand_t, cand_idx, n_union, sc_dropped = one((o, d, tn, tx))
    else:
        cand_t, cand_idx, n_union, sc_dropped = jax.lax.map(
            one, (o.reshape(nb, cb * p, 3), d.reshape(nb, cb * p, 3),
                  tn.reshape(nb, cb * p), tx.reshape(nb, cb * p)))
        cand_t = cand_t.reshape(b, k)
        cand_idx = cand_idx.reshape(b, k)
        n_union = n_union.reshape(b)
        sc_dropped = sc_dropped.reshape(b)

    cand_count = jnp.minimum(
        jnp.sum(jnp.isfinite(cand_t), axis=-1), n_union).astype(jnp.int32)
    overflowed = (n_union > k) | sc_dropped  # per-bundle [B]

    kp = ((k + 8 * LANE_PAD - 1) // (8 * LANE_PAD)) * (8 * LANE_PAD)
    cand_idx_flat, cand_idx, cand_t = _rank_rows(cand_idx, cand_t, b, kp)
    return (perm, o, d, tn, tx, cand_idx_flat, cand_idx, cand_t, cand_count,
            n, b, kp, t_max_a, overflowed)


def _prepare_bundles_sc(clusters, origins, directions, t_min, t_max,
                        scene_min, scene_max, bundle_size, presorted,
                        m_super):
    """Supercluster-WALK cull: the dense per-ray slab pass runs only
    against SC = ceil(C/m_super) supercluster AABBs, and the per-bundle
    candidate list is the exact SC-union at FULL length (argsort, no
    top_k), nearest-first. Candidates are SUPERCLUSTER ids: the kernel
    walks them against the SC-contiguous Wald layout (_wald_sc_rows),
    one [16, m*S_pad] block DMA per step. So:

    - no truncation path exists anywhere -> no false misses by
      construction (the flaw that parked cull="hier");
    - the O(rays x C) dense cull shrinks by m_super x; and
    - the walk's per-step fixed cost (the hardware-measured bottleneck:
      `group` separate DMA start/wait pairs per step) drops to ONE
      contiguous DMA per m_super clusters.

    The price is VPU/bandwidth-side: every cluster of an overlapped SC
    is intersected, not just the exactly-overlapped ones — lane math on
    VMEM-resident data, which the per-step fixed cost dwarfs.

    This replaces the RT-core two-level BLAS/TLAS descent of the
    reference (src/context.rs:824-911) with the TPU-shaped equivalent:
    one dense vectorized level + one DMA-pipelined walk level."""
    n_orig = origins.shape[0]
    p = bundle_size
    c = clusters.num_clusters
    m = m_super
    sc_min, sc_max = _supercluster_boxes(clusters, m)
    n_sc = sc_min.shape[0]
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n_orig,))
    t_max_a = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n_orig,))

    if presorted:
        perm = None
        o, d, tn, tx = origins, directions, t_min, t_max_a
    else:
        # cluster-granularity grouping key (nearest SC, then nearest
        # cluster within it): SC-granularity sorting makes bundles span
        # whole superclusters and their unions balloon (_hier_sort_key)
        key = _hier_sort_key(origins, directions, t_min, t_max_a, clusters,
                             sc_min, sc_max, m, scene_min, scene_max)
        perm = jnp.argsort(key)
        o, d, tn, tx = _apply_permutation(perm, [origins, directions],
                                          [t_min, t_max_a])

    # chunk whole bundles: the dense [cb*p, SC] pass and the expanded
    # [cb, SC*m] candidate block both stay inside the chunk budget
    cb = max(1, CULL_CHUNK_BYTES // (4 * max(n_sc, 1) * p))
    n_bundles = (n_orig + p - 1) // p
    cb = min(cb, n_bundles)
    o, d, tn, tx = _pad_rays(o, d, tn, tx, cb * p)
    n = o.shape[0]
    b = n // p

    def one(args):
        oo, dd, tnn, txx = args  # [cb*p, ...]
        e_sc = _entry_exact(oo, dd, tnn, txx, sc_min, sc_max)
        ue = jnp.min(e_sc.reshape(cb, p, n_sc), axis=1)  # [cb, SC] union
        order = jnp.argsort(ue, axis=-1).astype(jnp.int32)  # full length
        sc_t = jnp.take_along_axis(ue, order, axis=-1)
        n_ov = jnp.sum(jnp.isfinite(ue), axis=-1).astype(jnp.int32)
        return sc_t, order, n_ov

    nb = b // cb
    if nb == 1:
        cand_t, cand_idx, n_ov = one((o, d, tn, tx))
    else:
        cand_t, cand_idx, n_ov = jax.lax.map(
            one, (o.reshape(nb, cb * p, 3), d.reshape(nb, cb * p, 3),
                  tn.reshape(nb, cb * p), tx.reshape(nb, cb * p)))
        cand_t = cand_t.reshape(b, n_sc)
        cand_idx = cand_idx.reshape(b, n_sc)
        n_ov = n_ov.reshape(b)

    cand_count = n_ov

    k = n_sc
    kp = ((k + 8 * LANE_PAD - 1) // (8 * LANE_PAD)) * (8 * LANE_PAD)
    cand_idx_flat, cand_idx, cand_t = _rank_rows(cand_idx, cand_t, b, kp)
    return (perm, o, d, tn, tx, cand_idx_flat, cand_idx, cand_t, cand_count,
            n, b, kp, t_max_a, jnp.zeros((b,), jnp.bool_))


def _prep(clusters, origins, directions, t_min, t_max, scene_min, scene_max,
          bundle_size, presorted, cull, k_cand, m_super, k_sc, t_cap=False,
          sort_key="cand0", cull_kernel=False, interpret=False):
    """Returns (..., overflowed): overflowed is a per-bundle [B] device
    bool vector, True where that bundle's true candidate union exceeded
    k_cand (rays whose closest hit lives in a dropped cluster would
    FALSELY MISS). The public entry points surface jnp.any(it) on
    request and re-trace ONLY the overflowed bundles through the XLA
    walk when it fires (VERDICT r2 #4: no silent-miss path) — a handful
    of horizon-crossing tiles must not trigger a full-batch retrace."""
    if cull == "auto":
        # "hier" stays experimental: its per-bundle k_sc supercluster
        # truncation measured 3-10% false misses on a 260k-tri scene (the
        # bundle union at SC granularity overflows any fixed k_sc), so
        # correctness keeps the flat exact cull the default at every size
        cull = "exact"
    if cull == "sc":
        return _prepare_bundles_sc(
            clusters, origins, directions, t_min, t_max, scene_min,
            scene_max, bundle_size, presorted, m_super)
    if cull == "hier":
        return _prepare_bundles_hier(
            clusters, origins, directions, t_min, t_max, scene_min,
            scene_max, bundle_size, presorted, k_cand, m_super, k_sc)
    if cull == "exact":
        return _prepare_bundles_exact(
            clusters, origins, directions, t_min, t_max, scene_min,
            scene_max, bundle_size, presorted, k_cand, t_cap=t_cap,
            sort_key=sort_key, cull_kernel=cull_kernel,
            interpret=interpret)
    return _prepare_bundles(
        clusters, origins, directions, t_min, t_max, scene_min, scene_max,
        bundle_size, presorted, exact_key=(cull == "exact_iv"),
        k_cand=k_cand, sort_key=sort_key)


FALLBACK_BUNDLES = 32


def _ovf_ray_index(ovf_b, perm, p, n_orig, f):
    """Original-space ray ids covering the first f overflowed bundles.

    Sorted-space bundle bb covers sorted rows [bb*p, bb*p + p); rows
    >= n_orig are bundle padding; perm maps sorted row -> original ray
    id (None when the batch arrived presorted). Returns (oi [f*p] i32
    original ids — invalid slots are redirected to n_orig so scatters
    land on a discardable dummy row and can NEVER collide with a valid
    slot's write (scatter order between duplicate indices is undefined,
    and a stale duplicate would overwrite the fix); valid [f*p] bool;
    cnt scalar i32 = total overflowed bundles). Gathers through oi rely
    on JAX's out-of-bounds clamp for the n_orig sentinel."""
    cnt = jnp.sum(ovf_b.astype(jnp.int32))
    _, bidx = jax.lax.top_k(ovf_b.astype(jnp.int32), f)
    slot_ok = jnp.arange(f, dtype=jnp.int32) < jnp.minimum(cnt, f)
    j = bidx[:, None] * p + jnp.arange(p, dtype=jnp.int32)[None, :]
    valid = (slot_ok[:, None] & (j < n_orig)).reshape(-1)
    j = jnp.where(valid, j.reshape(-1), 0)
    oi = perm[j] if perm is not None else j
    oi = jnp.where(valid, oi, n_orig)
    return oi, valid, cnt


def _grid_spec(b, p, kp, sp, group, depth, out_rows, mb):
    """Per-grid-step I/O (r3): each step processes MB bundles — grid
    steps with manual-DMA + while-loop bodies do not pipeline, so one
    bundle per step pays a serialized ~6 us of block-copy latency
    (measured; the empty-bundle floor). MB bundles amortize it. Rays
    ride as row-major [MB*P, 8] blocks (ox oy oz dx dy dz tn tx);
    outputs pack into one [MB, out_rows, P] block."""
    return pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # cand_count
        grid=(b // mb,),
        in_specs=[
            pl.BlockSpec((mb * p, 8), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),  # rays8
            pl.BlockSpec(memory_space=pl.ANY),  # cand_idx (HBM)
            pl.BlockSpec(memory_space=pl.ANY),  # cand_t (HBM)
            pl.BlockSpec(memory_space=pl.ANY),  # wald (HBM, manual DMA)
        ],
        out_specs=pl.BlockSpec((mb, out_rows, p), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.SMEM((mb, 8, kp // 8), jnp.int32),
            pltpu.SMEM((mb, 8, kp // 8), jnp.float32),
            pltpu.VMEM((depth, 16, group * sp), jnp.float32),
            pltpu.SemaphoreType.DMA((depth, group)),
            pltpu.SemaphoreType.DMA((mb, 2)),
        ],
    )


def _pack_rays8(o, d, tn, tx):
    """[n,3]x2 + [n]x2 -> [n, 8] row-major ray records (no relayout —
    a [b, p, 8] -> [b, 8, p] transpose measured 28 ms at 2M rays)."""
    return jnp.concatenate(
        [o, d, tn[:, None], tx[:, None]], axis=1)


def _pad_bundles(mb, b, rays8, cand_idx, cand_t, cand_count, p):
    """Pad the bundle dimension to a multiple of MB with empty bundles."""
    b_pad = ((b + mb - 1) // mb) * mb
    if b_pad != b:
        e = b_pad - b
        rays8 = jnp.concatenate(
            [rays8, jnp.zeros((e * p, 8), rays8.dtype)])
        cand_idx = jnp.concatenate(
            [cand_idx, jnp.zeros((e,) + cand_idx.shape[1:],
                                 cand_idx.dtype)])
        cand_t = jnp.concatenate(
            [cand_t, jnp.full((e,) + cand_t.shape[1:], jnp.inf,
                              cand_t.dtype)])
        cand_count = jnp.concatenate(
            [cand_count, jnp.zeros((e,), cand_count.dtype)])
    return b_pad, rays8, cand_idx, cand_t, cand_count


def _issue_row_dmas(mb, base, cand_count_ref, cand_idx_hbm, cand_t_hbm,
                    idx_rows, t_rows, row_sems):
    """Start ALL mb bundles' candidate-row DMAs up front (latency
    overlaps bundle 0's walk). Empty bundles skip theirs."""
    for j in range(mb):
        @pl.when(cand_count_ref[base + j] > 0)
        def _(j=j):
            pltpu.make_async_copy(cand_idx_hbm.at[base + j],
                                  idx_rows.at[j], row_sems.at[j, 0]).start()
            pltpu.make_async_copy(cand_t_hbm.at[base + j],
                                  t_rows.at[j], row_sems.at[j, 1]).start()


def _bundle_ctx(j, base, cand_count_ref, cand_idx_hbm, cand_t_hbm,
                wald_hbm, idx_rows, t_rows, scratch, sems, row_sems,
                group):
    """Wait bundle j's candidate rows; return (n_cand, k_max, cand_at,
    fetch, depth) for its walk."""
    n_cand = cand_count_ref[base + j]

    @pl.when(n_cand > 0)
    def _():
        pltpu.make_async_copy(cand_idx_hbm.at[base + j],
                              idx_rows.at[j], row_sems.at[j, 0]).wait()
        pltpu.make_async_copy(cand_t_hbm.at[base + j],
                              t_rows.at[j], row_sems.at[j, 1]).wait()

    kr, kc = idx_rows.shape[1], idx_rows.shape[2]
    k_max = kr * kc

    def cand_at(ref, k):
        return ref[j, jax.lax.div(k, kc), jax.lax.rem(k, kc)]

    depth = scratch.shape[0]
    sp = scratch.shape[-1] // group

    def fetch(k, g):
        """DMA for candidate k (a Python/traced scalar) whose group member
        index g is STATIC (unrolled), into the lane block of its slot."""
        ci = cand_at(idx_rows, k)
        slot = jax.lax.rem(jax.lax.div(k, group), depth)
        return pltpu.make_async_copy(
            wald_hbm.at[ci],
            scratch.at[slot, :, pl.ds(g * sp, sp)],
            sems.at[slot, g])

    for jj in range(group * (depth - 1)):
        @pl.when(jj < n_cand)
        def _(jj=jj):
            fetch(jj, jj % group).start()

    return n_cand, k_max, cand_at, fetch, depth


def _bundle_ctx_sc(j, base, cand_count_ref, cand_idx_hbm, cand_t_hbm,
                   wald_sc_hbm, idx_rows, t_rows, scratch, sems, row_sems,
                   sc_m):
    """SC-mode twin of _bundle_ctx: candidates are supercluster ids and
    each walk step fetches one whole [16, sc_m*S_pad] SC block with ONE
    contiguous DMA (the per-candidate start/wait pairs are the walk's
    measured fixed cost)."""
    n_cand = cand_count_ref[base + j]

    @pl.when(n_cand > 0)
    def _():
        pltpu.make_async_copy(cand_idx_hbm.at[base + j],
                              idx_rows.at[j], row_sems.at[j, 0]).wait()
        pltpu.make_async_copy(cand_t_hbm.at[base + j],
                              t_rows.at[j], row_sems.at[j, 1]).wait()

    kr, kc = idx_rows.shape[1], idx_rows.shape[2]
    k_max = kr * kc

    def cand_at(ref, k):
        return ref[j, jax.lax.div(k, kc), jax.lax.rem(k, kc)]

    depth = scratch.shape[0]

    def fetch(k):
        sc = cand_at(idx_rows, k)
        slot = jax.lax.rem(k, depth)
        return pltpu.make_async_copy(
            wald_sc_hbm.at[sc], scratch.at[slot], sems.at[slot, 0])

    for jj in range(depth - 1):
        @pl.when(jj < n_cand)
        def _(jj=jj):
            fetch(jj).start()

    return n_cand, k_max, cand_at, fetch, depth


def _bc_i32(x):
    """Bitcast f32 -> i32; Mosaic has no 1D form, bounce through [1, P]."""
    return pltpu.bitcast(x.reshape(1, -1), jnp.int32).reshape(-1)


def _bc_f32(x):
    return pltpu.bitcast(x.reshape(1, -1), jnp.float32).reshape(-1)


def _intersect_block(w, rt):
    """Wald intersection of the whole bundle vs one block of clusters.
    rt: [P, 8] per-ray columns (ox oy oz dx dy dz tn tx). Returns
    (t, uu, vv, valid) as [P, W] arrays (W = group * S_pad).

    The divide runs unguarded: dz == 0 yields t = ±inf/nan, which the
    hit predicates reject on their own; `valid` keeps the same
    |dz| > 1e-12 rejection the brute-force oracle applies so parity
    stays exact at near-degenerate triangles."""
    ox = rt[:, 0:1]
    oy = rt[:, 1:2]
    oz = rt[:, 2:3]
    dx = rt[:, 3:4]
    dy = rt[:, 4:5]
    dz3 = rt[:, 5:6]

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
    valid = jnp.abs(dz) > 1e-12
    t = -op_z / dz
    uu = op_u + t * dp_u
    vv = op_v + t * dp_v
    return t, uu, vv, valid


def _ray_matrix(rt, p):
    """Loop-invariant MXU operand: [2P, 4] = [o | 1 ; d | 0] per bundle.
    Built once before the walk loop (the per-step cost is the dot)."""
    o3 = rt[:, 0:3]
    d3 = rt[:, 3:6]
    top = jnp.concatenate([o3, jnp.ones((p, 1), jnp.float32)], axis=1)
    bot = jnp.concatenate([d3, jnp.zeros((p, 1), jnp.float32)], axis=1)
    return jnp.concatenate([top, bot], axis=0)


def _intersect_block_mm(w, ray_mat, p):
    """MXU variant of _intersect_block: the 18 lane-parallel FMAs of the
    six Wald affines become three [2P, 4] @ [4, W] dots (w rows are
    component-major, _wald_rows_mm), freeing the VPU for the predicates.
    precision=HIGHEST keeps f32-accurate products so hit/miss parity
    with the brute-force oracle holds at triangle edges."""
    outs = []
    for c in range(3):
        outs.append(jax.lax.dot(
            ray_mat, w[c * 4:(c + 1) * 4, :],
            precision=jax.lax.Precision.HIGHEST))
    op_u, dp_u = outs[0][:p], outs[0][p:]
    op_v, dp_v = outs[1][:p], outs[1][p:]
    op_z, dz = outs[2][:p], outs[2][p:]
    valid = jnp.abs(dz) > 1e-12
    t = -op_z / dz
    uu = op_u + t * dp_u
    vv = op_v + t * dp_v
    return t, uu, vv, valid


def _walk_kernel(cand_count_ref,
                 rays_ref,
                 cand_idx_hbm, cand_t_hbm, wald_hbm,
                 out_ref,
                 idx_rows, t_rows, scratch, sems, row_sems,
                 *, group, mb, sc_m=0, mm=False, debug_steps=False,
                 lean=False):
    """MB bundles per grid step, `group` clusters per walk iteration;
    packed-key winner tracking (module doc). The per-ray winner is
    carried as a CODE (cluster * S_pad + triangle slot); the host turns
    it into payload ids and exact t/u/v with the single _tri_meta row
    gather + a 12-FMA re-evaluation, so the loop body needs only two
    lane reductions per step (step_key, step_code) — the former
    four-way t/u/v/ci masked-min extraction was ~a third of the step's
    lane work. Output row per bundle: code (i32, 0x7FFFFFFF = miss).
    sc_m > 0: supercluster mode — one candidate (= one SC of sc_m
    clusters, one contiguous DMA) per step.

    lean=True (r3.4) drops the remaining per-step [P, W] extraction
    (is_win compare + masked min-reduce + the group-scalar ci_row
    build): the loop carries the winning step index best_it as a [P]
    vector instead (better/min/where are all [P]-wide), and the host
    recovers the candidate slot from best_key's low SLOT_BITS plus ONE
    extra [N] gather into the sorted-space cand_idx_flat table. Output
    rows become (best_key, best_it); best_it == -1 flags a miss."""
    p = rays_ref.shape[0] // mb
    base = pl.program_id(0) * mb
    _issue_row_dmas(mb, base, cand_count_ref, cand_idx_hbm, cand_t_hbm,
                    idx_rows, t_rows, row_sems)

    w_lanes = scratch.shape[-1]  # group * S_pad
    sp = w_lanes // group
    slot_iota = jax.lax.broadcasted_iota(jnp.int32, (p, w_lanes), 1)
    # per-lane group-member index as a [1, W] row (used to stamp each lane
    # with its candidate's cluster id — scalar selects on one row, not P)
    grp_row = jax.lax.broadcasted_iota(jnp.int32, (1, w_lanes), 1) // sp
    lane_row = jax.lax.broadcasted_iota(jnp.int32, (1, w_lanes), 1) % sp
    big_i = jnp.int32(0x7FFFFFFF)

    for j in range(mb):
        if sc_m:
            n_cand, k_max, cand_at, fetch, depth = _bundle_ctx_sc(
                j, base, cand_count_ref, cand_idx_hbm, cand_t_hbm,
                wald_hbm, idx_rows, t_rows, scratch, sems, row_sems, sc_m)
        else:
            n_cand, k_max, cand_at, fetch, depth = _bundle_ctx(
                j, base, cand_count_ref, cand_idx_hbm, cand_t_hbm,
                wald_hbm, idx_rows, t_rows, scratch, sems, row_sems, group)
        cps = 1 if sc_m else group  # candidates consumed per step

        rt = rays_ref[j * p:(j + 1) * p, :]  # [P, 8]
        tn_col = rt[:, 6:7]
        tx = rt[:, 7]
        ray_mat = _ray_matrix(rt, p) if mm else None

        # init key from per-ray t_max: IEEE bits are monotone for t >= 0;
        # dead lanes (t_max < 0) get a negative key no hit can beat. Low
        # bits are SET (round up) so a hit at exactly t_max still wins.
        init_key = (_bc_i32(tx) & ~SLOT_MASK) | SLOT_MASK
        init_aux = (jnp.full((p,), -1, jnp.int32) if lean
                    else jnp.full((p,), big_i, jnp.int32))
        init = (jnp.int32(0), init_key, init_aux)

        def cond(state, cand_at=cand_at, n_cand=n_cand, k_max=k_max):
            it, best_key = state[0], state[1]
            # rounding the cleared slot bits UP keeps the exit conservative
            worst = jnp.max(_bc_f32(best_key | SLOT_MASK))
            return (it * cps < n_cand) & (
                cand_at(t_rows, jnp.minimum(it * cps, k_max - 1))
                <= worst)

        def body(state, fetch=fetch, cand_at=cand_at, n_cand=n_cand,
                 k_max=k_max, depth=depth, rt=rt, tn_col=tn_col,
                 ray_mat=ray_mat):
            it, best_key, best_code = state
            slot = jax.lax.rem(it, depth)

            if sc_m:
                @pl.when(it + depth - 1 < n_cand)
                def _():
                    fetch(it + depth - 1).start()
                fetch(it).wait()
            else:
                for g in range(group):
                    @pl.when((it + depth - 1) * group + g < n_cand)
                    def _(g=g):
                        fetch((it + depth - 1) * group + g, g).start()

                for g in range(group):
                    @pl.when(it * group + g < n_cand)
                    def _(g=g):
                        fetch(it * group + g, g).wait()

            if mm:
                t, uu, vv, valid = _intersect_block_mm(
                    scratch[slot], ray_mat, p)
            else:
                t, uu, vv, valid = _intersect_block(scratch[slot], rt)
            hit = (valid & (uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0)
                   & (t > tn_col))
            if not sc_m:
                # group members beyond n_cand hold stale data: mask them
                # (SC mode needs no mask: padded clusters are zero rows)
                hit &= slot_iota < (n_cand - it * group) * sp
            key = jnp.where(
                hit,
                (pltpu.bitcast(t, jnp.int32) & ~SLOT_MASK) | slot_iota,
                jnp.int32(MISS_KEY))
            step_key = jnp.min(key, axis=-1)

            better = step_key < best_key
            best_key = jnp.minimum(step_key, best_key)
            if lean:
                # [P]-wide winner-step carry; slot rides best_key's low
                # bits, the host resolves (it, slot) -> cluster (docstring)
                best_code = jnp.where(better, it, best_code)
                return it + 1, best_key, best_code

            # winner code extraction: the winning lane is unique (the
            # slot in the low key bits is the lane index), so one
            # equality-masked min recovers cluster * S_pad + tri slot
            is_win = key == step_key[:, None]
            if sc_m:
                ci_row = cand_at(idx_rows, it) * sc_m + grp_row
            else:
                ci_row = jnp.zeros((1, w_lanes), jnp.int32)
                for g in range(group):
                    cig = cand_at(idx_rows,
                                  jnp.minimum(it * group + g, k_max - 1))
                    ci_row = jnp.where(grp_row == g, cig, ci_row)
            code_row = ci_row * sp + lane_row  # [1, W]
            step_code = jnp.min(jnp.where(is_win, code_row, big_i), axis=-1)

            best_code = jnp.where(better, step_code, best_code)
            return it + 1, best_key, best_code

        it_final, best_key, best_code = jax.lax.while_loop(cond, body, init)

        # drain: an early exit (entry distance > worst hit) leaves up to
        # depth-1 group prefetches in flight; wait on them or the
        # semaphore counts leak into the next bundle and the DMA aborts
        if sc_m:
            for off in range(depth - 1):
                @pl.when(it_final + off < n_cand)
                def _(off=off):
                    fetch(it_final + off).wait()
        else:
            for off in range(depth - 1):
                for g in range(group):
                    @pl.when((it_final + off) * group + g < n_cand)
                    def _(off=off, g=g):
                        fetch((it_final + off) * group + g, g).wait()

        if lean:
            out_ref[j, 0, :] = best_key
            out_ref[j, 1, :] = best_code  # = best_it; -1 flags a miss
        else:
            out_ref[j, 0, :] = best_code
        if debug_steps:
            # telemetry row: walk iterations this bundle actually took
            # (early exit included) — the per-bundle work histogram
            out_ref[j, (2 if lean else 1), :] = jnp.full(
                (p,), it_final, jnp.int32)


def _occlude_kernel(cand_count_ref,
                    rays_ref,
                    cand_idx_hbm, cand_t_hbm, wald_hbm,
                    hit_out,
                    idx_rows, t_rows, scratch, sems, row_sems,
                    *, group, mb, sc_m=0, mm=False, debug_steps=False):
    """Any-hit variant of _walk_kernel: a ray is done at its first hit;
    each bundle exits once every live ray is blocked or candidates run
    out. sc_m > 0: supercluster mode (see _walk_kernel)."""
    p = rays_ref.shape[0] // mb
    base = pl.program_id(0) * mb
    _issue_row_dmas(mb, base, cand_count_ref, cand_idx_hbm, cand_t_hbm,
                    idx_rows, t_rows, row_sems)

    w_lanes = scratch.shape[-1]
    sp = w_lanes // group
    slot_iota = jax.lax.broadcasted_iota(jnp.int32, (p, w_lanes), 1)

    for j in range(mb):
        if sc_m:
            n_cand, k_max, cand_at, fetch, depth = _bundle_ctx_sc(
                j, base, cand_count_ref, cand_idx_hbm, cand_t_hbm,
                wald_hbm, idx_rows, t_rows, scratch, sems, row_sems, sc_m)
        else:
            n_cand, k_max, cand_at, fetch, depth = _bundle_ctx(
                j, base, cand_count_ref, cand_idx_hbm, cand_t_hbm,
                wald_hbm, idx_rows, t_rows, scratch, sems, row_sems, group)
        cps = 1 if sc_m else group

        rt = rays_ref[j * p:(j + 1) * p, :]
        tn = rt[:, 6]
        tx = rt[:, 7]
        tn_col = rt[:, 6:7]
        tx_col = rt[:, 7:8]
        ray_mat = _ray_matrix(rt, p) if mm else None

        # padded rays carry t_max < t_min: done from the start. The done
        # mask is carried as int32 (Mosaic cannot yield i1 loop vectors).
        init = (jnp.int32(0), (tx <= tn).astype(jnp.int32))

        def cond(state, tx=tx, cand_at=cand_at, n_cand=n_cand,
                 k_max=k_max):
            it, done = state
            # the farthest t_max among live rays bounds useful candidates;
            # once every ray is done the max is -inf and the walk stops
            worst = jnp.max(jnp.where(done != 0, -jnp.inf, tx))
            more = it * cps < n_cand
            near_enough = cand_at(
                t_rows, jnp.minimum(it * cps, k_max - 1)) <= worst
            return more & near_enough

        def body(state, fetch=fetch, n_cand=n_cand, depth=depth, rt=rt,
                 tn_col=tn_col, tx_col=tx_col, ray_mat=ray_mat):
            it, done = state
            slot = jax.lax.rem(it, depth)

            if sc_m:
                @pl.when(it + depth - 1 < n_cand)
                def _():
                    fetch(it + depth - 1).start()
                fetch(it).wait()
            else:
                for g in range(group):
                    @pl.when((it + depth - 1) * group + g < n_cand)
                    def _(g=g):
                        fetch((it + depth - 1) * group + g, g).start()

                for g in range(group):
                    @pl.when(it * group + g < n_cand)
                    def _(g=g):
                        fetch(it * group + g, g).wait()

            if mm:
                t, uu, vv, valid = _intersect_block_mm(
                    scratch[slot], ray_mat, p)
            else:
                t, uu, vv, valid = _intersect_block(scratch[slot], rt)
            hit = (valid & (uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0)
                   & (t > tn_col) & (t < tx_col))
            if not sc_m:
                hit &= slot_iota < (n_cand - it * group) * sp
            return it + 1, done | jnp.any(hit, axis=-1).astype(jnp.int32)

        it_final, done = jax.lax.while_loop(cond, body, init)

        if sc_m:
            for off in range(depth - 1):
                @pl.when(it_final + off < n_cand)
                def _(off=off):
                    fetch(it_final + off).wait()
        else:
            for off in range(depth - 1):
                for g in range(group):
                    @pl.when((it_final + off) * group + g < n_cand)
                    def _(off=off, g=g):
                        fetch((it_final + off) * group + g, g).wait()

        hit_out[j, 0, :] = done * (tx > tn).astype(jnp.int32)
        if debug_steps:
            hit_out[j, 1, :] = jnp.full((p,), it_final, jnp.int32)


@partial(jax.jit, static_argnames=("bundle_size", "interpret", "presorted",
                                   "cull", "group", "k_cand", "depth",
                                   "m_super", "k_sc", "with_overflow",
                                   "mb", "overflow_fallback", "mm", "t_cap",
                                   "debug_steps", "sort_key",
                                   "fallback_bundles", "cull_kernel"))
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
    presorted: bool = False,
    cull: str = "auto",
    group: int = 4,
    k_cand: int = 256,
    depth: int = 2,
    m_super: int = 32,
    k_sc: int = 12,
    with_overflow: bool = False,
    mb: int = 8,
    overflow_fallback: bool = True,
    mm: bool = False,
    t_cap: bool = False,
    debug_steps: bool = False,
    sort_key: str = "cand0",
    fallback_bundles: int = FALLBACK_BUNDLES,
    wald_rows: jax.Array | None = None,
    cull_kernel: bool | None = None,
) -> jax.Array:
    """Any-hit visibility batch via the Pallas walk: True where blocked.
    Shadow-ray counterpart of traceVisibilityRay (reference
    lighting_passes/TraceVisibility.glsl semantics). Pass presorted=True
    when the rays are already coherent (e.g. Z-curve pixel order) to skip
    the cull-order sort + permutation gathers. with_overflow=True also
    returns the candidate-truncation flag (module doc of _prep).
    overflow_fallback=True (default) makes truncation harmless: see
    closest_hit_bundle_pallas."""
    sp = _s_pad(clusters)
    if cull == "sc":
        m_super = max(1, min(m_super, (1 << SLOT_BITS) // sp))
        group, sc_m = m_super, m_super
        mm = False  # SC layout is row-major only (negative-result path)
        wald = _wald_sc_rows(clusters, m_super)
    else:
        group = max(1, min(group, (1 << SLOT_BITS) // sp))
        sc_m = 0
        # prebuilt rows (make_tracers builds them once per scene): the
        # [C, 16, S_pad] re-layout measured ~53 ms/call on a 260k-tri
        # scene — pure fixed cost when rebuilt inside every trace
        if mm:
            wald = _wald_rows_mm(clusters)
        elif wald_rows is not None:
            wald = wald_rows
        else:
            wald = _wald_rows(clusters)
    n_orig = origins.shape[0]
    (perm, o, d, tn, tx, _, cand_idx, cand_t, cand_count,
     n, b, kp, _, overflowed) = _prep(
        clusters, origins, directions, t_min, t_max, scene_min, scene_max,
        bundle_size, presorted, cull, k_cand, m_super, k_sc, t_cap=t_cap,
        sort_key=sort_key, interpret=interpret,
        cull_kernel=bool(cull_kernel))
    p = bundle_size
    rays8 = _pack_rays8(o, d, tn, tx)
    b_pad, rays8, cand_idx, cand_t, cand_count = _pad_bundles(
        mb, b, rays8, cand_idx, cand_t, cand_count, p)

    out_rows = 2 if debug_steps else 1
    hit = pl.pallas_call(
        partial(_occlude_kernel, group=group, mb=mb, sc_m=sc_m, mm=mm,
                debug_steps=debug_steps),
        grid_spec=_grid_spec(b_pad, p, kp, sp, group, depth=depth,
                             out_rows=out_rows, mb=mb),
        out_shape=jax.ShapeDtypeStruct((b_pad, out_rows, p), jnp.int32),
        interpret=interpret,
    )(cand_count, rays8, cand_idx, cand_t, wald)
    steps = hit[:b, 1, 0] if debug_steps else None
    hit = hit[:, 0, :].reshape(b_pad * p)[:n_orig]
    if perm is not None:
        # un-sort with ONE [N] i32 scatter instead of argsort + gather
        hit = jnp.zeros_like(hit).at[perm].set(hit)
    blocked = hit.astype(jnp.bool_)
    if debug_steps:
        # measurement mode: per-bundle walk telemetry, no fallback branch
        return blocked, {"steps": steps, "cand_count": cand_count[:b],
                         "overflowed": jnp.any(overflowed)}
    if overflow_fallback and cull != "sc":
        from raytracer2_tpu.ops import traverse_bundle as tbm

        # bounded partial fallback: re-trace ONLY the overflowed bundles
        # (a handful of horizon-crossing tiles, measured 6/8100 on the
        # ladder scene) through the SAME Pallas kernel with k_cand =
        # num_clusters — full-length candidate lists cannot truncate, so
        # the sub-trace is exact by construction. A full-batch retrace
        # here measured 1.84 s vs the kernel's 114 ms, and the XLA-walk
        # sub-trace carries a ~460 ms fixed cost — a single bad bundle
        # must not cost 16x. Full retrace only past fallback_bundles.
        f = min(fallback_bundles, b)
        tn_o = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n_orig,))
        tx_o = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n_orig,))

        def _partial_fix():
            oi, valid, _ = _ovf_ray_index(overflowed, perm, p, n_orig, f)
            sub = occluded_bundle_pallas(
                clusters, origins[oi], directions[oi], tn_o[oi],
                jnp.where(valid, tx_o[oi], -1.0), scene_min, scene_max,
                bundle_size=p, interpret=interpret, presorted=True,
                cull="exact", group=group if sc_m == 0 else 4,
                k_cand=clusters.num_clusters, depth=depth, mb=mb,
                overflow_fallback=False, cull_kernel=cull_kernel,
                wald_rows=wald if not mm else None)
            # invalid slots scatter to the dummy row n_orig (discarded)
            ext = jnp.concatenate([blocked, blocked[:1]])
            return ext.at[oi].set(sub)[:n_orig]

        def _full_fix():
            return tbm.occluded_bundle(
                clusters, origins, directions, t_min, t_max,
                scene_min, scene_max, sort_rays=not presorted)

        cnt = jnp.sum(overflowed.astype(jnp.int32))
        blocked = jax.lax.cond(
            cnt == 0, lambda: blocked,
            (lambda: jax.lax.cond(cnt <= f, _partial_fix, _full_fix))
            if f > 0 else _full_fix)
    if with_overflow:
        return blocked, jnp.any(overflowed)
    return blocked


@partial(jax.jit, static_argnames=("bundle_size", "interpret", "presorted",
                                   "cull", "group", "k_cand", "depth",
                                   "m_super", "k_sc", "with_overflow",
                                   "mb", "overflow_fallback", "mm", "t_cap",
                                   "debug_steps", "sort_key",
                                   "fallback_bundles", "lean",
                                   "cull_kernel"))
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
    presorted: bool = False,
    cull: str = "auto",
    group: int = 4,
    k_cand: int = 256,
    depth: int = 2,
    m_super: int = 32,
    k_sc: int = 12,
    with_overflow: bool = False,
    mb: int = 8,
    overflow_fallback: bool = True,
    mm: bool = False,
    t_cap: bool = False,
    debug_steps: bool = False,
    sort_key: str = "cand0",
    fallback_bundles: int = FALLBACK_BUNDLES,
    wald_rows: jax.Array | None = None,
    meta_rows: jax.Array | None = None,
    lean: bool = False,
    cull_kernel: bool | None = None,
) -> HitRecord:
    """Closest-hit via the Pallas walk (module docstring). Returns the
    rayhit.rchit payload contract (t, u, v, geometry, primitive; reference
    src/shaders/common.glsl:23-28). with_overflow=True returns
    (HitRecord, overflowed) — see _prep.

    overflow_fallback=True (default) closes the truncation hazard
    structurally (VERDICT r2 #1a): bundles whose exact candidate union
    exceeded k_cand re-trace through the same kernel at k_cand=C
    (full-length lists — can never truncate); only past
    fallback_bundles of them does the whole batch re-trace through the
    XLA bundle walk. Both sit behind lax.cond, costing nothing unless
    taken (tests force both with a tiny k_cand).

    wald_rows/meta_rows: prebuilt _wald_rows/_tri_meta tables (built
    once per scene by make_tracers) — rebuilding them inside the call
    measured ~53/~17 ms of pure fixed cost on a 260k-tri scene.

    mm=True: Wald affines as MXU dots (_intersect_block_mm) — measured
    0.6-0.8x on v5e (HIGHEST-precision f32 dots on a bf16 MXU plus the
    per-bundle operand build outrun the VPU FMA saving; trace_ab r3),
    kept for A/B. t_cap=True: clamp per-ray t_max to the farthest
    overlapped-cluster exit (hit-safe but a measured loss — see
    _prepare_bundles_exact). debug_steps=True: measurement mode — returns (result, {steps [b],
    cand_count [b], overflowed}) and skips the fallback branch."""
    sp = _s_pad(clusters)
    if cull == "sc":
        m_super = max(1, min(m_super, (1 << SLOT_BITS) // sp))
        group, sc_m = m_super, m_super
        mm = False  # SC layout is row-major only (negative-result path)
        wald = _wald_sc_rows(clusters, m_super)
    else:
        group = max(1, min(group, (1 << SLOT_BITS) // sp))
        sc_m = 0
        if mm:
            wald = _wald_rows_mm(clusters)
        elif wald_rows is not None:
            wald = wald_rows
        else:
            wald = _wald_rows(clusters)
    assert group * sp <= (1 << SLOT_BITS), \
        "packed winner keys carry the slot in the low SLOT_BITS bits"
    n_orig = origins.shape[0]
    (perm, o, d, tn, tx, cand_idx_flat, cand_idx, cand_t, cand_count,
     n, b, kp, t_max_orig, overflowed) = _prep(
        clusters, origins, directions, t_min, t_max, scene_min, scene_max,
        bundle_size, presorted, cull, k_cand, m_super, k_sc, t_cap=t_cap,
        sort_key=sort_key, interpret=interpret,
        cull_kernel=bool(cull_kernel))
    p = bundle_size
    rays8 = _pack_rays8(o, d, tn, tx)
    b_pad, rays8, cand_idx, cand_t, cand_count = _pad_bundles(
        mb, b, rays8, cand_idx, cand_t, cand_count, p)

    if cull == "sc":
        lean = False  # sc-mode ci decode is in-kernel only (negative path)
    out_rows = (2 if lean else 1) + (1 if debug_steps else 0)
    out = pl.pallas_call(
        partial(_walk_kernel, group=group, mb=mb, sc_m=sc_m, mm=mm,
                debug_steps=debug_steps, lean=lean),
        grid_spec=_grid_spec(b_pad, p, kp, sp, group, depth=depth,
                             out_rows=out_rows, mb=mb),
        out_shape=jax.ShapeDtypeStruct((b_pad, out_rows, p), jnp.int32),
        interpret=interpret,
    )(cand_count, rays8, cand_idx, cand_t, wald)
    m_pad = b_pad * p
    steps = out[:b, out_rows - 1, 0] if debug_steps else None
    if lean:
        # sorted-space decode: slot rides best_key's low bits, best_it is
        # the winning walk step; ONE gather into the sorted-space
        # candidate table recovers the cluster id (kernel docstring)
        best_key = out[:, 0, :].reshape(m_pad)[:n_orig]
        best_it = out[:, 1, :].reshape(m_pad)[:n_orig]
        slot = best_key & SLOT_MASK
        k_idx = best_it * group + slot // sp
        row = jnp.arange(n_orig, dtype=jnp.int32) // p  # sorted bundle id
        flat = jnp.clip(row * kp + k_idx, 0, cand_idx_flat.size - 1)
        ci = cand_idx_flat.reshape(-1)[flat]
        code = jnp.where(best_it < 0, jnp.int32(0x7FFFFFFF),
                         ci * sp + jax.lax.rem(slot, sp))
    else:
        code = out[:, 0, :].reshape(m_pad)[:n_orig]

    # winner code -> (triangle, geometry, primitive) + Wald coefficients:
    # one packed row gather, then a 12-FMA re-evaluation reproduces the
    # winner's exact (t, u, v) — cheaper than carrying them through the
    # kernel loop (see _walk_kernel doc). The code is un-sorted FIRST with
    # one [N] i32 scatter, so the meta gather and the re-evaluation run in
    # ORIGINAL ray order against the caller's origins/directions — the
    # previous argsort(perm) + packed [N, 6] un-sort row gather at the end
    # were pure data movement this scatter replaces.
    if perm is not None:
        code = jnp.zeros((n_orig,), jnp.int32).at[perm].set(code)
        on, dn = origins, directions
    else:
        on, dn = o[:n_orig], d[:n_orig]
    missed = code == jnp.int32(0x7FFFFFFF)
    safe_code = jnp.where(missed, 0, code)
    meta_table = (meta_rows if meta_rows is not None
                  else _tri_meta(clusters, tri_geometry, tri_primitive))
    meta = meta_table[safe_code]  # [n, 16] i32
    tri_r = jnp.where(missed, -1, meta[:, 12])
    geom_r = jnp.where(missed, -1, meta[:, 13])
    prim_r = jnp.where(missed, 0, meta[:, 14])

    wf = jax.lax.bitcast_convert_type(meta[:, 0:12], jnp.float32)
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

    geom = jnp.where(missed_r, INVALID_INDEX, geom_r.astype(jnp.uint32))
    prim = jnp.where(missed_r, jnp.uint32(0), prim_r.astype(jnp.uint32))
    rec = HitRecord(
        t=jnp.where(missed_r, t_max_orig, t_r),
        u=jnp.where(missed_r, 0.0, u_r),
        v=jnp.where(missed_r, 0.0, v_r),
        geometry_index=geom, primitive_id=prim, triangle_index=tri_r)
    if debug_steps:
        # measurement mode: per-bundle walk telemetry, no fallback branch
        return rec, {"steps": steps, "cand_count": cand_count[:b],
                     "overflowed": jnp.any(overflowed)}
    if overflow_fallback and cull != "sc":
        from raytracer2_tpu.ops import traverse_bundle as tbm

        # bounded partial fallback (see occluded_bundle_pallas): re-trace
        # only the overflowed bundles through the same kernel at
        # k_cand=num_clusters (cannot truncate => exact), full retrace
        # only past fallback_bundles of them
        f = min(fallback_bundles, b)
        tn_o = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n_orig,))
        tx_o = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n_orig,))

        def _partial_fix():
            oi, valid, _ = _ovf_ray_index(overflowed, perm, p, n_orig, f)
            sub = closest_hit_bundle_pallas(
                clusters, tri_geometry, tri_primitive,
                origins[oi], directions[oi], tn_o[oi],
                jnp.where(valid, tx_o[oi], -1.0), scene_min, scene_max,
                bundle_size=p, interpret=interpret, presorted=True,
                cull="exact", group=group if sc_m == 0 else 4,
                k_cand=clusters.num_clusters, depth=depth, mb=mb,
                overflow_fallback=False, lean=lean, cull_kernel=cull_kernel,
                wald_rows=wald if not mm else None, meta_rows=meta_table)

            def put(dst, val):
                # invalid slots scatter to the dummy row n_orig (discarded)
                ext = jnp.concatenate([dst, dst[:1]])
                return ext.at[oi].set(val)[:n_orig]

            return HitRecord(
                t=put(rec.t, sub.t), u=put(rec.u, sub.u),
                v=put(rec.v, sub.v),
                geometry_index=put(rec.geometry_index, sub.geometry_index),
                primitive_id=put(rec.primitive_id, sub.primitive_id),
                triangle_index=put(rec.triangle_index, sub.triangle_index))

        def _full_fix():
            return tbm.closest_hit_bundle(
                clusters, tri_geometry, tri_primitive, origins, directions,
                t_min, t_max, scene_min, scene_max,
                sort_rays=not presorted)

        cnt = jnp.sum(overflowed.astype(jnp.int32))
        rec = jax.lax.cond(
            cnt == 0, lambda: rec,
            (lambda: jax.lax.cond(cnt <= f, _partial_fix, _full_fix))
            if f > 0 else _full_fix)
    if with_overflow:
        return rec, jnp.any(overflowed)
    return rec
