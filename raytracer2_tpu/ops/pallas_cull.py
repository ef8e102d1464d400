"""Fused Pallas kernels for the exact-cull prep's dense slab passes.

The exact-cull prep (ops/pallas_traverse.py::_prepare_bundles_exact) runs
two dense [rays, C] slab passes over every cluster AABB: the cand0
nearest-box sort key and the per-bundle union entry table. In XLA both
passes materialize [rays, C]-class intermediates in HBM (measured: key
86 ms, union 79 ms standalone at 2.07M rays x 2030 clusters on v5e —
~4x the VPU compute bound). These kernels fuse the slab arithmetic with
its reduction so the [rays, C] plane lives only in VMEM tiles:

- nearest_box_pallas: per-ray argmin of the conservative entry distance
  (the cand0 key's dense pass). Reduction over the C lanes in-register;
  output is one i32 per ray.
- bundle_union_pallas: per-bundle (P consecutive rays) min-entry over
  the bundle — the [B, C] union table the candidate top_k ranks.
  Reduction over the P sublanes in-register; the [B, C] OUTPUT is the
  only HBM write (it is needed downstream either way).

Both kernels compute bit-identical f32 arithmetic to the XLA forms
(_entry_exact: same op order — sub, mul, min/max chain), so candidate
sets, ordering, and the final hits are exactly the XLA path's. Parity
is asserted in tests/test_bvh.py::test_cull_kernel_parity.

HARDWARE VERDICT (scripts/cullk_ab.py, ladder 2.07M rays x 3072
clusters, v5e): NEGATIVE — flag-gated OFF (cull_kernel=False default).
The key kernel runs 117 ms vs the axis-unrolled XLA pass's 80 ms
(Mosaic's scalar-looped chunk reduction loses to XLA's fused
vectorized argmin), and in-context brdf tracing regresses 0.90x
(373 -> 417 ms). The union kernel wins standalone (68 vs 79 ms) but
in-context union-only classes are a wash (shadow-z 116 -> 114,
pri-z 149 -> 148): XLA already overlaps the union pass with the rest
of the fused prep. Kept behind `cull_kernel=True` for re-testing on
future toolchains.

No reference counterpart: the reference's culling is the driver's
BLAS/TLAS traversal (/root/reference/src/context.rs:824-911); this is
original TPU work, part of the traceRayEXT rebuild.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

LANE = 128
_EPS = 1e-12
# VMEM guard: boxes [8, c_pad] + per-tile intermediates must fit. Above
# this the callers fall back to the chunked XLA passes.
MAX_C_PAD = 32768
_KEY_ROWS = 512  # rays per key-kernel grid step
_CK = 512        # cluster lanes per inner compute tile


def box_rows(amin: jax.Array, amax: jax.Array) -> jax.Array:
    """[C, 3] AABB corners -> [8, c_pad] lane-padded row table.

    Padded lanes get a degenerate FAR-AWAY box (min = max = +1e30), not
    an inverted one: an inverted box (min > max) PASSES the min/max slab
    form (near = -inf, far = +inf reads as an enclosing box). A remote
    box instead lands either near > t_max (positive inv axes) or
    far < 0 (negative inv axes) — a guaranteed miss for any ray with
    |direction| components >> 1e-25."""
    c = amin.shape[0]
    cp = -(-c // LANE) * LANE
    amin_p = jnp.pad(amin.astype(jnp.float32), ((0, cp - c), (0, 0)),
                     constant_values=1e30)
    amax_p = jnp.pad(amax.astype(jnp.float32), ((0, cp - c), (0, 0)),
                     constant_values=1e30)
    return jnp.concatenate(
        [amin_p.T, amax_p.T, jnp.zeros((2, cp), jnp.float32)], axis=0)


def _ray_cols(rows):
    """Split a [R, 8] ray-record tile into slab operands (same epsilon
    guard and op order as _entry_exact for bit parity)."""
    o = rows[:, 0:3]
    d = rows[:, 3:6]
    tn = rows[:, 6:7]
    tx = rows[:, 7:8]
    ds = jnp.where(jnp.abs(d) < _EPS, jnp.where(d >= 0, _EPS, -_EPS), d)
    return o, 1.0 / ds, tn, tx


def _entry_tile(o, inv, tn, tx, boxes_ref, c0, ck):
    """[R, ck] conservative entry distances vs box lanes [c0, c0+ck)."""
    r = o.shape[0]
    ck = min(ck, boxes_ref.shape[1] - c0)  # partial trailing chunk
    near = jnp.full((r, ck), -jnp.inf, jnp.float32)
    far = jnp.full((r, ck), jnp.inf, jnp.float32)
    for ax in range(3):
        bmin = boxes_ref[ax, c0:c0 + ck][None, :]
        bmax = boxes_ref[3 + ax, c0:c0 + ck][None, :]
        ia = inv[:, ax:ax + 1]
        oa = o[:, ax:ax + 1]
        t0 = (bmin - oa) * ia
        t1 = (bmax - oa) * ia
        near = jnp.maximum(near, jnp.minimum(t0, t1))
        far = jnp.minimum(far, jnp.maximum(t0, t1))
    hit = (near <= far) & (far >= tn) & (near <= tx) & (tx >= 0.0)
    return jnp.where(hit, jnp.maximum(near, 0.0), jnp.inf)


def _key_kernel(rays_ref, boxes_ref, out_ref, *, c_pad, ck, sub):
    # `sub` row sub-tiles per grid step so the output block's sublane
    # dim is Mosaic-legal (divisible by 8)
    r = rays_ref.shape[0] // sub
    for jj in range(sub):
        o, inv, tn, tx = _ray_cols(rays_ref[jj * r:(jj + 1) * r, :])
        best_e = jnp.full((r, 1), jnp.inf, jnp.float32)
        best_i = jnp.full((r, 1), c_pad, jnp.int32)
        for c0 in range(0, c_pad, ck):
            e = _entry_tile(o, inv, tn, tx, boxes_ref, c0, ck)
            cmin = jnp.min(e, axis=-1, keepdims=True)
            lane = jax.lax.broadcasted_iota(jnp.int32, e.shape, 1) + c0
            carg = jnp.min(jnp.where(e == cmin, lane, c_pad), axis=-1,
                           keepdims=True)
            # strict < keeps the FIRST chunk on cross-chunk ties (argmin
            # semantics); an all-inf chunk never wins (inf < inf = False)
            better = cmin < best_e
            best_i = jnp.where(better, carg, best_i)
            best_e = jnp.minimum(cmin, best_e)
        out_ref[jj, :] = best_i[:, 0]


def _union_kernel(rays_ref, boxes_ref, out_ref, *, p, mb, c_pad, ck):
    for j in range(mb):
        o, inv, tn, tx = _ray_cols(rays_ref[j * p:(j + 1) * p, :])
        for c0 in range(0, c_pad, ck):
            e = _entry_tile(o, inv, tn, tx, boxes_ref, c0, ck)
            out_ref[j, c0:c0 + e.shape[1]] = jnp.min(e, axis=0)


def cull_kernel_fits(num_clusters: int) -> bool:
    return -(-num_clusters // LANE) * LANE <= MAX_C_PAD


@partial(jax.jit, static_argnames=("interpret",))
def nearest_box_pallas(rays8: jax.Array, boxes: jax.Array,
                       interpret: bool = False) -> jax.Array:
    """Per-ray index of the nearest overlapped box (i32), c_pad where the
    ray overlaps nothing. rays8: [N, 8] packed (o, d, tn, tx) with N a
    multiple of the row tile; boxes: box_rows() output [8, c_pad]."""
    n = rays8.shape[0]
    c_pad = boxes.shape[1]
    r, sub = _KEY_ROWS, 8
    step = r * sub
    if n % step:
        # callers pad; interpret-mode tests may not
        pad = (-n) % step
        rays8 = jnp.concatenate(
            [rays8, jnp.tile(jnp.asarray(
                [[0, 0, 0, 0, 0, 1, 0, -1]], jnp.float32), (pad, 1))])
    nt = rays8.shape[0] // step
    ck = min(_CK, c_pad)
    out = pl.pallas_call(
        partial(_key_kernel, c_pad=c_pad, ck=ck, sub=sub),
        grid=(nt,),
        in_specs=[pl.BlockSpec((step, 8), lambda i: (i, 0)),
                  pl.BlockSpec((8, c_pad), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((sub, r), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((nt * sub, r), jnp.int32),
        interpret=interpret,
    )(rays8, boxes)
    return out.reshape(-1)[:n]


@partial(jax.jit, static_argnames=("p", "mb", "interpret"))
def bundle_union_pallas(rays8: jax.Array, boxes: jax.Array, p: int,
                        mb: int = 8, interpret: bool = False) -> jax.Array:
    """Per-bundle union entry table [B, c_pad] f32 (+inf where no ray in
    the bundle overlaps the box): ue[b, c] = min over the bundle's P rays
    of their conservative entry distance to box c. rays8: [B*P, 8] packed
    sorted rays."""
    n = rays8.shape[0]
    assert n % p == 0
    b = n // p
    c_pad = boxes.shape[1]
    b_pad = -(-b // mb) * mb
    if b_pad != b:
        rays8 = jnp.concatenate(
            [rays8, jnp.tile(jnp.asarray(
                [[0, 0, 0, 0, 0, 1, 0, -1]], jnp.float32),
                ((b_pad - b) * p, 1))])
    ck = min(_CK, c_pad)
    out = pl.pallas_call(
        partial(_union_kernel, p=p, mb=mb, c_pad=c_pad, ck=ck),
        grid=(b_pad // mb,),
        in_specs=[pl.BlockSpec((mb * p, 8), lambda i: (i, 0)),
                  pl.BlockSpec((8, c_pad), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((mb, c_pad), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((b_pad, c_pad), jnp.float32),
        interpret=interpret,
    )(rays8, boxes)
    return out[:b]
