"""LBVH construction: Morton sort + Karras binary radix tree, fully in JAX.

Replaces the driver-built BLAS/TLAS (src/context.rs:824-911, model.rs:379-459)
with an SoA node hierarchy the traversal kernel consumes:

1. triangle centroids quantized to a 2^10 grid of the scene AABB;
2. 30-bit Morton codes, sorted with jax.lax.sort;
3. binary radix tree built in parallel per internal node (Karras 2012,
   "Maximizing Parallelism in the Construction of BVHs...") using
   common-prefix lengths with index tiebreak, so duplicate codes still
   produce a valid topology;
4. AABB fit by iterated child-union gathers (bounded by tree depth,
   <= ~32 + log2(N) with the tiebreak).

Everything is jit-compatible, so rebuilds for dynamic geometry can run
on-device each frame; static scenes build once at load like the reference's
one-time fenced BLAS build (context.rs:453-490).

Node layout (N leaves, N-1 internal nodes, root = 0):
- `left`/`right` [N-1] int32 child ids; id < N-1 is internal, id >= N-1 is
  the leaf holding sorted-triangle (id - (N-1));
- `aabb_min`/`aabb_max` [2N-1, 3] for internal then leaf nodes;
- `tri_order` [N] maps sorted leaf position -> original triangle index.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class BVH(NamedTuple):
    left: jax.Array  # [N-1] int32
    right: jax.Array  # [N-1] int32
    aabb_min: jax.Array  # [2N-1, 3] f32
    aabb_max: jax.Array  # [2N-1, 3] f32
    tri_order: jax.Array  # [N] int32 sorted -> original triangle index
    num_leaves: int


def max_depth(bvh: "BVH") -> int:
    """Host-side tree depth (root = 1). Traversal's short stack must
    cover it (ops/traverse.py asserts this instead of silently clamping
    on overflow, which dropped subtrees — ADVICE r1)."""
    import numpy as np

    left = np.asarray(bvh.left)
    right = np.asarray(bvh.right)
    n_int = left.shape[0]
    depth = np.zeros(n_int + bvh.num_leaves, np.int32)
    # children have larger post-order?? not guaranteed — BFS from root 0
    frontier = [0]
    depth[0] = 1
    best = 1
    while frontier:
        nxt = []
        for node in frontier:
            if node < n_int:
                for ch in (int(left[node]), int(right[node])):
                    depth[ch] = depth[node] + 1
                    best = max(best, int(depth[ch]))
                    nxt.append(ch)
        frontier = [n for n in nxt if n < n_int]
    return best


def _expand_bits_10(v: jax.Array) -> jax.Array:
    """Spread the low 10 bits of v so there are 2 zeros between each bit."""
    v = v.astype(jnp.uint32)
    v = (v * jnp.uint32(0x00010001)) & jnp.uint32(0xFF0000FF)
    v = (v * jnp.uint32(0x00000101)) & jnp.uint32(0x0F00F00F)
    v = (v * jnp.uint32(0x00000011)) & jnp.uint32(0xC30C30C3)
    v = (v * jnp.uint32(0x00000005)) & jnp.uint32(0x49249249)
    return v


def morton_codes_3d(points: jax.Array, box_min: jax.Array,
                    box_max: jax.Array) -> jax.Array:
    """30-bit Morton codes for [N, 3] points inside the given AABB."""
    extent = jnp.maximum(box_max - box_min, 1e-12)
    q = jnp.clip((points - box_min) / extent, 0.0, 0.9999999)
    cells = (q * 1024.0).astype(jnp.uint32)
    return (_expand_bits_10(cells[:, 0]) * jnp.uint32(4)
            + _expand_bits_10(cells[:, 1]) * jnp.uint32(2)
            + _expand_bits_10(cells[:, 2]))


def _clz32(x: jax.Array) -> jax.Array:
    return jax.lax.clz(x.astype(jnp.uint32)).astype(jnp.int32)


def build_lbvh(tri_v0: jax.Array, tri_edge1: jax.Array,
               tri_edge2: jax.Array) -> BVH:
    """Build the LBVH over a world-space triangle soup. Requires N >= 2
    (pad with a degenerate triangle upstream if necessary)."""
    n = tri_v0.shape[0]
    assert n >= 2, "build_lbvh requires at least 2 triangles"

    v1 = tri_v0 + tri_edge1
    v2 = tri_v0 + tri_edge2
    tmin = jnp.minimum(jnp.minimum(tri_v0, v1), v2)
    tmax = jnp.maximum(jnp.maximum(tri_v0, v1), v2)
    centroid = 0.5 * (tmin + tmax)

    scene_min = jnp.min(centroid, axis=0)
    scene_max = jnp.max(centroid, axis=0)
    codes = morton_codes_3d(centroid, scene_min, scene_max)

    order = jnp.argsort(codes)
    codes = codes[order].astype(jnp.uint32)
    tri_order = order.astype(jnp.int32)

    idx = jnp.arange(n, dtype=jnp.int32)

    def delta(i: jax.Array, j: jax.Array) -> jax.Array:
        """Common-prefix length with index tiebreak; -1 out of range."""
        valid = (j >= 0) & (j < n)
        jc = jnp.clip(j, 0, n - 1)
        x = codes[i] ^ codes[jc]
        tie = jnp.uint32(32) + _clz32((i ^ jc).astype(jnp.uint32)).astype(jnp.uint32)
        d = jnp.where(x == 0, tie.astype(jnp.int32), _clz32(x))
        return jnp.where(valid, d, -1)

    i = idx[: n - 1]  # internal node ids

    d = jnp.where(delta(i, i + 1) > delta(i, i - 1), 1, -1).astype(jnp.int32)
    delta_min = delta(i, i - d)

    # upper bound for range length by doubling (fixed 32 steps covers 2^32)
    def grow(k, lmax):
        cand = lmax * 2
        ok = delta(i, i + cand * d) > delta_min
        return jnp.where(ok, cand, lmax)

    l_max = jax.lax.fori_loop(
        0, 31, grow, jnp.full(n - 1, 2, jnp.int32))
    l_max = l_max * 2  # ensure strictly above the true length

    # binary search exact length
    def find_l(k, l):
        t = l_max >> (k + 1)
        ok = (t >= 1) & (delta(i, i + (l + t) * d) > delta_min)
        return l + jnp.where(ok, t, 0)

    l = jax.lax.fori_loop(0, 32, find_l, jnp.zeros(n - 1, jnp.int32))
    j = i + l * d
    delta_node = delta(i, j)

    # split search: t halves (rounded up) each step
    def find_s(k, s):
        t = (l + (1 << (k + 1)) - 1) >> (k + 1)
        ok = (t >= 1) & (delta(i, i + (s + t) * d) > delta_node)
        return s + jnp.where(ok, t, 0)

    s = jax.lax.fori_loop(0, 32, find_s, jnp.zeros(n - 1, jnp.int32))
    gamma = i + s * d + jnp.minimum(d, 0)

    range_lo = jnp.minimum(i, j)
    range_hi = jnp.maximum(i, j)
    leaf_base = n - 1
    left = jnp.where(range_lo == gamma, leaf_base + gamma, gamma)
    right = jnp.where(range_hi == gamma + 1, leaf_base + gamma + 1, gamma + 1)

    # AABB fit: leaves then iterated child-union for internal nodes.
    leaf_min = tmin[tri_order]
    leaf_max = tmax[tri_order]
    big = jnp.float32(3.0e38)
    aabb_min = jnp.concatenate(
        [jnp.full((n - 1, 3), big), leaf_min], axis=0)
    aabb_max = jnp.concatenate(
        [jnp.full((n - 1, 3), -big), leaf_max], axis=0)

    # depth bound: 32-bit prefix + ~log2(n) tiebreak levels
    iters = 34 + max(1, int(jnp.ceil(jnp.log2(n))))

    def fit(_, boxes):
        bmin, bmax = boxes
        new_min = jnp.minimum(bmin[left], bmin[right])
        new_max = jnp.maximum(bmax[left], bmax[right])
        bmin = bmin.at[: n - 1].set(new_min)
        bmax = bmax.at[: n - 1].set(new_max)
        return bmin, bmax

    aabb_min, aabb_max = jax.lax.fori_loop(
        0, iters, fit, (aabb_min, aabb_max))

    return BVH(left=left, right=right, aabb_min=aabb_min, aabb_max=aabb_max,
               tri_order=tri_order, num_leaves=n)


def validate_bvh(bvh: BVH) -> dict:
    """Host-side structural validation (test helper): every leaf reachable
    exactly once from the root, children strictly inside parent boxes."""
    import numpy as np

    n = bvh.num_leaves
    left = np.asarray(bvh.left)
    right = np.asarray(bvh.right)
    amin = np.asarray(bvh.aabb_min)
    amax = np.asarray(bvh.aabb_max)

    seen = np.zeros(n, dtype=np.int32)
    stack = [0]
    max_depth = 0
    while stack:
        max_depth = max(max_depth, len(stack))
        node = stack.pop()
        if node >= n - 1:
            seen[node - (n - 1)] += 1
            continue
        for c in (left[node], right[node]):
            assert np.all(amin[c] >= amin[node] - 1e-5), "child box escapes parent"
            assert np.all(amax[c] <= amax[node] + 1e-5), "child box escapes parent"
            stack.append(int(c))
    assert np.all(seen == 1), "leaves not covered exactly once"
    return {"max_depth": max_depth}
