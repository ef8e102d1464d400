"""LBVH build + traversal tests: structure validation and hit-parity against
the brute-force oracle (SURVEY.md §7 step 3)."""

import numpy as np
import jax.numpy as jnp
import pytest

from raytracer2_tpu.models import procedural as proc
from raytracer2_tpu.ops.bvh import build_lbvh, morton_codes_3d, validate_bvh
from raytracer2_tpu.ops.intersect import intersect_brute_force, occluded_brute_force
from raytracer2_tpu.ops.traverse import closest_hit, occluded
from raytracer2_tpu.scene import gltf
from raytracer2_tpu.scene.scene import build_scene


@pytest.fixture(scope="module")
def sphere_scene(tmp_path_factory):
    p = tmp_path_factory.mktemp("b") / "grid.glb"
    proc.write_glb(p, proc.sphere_grid_glb(n=2, lat=8, lon=10))
    return build_scene(gltf.load_file(p))


@pytest.fixture(scope="module")
def sphere_bvh(sphere_scene):
    return build_lbvh(sphere_scene.tri_v0, sphere_scene.tri_edge1,
                      sphere_scene.tri_edge2)


def test_morton_ordering():
    # points along the diagonal get increasing codes
    pts = jnp.asarray(np.linspace(0, 1, 16)[:, None].repeat(3, 1), jnp.float32)
    codes = np.asarray(morton_codes_3d(
        pts, jnp.zeros(3), jnp.ones(3)))
    assert np.all(np.diff(codes.astype(np.int64)) > 0)


def test_bvh_structure(sphere_bvh, sphere_scene):
    info = validate_bvh(sphere_bvh)
    assert info["max_depth"] < 64
    # root AABB covers all triangles
    v0 = np.asarray(sphere_scene.tri_v0)
    v1 = v0 + np.asarray(sphere_scene.tri_edge1)
    v2 = v0 + np.asarray(sphere_scene.tri_edge2)
    all_min = np.minimum(np.minimum(v0, v1), v2).min(0)
    all_max = np.maximum(np.maximum(v0, v1), v2).max(0)
    np.testing.assert_allclose(np.asarray(sphere_bvh.aabb_min[0]), all_min,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(sphere_bvh.aabb_max[0]), all_max,
                               atol=1e-5)


def test_duplicate_positions_ok():
    # identical centroids (duplicate morton codes) must still build
    v0 = jnp.zeros((8, 3), jnp.float32)
    e1 = jnp.tile(jnp.asarray([[1.0, 0, 0]], jnp.float32), (8, 1))
    e2 = jnp.tile(jnp.asarray([[0, 1.0, 0]], jnp.float32), (8, 1))
    bvh = build_lbvh(v0, e1, e2)
    validate_bvh(bvh)


def _random_rays(n, seed, spread=12.0):
    rng = np.random.default_rng(seed)
    origins = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    return jnp.asarray(origins), jnp.asarray(dirs)


def test_closest_hit_parity_with_brute_force(sphere_scene, sphere_bvh):
    origins, dirs = _random_rays(256, seed=5)
    t_min, t_max = 1e-3, 1e5
    ref = intersect_brute_force(
        origins, dirs, sphere_scene.tri_v0, sphere_scene.tri_edge1,
        sphere_scene.tri_edge2, sphere_scene.tri_geometry,
        sphere_scene.tri_primitive, t_min, t_max)
    got = closest_hit(
        sphere_bvh, sphere_scene.tri_v0, sphere_scene.tri_edge1,
        sphere_scene.tri_edge2, sphere_scene.tri_geometry,
        sphere_scene.tri_primitive, origins, dirs, t_min, t_max)

    np.testing.assert_array_equal(np.asarray(got.missed),
                                  np.asarray(ref.missed))
    hitm = ~np.asarray(ref.missed)
    np.testing.assert_allclose(np.asarray(got.t)[hitm],
                               np.asarray(ref.t)[hitm], rtol=1e-4)
    # same triangle except exact-tie cases
    same = (np.asarray(got.triangle_index)[hitm]
            == np.asarray(ref.triangle_index)[hitm])
    assert same.mean() > 0.99


def test_occlusion_parity(sphere_scene, sphere_bvh):
    origins, dirs = _random_rays(256, seed=9)
    t_min, t_max = 1e-3, 30.0
    ref = occluded_brute_force(
        origins, dirs, sphere_scene.tri_v0, sphere_scene.tri_edge1,
        sphere_scene.tri_edge2, t_min, t_max)
    got = occluded(
        sphere_bvh, sphere_scene.tri_v0, sphere_scene.tri_edge1,
        sphere_scene.tri_edge2, origins, dirs, t_min, t_max)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_rays_through_empty_space_miss(sphere_bvh, sphere_scene):
    origins = jnp.asarray([[100.0, 100.0, 100.0]] * 4, jnp.float32)
    dirs = jnp.asarray([[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0],
                        [0.577, 0.577, 0.577]], jnp.float32)
    got = closest_hit(
        sphere_bvh, sphere_scene.tri_v0, sphere_scene.tri_edge1,
        sphere_scene.tri_edge2, sphere_scene.tri_geometry,
        sphere_scene.tri_primitive, origins, dirs, 1e-3, 1e5)
    assert np.all(np.asarray(got.missed))
