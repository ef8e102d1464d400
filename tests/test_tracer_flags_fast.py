"""Fast-tier tracer-flag parity matrix (VERDICT r3 #7).

One tiny scene (a ~100-tri sphere, cluster_size=4) x 96 rays, every
tracer config flag checked for exact-hit parity against the brute-force
oracle in interpret mode. This keeps flag coverage in `pytest -m "not
slow"`; the full-size parity classes in tests/test_bvh.py stay the slow
round gate.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from raytracer2_tpu.models import procedural as proc
from raytracer2_tpu.ops.intersect import intersect_brute_force
from raytracer2_tpu.scene import gltf
from raytracer2_tpu.scene.scene import build_scene

N_RAYS = 96

CONFIGS = {
    "exact": dict(cull="exact"),
    "interval": dict(cull="interval"),
    "sc": dict(cull="sc"),
    "octz": dict(sort_key="octz"),
    "hier_key": dict(sort_key="hier"),
    "mm": dict(mm=True),
    "lean": dict(lean=True),
    "t_cap": dict(t_cap=True),
    "cull_kernel": dict(cull_kernel=True),
}


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    p = tmp_path_factory.mktemp("tf") / "s.glb"
    proc.write_glb(p, proc.sphere_grid_glb(n=1, lat=6, lon=8))
    scene = build_scene(gltf.load_file(p))

    from raytracer2_tpu.ops.cluster import build_clusters

    clusters = build_clusters(scene.tri_v0, scene.tri_edge1,
                              scene.tri_edge2, cluster_size=4)
    smin = jnp.min(clusters.aabb_min, 0)
    smax = jnp.max(clusters.aabb_max, 0)

    rng = np.random.default_rng(77)
    origins = jnp.asarray(rng.uniform(-4, 4, (N_RAYS, 3)).astype(np.float32))
    d = rng.normal(size=(N_RAYS, 3)).astype(np.float32)
    dirs = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    ref = intersect_brute_force(
        origins, dirs, scene.tri_v0, scene.tri_edge1, scene.tri_edge2,
        scene.tri_geometry, scene.tri_primitive, 1e-3, 1e5)
    return scene, clusters, smin, smax, origins, dirs, ref


@pytest.mark.parametrize("name", sorted(CONFIGS))
def test_flag_parity(tiny, name):
    from raytracer2_tpu.ops.pallas_traverse import closest_hit_bundle_pallas

    scene, clusters, smin, smax, origins, dirs, ref = tiny
    got = closest_hit_bundle_pallas(
        clusters, scene.tri_geometry, scene.tri_primitive,
        origins, dirs, 1e-3, jnp.full((N_RAYS,), 1e5), smin, smax,
        bundle_size=32, interpret=True, **CONFIGS[name])
    np.testing.assert_array_equal(np.asarray(got.missed),
                                  np.asarray(ref.missed))
    m = ~np.asarray(ref.missed)
    np.testing.assert_allclose(np.asarray(got.t)[m],
                               np.asarray(ref.t)[m], rtol=1e-3)


def test_pairs_backend_parity(tiny):
    from raytracer2_tpu.ops.pallas_pairs import (
        build_pair_scene, closest_hit_pairs)

    scene, clusters, smin, smax, origins, dirs, ref = tiny
    ps = build_pair_scene(clusters, scene.tri_geometry,
                          scene.tri_primitive, group=4)
    got = closest_hit_pairs(
        ps, clusters, scene.tri_geometry, scene.tri_primitive,
        origins, dirs, 1e-3, jnp.full((N_RAYS,), 1e5), smin, smax,
        k_cand=32, interpret=True, fallback=False)
    np.testing.assert_array_equal(np.asarray(got.missed),
                                  np.asarray(ref.missed))
    m = ~np.asarray(ref.missed)
    np.testing.assert_allclose(np.asarray(got.t)[m],
                               np.asarray(ref.t)[m], rtol=1e-3)
