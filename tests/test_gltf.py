"""glTF import + scene build tests (ref: gltf/mod.rs, model.rs)."""

import numpy as np
import pytest

from raytracer2_tpu.models import procedural as proc
from raytracer2_tpu.scene import gltf
from raytracer2_tpu.scene.scene import build_scene


@pytest.fixture(scope="module")
def cornell(tmp_path_factory):
    p = tmp_path_factory.mktemp("scenes") / "cornell.glb"
    proc.write_glb(p, proc.cornell_box_glb(light_emission=2.0))
    return gltf.load_file(p)


def test_cornell_structure(cornell):
    # 6 quads + 2 spheres = 8 nodes
    assert len(cornell.nodes) == 8
    assert cornell.positions.shape[1] == 3
    assert cornell.normals.shape == cornell.positions.shape
    assert cornell.colors.shape == (cornell.positions.shape[0], 4)
    assert cornell.uvs.shape == (cornell.positions.shape[0], 2)
    assert cornell.indices.dtype == np.uint32
    # indices reference valid vertices per-mesh
    for node in cornell.nodes:
        m = node.mesh
        idx = cornell.indices[m.index_offset:m.index_offset + m.index_count]
        assert idx.max() < m.vertex_count


def test_cornell_materials(cornell):
    light_nodes = [n for n in cornell.nodes
                   if any(e != 0 for e in n.mesh.material.emission)]
    assert len(light_nodes) == 1
    assert light_nodes[0].mesh.material.emission == (2.0, 2.0, 2.0)
    reds = [n for n in cornell.nodes
            if abs(n.mesh.material.base_color[0] - 0.65) < 1e-5]
    assert len(reds) == 1


def test_normals_unit_length(cornell):
    norms = np.linalg.norm(cornell.normals, axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)


def test_build_scene_counts(cornell):
    scene = build_scene(cornell)
    total_tris = sum(n.mesh.index_count // 3 for n in cornell.nodes)
    assert scene.num_triangles == total_tris
    # one emissive quad = 2 triangles
    assert scene.num_emissive_triangles == 2
    assert scene.tri_v0.shape == (total_tris, 3)
    assert scene.geometry.transform.shape == (8, 4, 4)


def test_scene_world_space_triangles(cornell):
    scene = build_scene(cornell)
    v0 = np.asarray(scene.tri_v0)
    e1 = np.asarray(scene.tri_edge1)
    e2 = np.asarray(scene.tri_edge2)
    # all verts inside box bounds (size 5 walls + interior spheres)
    for pts in (v0, v0 + e1, v0 + e2):
        assert np.all(np.abs(pts) <= 5.0 + 1e-4)
    # wall quads are non-degenerate (sphere pole tris are legitimately
    # zero-area and never intersect)
    areas = np.linalg.norm(np.cross(e1[:12], e2[:12]), axis=-1)
    assert np.all(areas > 1e-8)


def test_textured_scene():
    import tempfile
    from pathlib import Path

    with tempfile.TemporaryDirectory() as d:
        p = Path(d) / "tex.glb"
        proc.write_glb(p, proc.cornell_box_glb(textured_floor=True))
        model = gltf.load_file(p)
        assert len(model.images) == 1
        assert model.images[0].shape == (64, 64, 4)
        assert len(model.textures) == 1
        # default sampler at index 0, real sampler shifted to 1
        # (gltf/mod.rs:145-156, texture.rs:42)
        assert model.textures[0].sampler_index == 1
        assert len(model.samplers) == 2
        scene = build_scene(model)
        assert scene.textures.shape[0] == 1
        assert int(scene.texture_sizes[0, 0]) == 64
        tex_nodes = (np.asarray(scene.geometry.base_color_texture_index) > -1)
        assert tex_nodes.sum() == 1


def test_node_translation_applied():
    import tempfile
    from pathlib import Path

    with tempfile.TemporaryDirectory() as d:
        p = Path(d) / "grid.glb"
        proc.write_glb(p, proc.sphere_grid_glb(n=2, lat=4, lon=6))
        model = gltf.load_file(p)
        scene = build_scene(model)
        # sphere centers at x in {-1, +1}: world-space tris reflect translation
        v0 = np.asarray(scene.tri_v0)
        assert v0[:, 0].max() > 1.5 and v0[:, 0].min() < -1.5


def test_emissive_stress_light_count():
    import tempfile
    from pathlib import Path

    with tempfile.TemporaryDirectory() as d:
        p = Path(d) / "lights.glb"
        proc.write_glb(p, proc.emissive_stress_glb(num_lights=64))
        scene = build_scene(gltf.load_file(p))
        assert scene.num_emissive_triangles == 64 * 2
