"""Camera / PlanarViewConstants tests (ref: camera.rs)."""

import numpy as np

from raytracer2_tpu.scene.camera import (
    Camera, Controls, default_camera, look_at_rh, perspective)


def test_look_at_rh_properties():
    eye = np.array([1.0, 2.0, 3.0], np.float32)
    center = np.array([0.0, 0.0, 0.0], np.float32)
    up = np.array([0.0, -1.0, 0.0], np.float32)
    m = look_at_rh(eye, center, up)
    # eye maps to origin
    p = m @ np.array([*eye, 1.0], np.float32)
    np.testing.assert_allclose(p[:3], 0.0, atol=1e-5)
    # forward dir maps to -z
    f = (center - eye) / np.linalg.norm(center - eye)
    d = m @ np.array([*f, 0.0], np.float32)
    np.testing.assert_allclose(d[:3], [0, 0, -1], atol=1e-5)
    # rotation part orthonormal
    r = m[:3, :3]
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)


def test_perspective_matches_reference_layout():
    # camera.rs:146-157: col2=(0,0,-(n+f)z,1), col3=(0,0,-2nfz,0)
    fovy, aspect, near, far = np.deg2rad(65.0), 16 / 9, 0.1, 1000.0
    m = perspective(fovy, aspect, near, far)
    y = 1.0 / np.tan(0.5 * fovy)
    z = 1.0 / (far - near)
    np.testing.assert_allclose(m[0, 0], y / aspect, rtol=1e-6)
    np.testing.assert_allclose(m[1, 1], y, rtol=1e-6)
    np.testing.assert_allclose(m[2, 2], -(near + far) * z, rtol=1e-6)
    np.testing.assert_allclose(m[2, 3], -2 * near * far * z, rtol=1e-6)
    assert m[3, 2] == 1.0 and m[3, 3] == 0.0


def test_planar_view_constants_inverses():
    cam = default_camera(window_size=(640, 360))
    pvc = cam.planar_view_constants()
    np.testing.assert_allclose(
        pvc.mat_world_to_view @ pvc.mat_view_to_world, np.eye(4), atol=1e-4)
    np.testing.assert_allclose(
        pvc.mat_view_to_clip @ pvc.mat_clip_to_view, np.eye(4), atol=1e-4)
    np.testing.assert_allclose(
        pvc.mat_world_to_clip,
        pvc.mat_view_to_clip @ pvc.mat_world_to_view, atol=1e-4)
    np.testing.assert_allclose(pvc.viewport_size, [640, 360])
    np.testing.assert_allclose(
        pvc.clip_to_window_scale, [320, -180])  # camera.rs:113
    np.testing.assert_allclose(pvc.camera_direction_or_position,
                               [*cam.position, 1.0])


def test_camera_update_forward():
    cam = default_camera()
    moved = cam.update(Controls(go_forward=True), delta_time=0.1)
    # go_forward SUBTRACTS direction (camera.rs:67-69)
    expected = np.asarray(cam.position) - np.asarray(cam.direction) * 30.0 * 0.1
    np.testing.assert_allclose(np.asarray(moved.position), expected, atol=1e-5)
    # direction unchanged without look_around
    np.testing.assert_allclose(np.asarray(moved.direction),
                               np.asarray(cam.direction))


def test_camera_look_around_normalized():
    cam = default_camera()
    turned = cam.update(
        Controls(look_around=True, cursor_delta=(10.0, -5.0)), delta_time=0.016)
    d = np.asarray(turned.direction)
    np.testing.assert_allclose(np.linalg.norm(d), 1.0, atol=1e-5)
    assert not np.allclose(d, np.asarray(cam.direction))


def test_camera_direction_always_normalized():
    cam = Camera(position=(0, 0, 0), direction=(3.0, 4.0, 0.0), fov=65,
                 aspect_ratio=1.0, z_near=0.1, z_far=100.0)
    np.testing.assert_allclose(np.linalg.norm(cam.direction), 1.0, atol=1e-6)
