"""Geometry unit tests: pose construction and helioprojective ray generation
against hand-computed cases (reference semantics:
coordinate_transformation.py:36-54, ray_sampling.py:7-36)."""
import numpy as np

from sunerf_tpu.core.geometry import (camera_angle_grid, fov_for_distance,
                                      get_rays, observer_rays, pose_spherical,
                                      spherical_to_cartesian)


def test_pose_origin_at_distance():
    for theta, phi, r in [(0.0, 0.0, 3.0), (0.7, -0.3, 2.0), (np.pi / 2, 0.2, 10.0)]:
        c2w = pose_spherical(theta, phi, r)
        origin = c2w[:3, 3]
        assert np.isclose(np.linalg.norm(origin), r, rtol=1e-5)


def test_pose_zero_angles_places_camera_on_y():
    # c2w = axis_swap @ trans_t(r): translation (0,0,r) -> swapped to (0, r, 0)
    c2w = pose_spherical(0.0, 0.0, 5.0)
    np.testing.assert_allclose(c2w[:3, 3], [0.0, 5.0, 0.0], atol=1e-6)


def test_pose_rotation_is_orthonormal():
    c2w = pose_spherical(0.4, 1.1, 2.5)
    R = c2w[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)


def test_central_ray_points_at_sun():
    """The Tx=Ty=0 ray must point from the camera toward the origin."""
    for theta, phi in [(0.0, 0.0), (0.5, 0.3), (-1.2, 0.9)]:
        c2w = pose_spherical(theta, phi, 4.0)
        tx = np.zeros((1, 1), np.float32)
        ty = np.zeros((1, 1), np.float32)
        rays_o, rays_d = get_rays(tx, ty, c2w)
        expected = -rays_o[0, 0] / np.linalg.norm(rays_o[0, 0])
        np.testing.assert_allclose(rays_d[0, 0], expected, atol=1e-5)


def test_rays_unit_norm():
    c2w = pose_spherical(0.3, -0.2, 3.0)
    tx, ty = camera_angle_grid(16, 0.5)
    _, rays_d = get_rays(tx, ty, c2w)
    np.testing.assert_allclose(np.linalg.norm(rays_d, axis=-1), 1.0, atol=1e-5)


def test_camera_frame_directions():
    """Reference convention (ray_sampling.py:15-17): central pixel looks down
    -z in camera frame; +Tx tips the direction toward +x."""
    c2w = np.eye(4, dtype=np.float32)  # identity pose: camera frame == world
    tx = np.array([[0.0, 0.1]], np.float32)
    ty = np.array([[0.0, 0.0]], np.float32)
    _, rays_d = get_rays(tx, ty, c2w)
    np.testing.assert_allclose(rays_d[0, 0], [0, 0, -1], atol=1e-6)
    assert rays_d[0, 1][0] > 0  # +Tx -> +x


def test_fov_frames_the_disk():
    fov = fov_for_distance(10.0, extent_rs=1.3)
    assert np.isclose(np.tan(fov / 2) * 10.0, 1.3, rtol=1e-6)


def test_observer_rays_shapes():
    rays_o, rays_d = observer_rays(lat=0.2, lon=1.0, distance=5.0, resolution=8)
    assert rays_o.shape == (8, 8, 3) and rays_d.shape == (8, 8, 3)
    assert np.allclose(np.linalg.norm(rays_o[0, 0]), 5.0, rtol=1e-5)


def test_spherical_to_cartesian():
    v = spherical_to_cartesian(2.0, 0.0, 0.0)
    np.testing.assert_allclose(v, [2.0, 0.0, 0.0], atol=1e-7)
    v = spherical_to_cartesian(1.0, np.pi / 2, 0.0)
    np.testing.assert_allclose(v, [0.0, 0.0, 1.0], atol=1e-7)
