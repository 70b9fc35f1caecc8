"""nuScenes support tests on a fabricated miniature dataset."""

import json
import os

import numpy as np
import pytest

from raintpu.data.nuscenes_data import (IMAGE_WH, NuScenesCameraData,
                                        NuScenesGANCameraData, quat_rotmat)


def _write(path, rows):
    with open(path, "w") as fh:
        json.dump(rows, fh)


@pytest.fixture(scope="module")
def mini_nusc(tmp_path_factory):
    """2-frame, 1-scene nuScenes-format dataset with synthetic LiDAR."""
    root = str(tmp_path_factory.mktemp("nusc"))
    vdir = os.path.join(root, "v1.0-trainval")
    os.makedirs(vdir)
    os.makedirs(os.path.join(root, "sweeps"))

    ident = [1.0, 0.0, 0.0, 0.0]
    intr = [[800.0, 0.0, 800.0], [0.0, 800.0, 450.0], [0.0, 0.0, 1.0]]

    _write(os.path.join(vdir, "sensor.json"), [
        {"token": "sens_cam", "channel": "CAM_FRONT",
         "modality": "camera"},
        {"token": "sens_lidar", "channel": "LIDAR_TOP",
         "modality": "lidar"},
    ])
    _write(os.path.join(vdir, "calibrated_sensor.json"), [
        {"token": "cs_cam", "sensor_token": "sens_cam",
         "translation": [0.0, 0.0, 0.0], "rotation": ident,
         "camera_intrinsic": intr},
        {"token": "cs_lidar", "sensor_token": "sens_lidar",
         "translation": [0.0, 0.0, 0.0], "rotation": ident,
         "camera_intrinsic": []},
    ])
    # Ego moves 1 m in x between frames at 12 Hz -> 12 m/s = 43.2 km/h.
    _write(os.path.join(vdir, "ego_pose.json"), [
        {"token": f"pose{i}", "translation": [float(i), 0.0, 0.0],
         "rotation": ident} for i in range(2)
    ])
    _write(os.path.join(vdir, "scene.json"), [
        {"token": "scene0", "first_sample_token": "sample0",
         "name": "scene-0001"},
    ])
    _write(os.path.join(vdir, "sample.json"), [
        {"token": "sample0", "scene_token": "scene0",
         "data": {"CAM_FRONT": "sd_cam0", "LIDAR_TOP": "sd_lidar0"}},
        {"token": "sample1", "scene_token": "scene0",
         "data": {"CAM_FRONT": "sd_cam1", "LIDAR_TOP": "sd_lidar0"}},
    ])
    _write(os.path.join(vdir, "sample_data.json"), [
        {"token": "sd_cam0", "sample_token": "sample0",
         "calibrated_sensor_token": "cs_cam", "ego_pose_token": "pose0",
         "filename": "sweeps/frame0.jpg", "is_key_frame": True,
         "next": "sd_cam1"},
        {"token": "sd_cam1", "sample_token": "sample1",
         "calibrated_sensor_token": "cs_cam", "ego_pose_token": "pose1",
         "filename": "sweeps/frame1.jpg", "is_key_frame": True,
         "next": ""},
        {"token": "sd_lidar0", "sample_token": "sample0",
         "calibrated_sensor_token": "cs_lidar",
         "ego_pose_token": "pose0",
         "filename": "sweeps/scan0.pcd.bin", "is_key_frame": True,
         "next": ""},
    ])
    # LiDAR points straight ahead of the camera at known depths.
    pts = np.zeros((4, 5), np.float32)
    pts[:, 0] = [0.0, 2.0, -3.0, 0.5]       # x (lateral)
    pts[:, 1] = [0.2, -1.0, 0.5, 0.0]       # y
    pts[:, 2] = [10.0, 20.0, 15.0, 0.5]     # z = depth in camera frame
    pts.tofile(os.path.join(root, "sweeps", "scan0.pcd.bin"))
    return root


def test_quat_rotmat_identity_and_yaw():
    np.testing.assert_allclose(quat_rotmat([1, 0, 0, 0]), np.eye(3),
                               atol=1e-12)
    # 90 degree yaw about z.
    q = [np.cos(np.pi / 4), 0, 0, np.sin(np.pi / 4)]
    r = quat_rotmat(q)
    np.testing.assert_allclose(r @ [1, 0, 0], [0, 1, 0], atol=1e-12)


def test_scene_chain_and_paths(mini_nusc):
    ds = NuScenesCameraData(mini_nusc)
    assert ds.scene_tokens == ["scene0"]
    files = ds.get_filepaths("scene0")
    assert files == ["sweeps/frame0.jpg", "sweeps/frame1.jpg"]


def test_camera_settings_from_intrinsics(mini_nusc):
    ds = NuScenesCameraData(mini_nusc)
    s = ds.camera_settings("scene0")
    # focal = 800 px * 1.98 um = 1.584 mm
    assert np.isclose(s["focal"], 800 * 1.98 / 1000.0)
    assert s["width"] == 1600 and s["frequency"] == 12


def test_camera_motions_kmh(mini_nusc):
    ds = NuScenesCameraData(mini_nusc)
    speeds = ds.camera_motions("scene0")
    # 1 m / frame at 12 Hz = 43.2 km/h; last frame keeps momentum.
    np.testing.assert_allclose(speeds, [43.2, 43.2], rtol=1e-6)
    assert np.isclose(ds.scene_duration("scene0"), 2 / 12 + 1e-3)


def test_lidar_projection_depths(mini_nusc):
    ds = NuScenesCameraData(mini_nusc)
    uv, dep = ds.project_lidar_depth("sd_cam0")
    # Point (0, 0.2, 10): u = 800 + 800*0/10 = 800, v = 450 + 800*.02
    assert len(dep) >= 3
    i = np.argmin(np.abs(dep - 10.0))
    np.testing.assert_allclose(uv[i], [800.0, 450 + 800 * 0.02],
                               atol=1e-3)
    # The 0.5 m point is behind min_dist -> culled.
    assert not np.any(np.isclose(dep, 0.5))


def test_dense_depth_map(mini_nusc):
    ds = NuScenesCameraData(mini_nusc)
    d = ds.dense_depth_map("sd_cam0")
    w, h = IMAGE_WH
    assert d.shape == (h, w)
    assert np.isclose(d[450 + 16, 800], 10.0, atol=0.5)  # dilated point
    assert d.max() <= 300.0  # far plane fill


def test_gan_variant_paths(mini_nusc):
    ds = NuScenesGANCameraData(mini_nusc, gan_root="/gan",
                               post_fix="fake_B")
    files = ds.get_filepaths("scene0")
    assert files[0] == os.path.join("sweeps", "frame0_fake_B.png")


def test_depth_tool(mini_nusc, tmp_path):
    from raintpu.tools.nuscenes_depth import process

    out = str(tmp_path / "depth")
    n = process(mini_nusc, out)
    assert n == 2
    files = sorted(os.listdir(out))
    assert files == ["frame0.npy", "frame1.npy"]
    d = np.load(os.path.join(out, "frame0.npy"))
    assert d.shape == (IMAGE_WH[1], IMAGE_WH[0])
