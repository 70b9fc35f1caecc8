import os

import numpy as np
import jax.numpy as jnp
from PIL import Image

from raintpu.render.geometry import (backproject_depth, drop_distance_map,
                                     parse_kitti_calib,
                                     pixel_ray_ground_intersection)
from raintpu.tools.check_difference import compare_trees, mask_iou


def _calib_file(tmp_path):
    p = os.path.join(str(tmp_path), "calib_cam_to_cam.txt")
    fx, fy, cx, cy, tx = 720.0, 720.0, 620.0, 180.0, -270.0
    with open(p, "w") as fh:
        fh.write("calib_time: now\n")
        fh.write("R_rect_02: 1 0 0 0 1 0 0 0 1\n")
        fh.write(f"P_rect_02: {fx} 0 {cx} {tx} 0 {fy} {cy} 0 0 0 1 0\n")
    return p


def test_parse_kitti_calib(tmp_path):
    calib = parse_kitti_calib(_calib_file(tmp_path))
    assert calib.p_rect.shape == (3, 4)
    assert np.isclose(calib.cam_offset_x, 270.0 / 720.0)


def test_backproject_center_pixel(tmp_path):
    calib = parse_kitti_calib(_calib_file(tmp_path))
    depth = jnp.full((360, 1240), 10.0)
    pts = np.asarray(backproject_depth(depth, calib.projection))
    # Principal point ray: x ~ -t_x contribution, y flipped, z = depth.
    c = pts[180, 620]
    assert np.isclose(c[2], 10.0, atol=1e-3)
    assert abs(c[1]) < 0.1   # on the optical axis vertically
    d = drop_distance_map(jnp.asarray(pts),
                          jnp.asarray([[0.0, 0.0, 2.0]]))
    assert d.shape == (1, 360, 1240)
    assert np.isclose(float(d[0, 180, 620]), 8.0, atol=0.4)


def test_ray_ground_intersection(tmp_path):
    calib = parse_kitti_calib(_calib_file(tmp_path))
    # A pixel below the principal point looks down -> hits the ground.
    pt = np.asarray(pixel_ray_ground_intersection(
        jnp.asarray([620.0]), jnp.asarray([300.0]), calib.projection))
    assert pt[0, 1] > 0          # ground is below the camera
    assert pt[0, 2] > 0          # in front


def test_mask_iou():
    a = np.zeros((10, 10))
    b = np.zeros((10, 10))
    a[2:6, 2:6] = 1
    b[3:7, 3:7] = 1
    got = mask_iou(a, b)
    assert np.isclose(got, 9 / 23.0)
    assert mask_iou(np.zeros((4, 4)), np.zeros((4, 4))) == 1.0


def test_compare_trees(tmp_path):
    left = os.path.join(str(tmp_path), "L")
    right = os.path.join(str(tmp_path), "R")
    os.makedirs(os.path.join(left, "seq"))
    os.makedirs(os.path.join(right, "seq"))
    rng = np.random.RandomState(0)
    same = (rng.rand(8, 8, 3) * 255).astype(np.uint8)
    Image.fromarray(same).save(os.path.join(left, "seq", "a.png"))
    Image.fromarray(same).save(os.path.join(right, "seq", "a.png"))
    diff = same.copy()
    diff[0, 0] += 13
    Image.fromarray(same).save(os.path.join(left, "seq", "b.png"))
    Image.fromarray(diff).save(os.path.join(right, "seq", "b.png"))
    Image.fromarray(same).save(os.path.join(left, "seq", "only.png"))

    rep = compare_trees(left, right, verbose=False)
    assert rep["identical"] == 1
    assert rep["different"] == 1
    assert rep["left_only"] == 1


def test_smooth_depth(tmp_path):
    from raintpu.tools.smooth_depth import improve_depth, process_all

    rng = np.random.RandomState(0)
    gray = (rng.rand(64, 64) * 255).astype(np.uint8)
    depth = (rng.rand(64, 64) * 50).astype(np.float32)
    sm = improve_depth(gray, depth)
    assert sm.shape == depth.shape
    assert sm.std() < depth.std()  # smoothing reduces variance

    img_dir = os.path.join(str(tmp_path), "rgb")
    dep_dir = os.path.join(str(tmp_path), "dep")
    out_dir = os.path.join(str(tmp_path), "out")
    os.makedirs(img_dir)
    os.makedirs(dep_dir)
    Image.fromarray(gray).save(os.path.join(img_dir, "0.png"))
    Image.fromarray((depth * 256).astype(np.uint16)).save(
        os.path.join(dep_dir, "0.png"))
    n = process_all(img_dir, dep_dir, out_dir)
    assert n == 1
    sm2 = np.load(os.path.join(out_dir, "0.png.npy"))
    np.testing.assert_allclose(sm2, improve_depth(gray, depth), atol=0.02)
