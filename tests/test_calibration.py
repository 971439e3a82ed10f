"""Calibration/rectification parity vs cv2 (oracle only)."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from evfly_tpu.utils.calibration import (
    CameraSystem,
    build_undistort_rectify_map,
    remap_events,
    remap_image,
    undistort_points,
)

K = np.array([[320.0, 0.0, 170.0], [0.0, 321.0, 130.0], [0.0, 0.0, 1.0]])
DIST = np.array([-0.25, 0.08, 0.0005, -0.0003])
SIZE = (346, 260)  # (W, H)


def test_undistort_rectify_map_matches_cv2():
    P = K.copy()
    ours_x, ours_y = build_undistort_rectify_map(K, DIST, P, SIZE)
    ref_x, ref_y = cv2.initUndistortRectifyMap(K, DIST, None, P, SIZE, cv2.CV_32FC1)
    np.testing.assert_allclose(ours_x, ref_x, atol=1e-2)
    np.testing.assert_allclose(ours_y, ref_y, atol=1e-2)


def test_undistort_rectify_with_rotation():
    theta = np.deg2rad(2.0)
    R = np.array(
        [[np.cos(theta), -np.sin(theta), 0], [np.sin(theta), np.cos(theta), 0], [0, 0, 1]]
    )
    P = K @ R
    ours_x, ours_y = build_undistort_rectify_map(K, DIST, P, SIZE)
    ref_x, ref_y = cv2.initUndistortRectifyMap(K, DIST, None, P, SIZE, cv2.CV_32FC1)
    np.testing.assert_allclose(ours_x, ref_x, atol=1e-2)
    np.testing.assert_allclose(ours_y, ref_y, atol=1e-2)


def test_undistort_points_matches_cv2():
    rng = np.random.default_rng(0)
    pts = rng.uniform([20, 20], [320, 240], size=(50, 2)).astype(np.float64)
    ours = undistort_points(pts, K, DIST, R=np.eye(3), P=K)
    ref = cv2.undistortPoints(
        pts.reshape(-1, 1, 2), K, DIST, None, np.eye(3), K
    ).reshape(-1, 2)
    np.testing.assert_allclose(ours, ref, atol=5e-3)


def test_camera_system_and_aligner_roundtrip(tmp_path):
    data = {
        "cam0": {
            "intrinsics": [390.0, 391.0, 320.0, 240.0],
            "distortion_coeffs": [-0.1, 0.02, 0.0, 0.0],
            "distortion_model": "radtan",
            "resolution": [640, 480],
        },
        "cam1": {
            "intrinsics": [330.0, 331.0, 170.0, 128.0],
            "distortion_coeffs": [-0.3, 0.1, 0.001, -0.001],
            "distortion_model": "radtan",
            "resolution": [346, 260],
            "T_cn_cnm1": np.block(
                [[np.eye(3), np.array([[0.05], [0.0], [0.0]])], [np.zeros((1, 3)), np.ones((1, 1))]]
            ).tolist(),
        },
    }
    sys_ = CameraSystem(data, fix_rotation=True)
    maps = sys_.get_remapping()
    assert maps["img_mapx"].shape == (260, 346)
    assert maps["ev_mapx"].shape == (260, 346)
    # forward map then inverse map lands near identity in valid regions
    H, W = 260, 346
    evx, evy = maps["ev_mapx"], maps["ev_mapy"]
    invx, invy = maps["inv_mapx"], maps["inv_mapy"]
    cy, cx = H // 2, W // 2
    sx, sy = evx[cy, cx], evy[cy, cx]
    rx = invx[int(round(sy)), int(round(sx))]
    ry = invy[int(round(sy)), int(round(sx))]
    assert abs(rx - cx) < 2.0 and abs(ry - cy) < 2.0


def test_remap_image_vs_cv2_linear():
    rng = np.random.default_rng(1)
    img = rng.random((120, 160)).astype(np.float32)
    mapx, mapy = build_undistort_rectify_map(
        np.array([[150.0, 0, 80.0], [0, 150.0, 60.0], [0, 0, 1]]),
        np.array([-0.2, 0.05, 0, 0]),
        np.array([[150.0, 0, 80.0], [0, 150.0, 60.0], [0, 0, 1]]),
        (160, 120),
    )
    ours = remap_image(img, mapx, mapy)
    ref = cv2.remap(img, mapx, mapy, cv2.INTER_LINEAR)
    # interior parity (border policies differ at the very edge)
    np.testing.assert_allclose(ours[5:-5, 5:-5], ref[5:-5, 5:-5], atol=1e-4)


def test_remap_events_filters_out_of_bounds():
    mapx = np.tile(np.arange(20, dtype=np.float32) * 2.0, (10, 1))  # x*2 pushes right half out
    mapy = np.tile(np.arange(10, dtype=np.float32)[:, None], (1, 20))
    events = {
        "x": np.array([1, 5, 15]),
        "y": np.array([2, 3, 4]),
        "t": np.array([10, 20, 30]),
        "p": np.array([1, -1, 1]),
    }
    out = remap_events(events, mapx, mapy, shape=(20, 10))
    assert len(out["x"]) == 2  # x=15 -> 30 out of bounds
    np.testing.assert_allclose(out["x"], [2.0, 10.0])
