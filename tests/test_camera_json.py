"""make_camera_json: schema, pose validity, loader round-trip (fast tier)."""
import json

import numpy as np
import pytest

from fantasy_world_tpu.cli.make_camera_json import (
    build_camera_json, interpolate_keyframes, main, preset_trajectory)
from fantasy_world_tpu.hostops.camera import cameras_json_to_camera_list

PRESETS = ["static", "dolly_in", "dolly_out", "truck_left", "truck_right",
           "pedestal_up", "pedestal_down", "pan_left", "pan_right",
           "tilt_up", "tilt_down", "orbit_left", "orbit_right"]


@pytest.mark.parametrize("motion", PRESETS)
def test_preset_poses_valid(motion):
    c2w = preset_trajectory(motion, 17, 0.5, 20.0)
    assert c2w.shape == (17, 4, 4)
    np.testing.assert_allclose(c2w[0], np.eye(4), atol=1e-12)  # starts at identity
    for m in c2w:
        np.testing.assert_allclose(m[:3, :3] @ m[:3, :3].T, np.eye(3),
                                   atol=1e-10)
        np.testing.assert_allclose(m[3], [0, 0, 0, 1], atol=0)


def test_orbit_keeps_pivot_centered():
    dist = 0.7
    c2w = preset_trajectory("orbit_right", 9, dist, 45.0)
    pivot = np.array([0, 0, dist, 1.0])
    for m in c2w:
        # pivot expressed in camera coords must stay on the optical axis
        cam = np.linalg.inv(m) @ pivot
        np.testing.assert_allclose(cam[:2], 0, atol=1e-10)
        np.testing.assert_allclose(cam[2], dist, atol=1e-10)


def test_keyframe_interpolation_endpoints_and_geodesic():
    a = np.eye(4)
    b = preset_trajectory("orbit_right", 3, 0.5, 30.0)[-1]
    tr = interpolate_keyframes(a, b, 21)
    np.testing.assert_allclose(tr[0], a, atol=1e-12)
    np.testing.assert_allclose(tr[-1], b, atol=1e-10)
    # slerp => constant angular velocity between consecutive frames
    angs = []
    for m0, m1 in zip(tr[:-1], tr[1:]):
        r = m0[:3, :3].T @ m1[:3, :3]
        angs.append(np.arccos(np.clip((np.trace(r) - 1) / 2, -1, 1)))
    np.testing.assert_allclose(angs, angs[0], atol=1e-8)


def test_cli_roundtrip_through_loader(tmp_path):
    out = tmp_path / "cam.json"
    main(["--out", str(out), "--motion", "pan_left", "--frames", "11",
          "--focal_length", "500"])
    data = json.loads(out.read_text())
    assert set(data) == {"focal_length", "scale", "cameras", "cameras_interp"}
    assert len(data["cameras_interp"]) == 11 and len(data["cameras"]) == 2
    cams = cameras_json_to_camera_list(data, image_size=(336, 592))
    assert len(cams) == 11 and cams[0].fx == 500.0

    # keyframe mode re-interpolates the generated file's keyframe pair
    out2 = tmp_path / "cam2.json"
    main(["--out", str(out2), "--keyframes", str(out), "--frames", "7"])
    d2 = json.loads(out2.read_text())
    assert len(d2["cameras_interp"]) == 7
    np.testing.assert_allclose(d2["cameras_interp"][0],
                               data["cameras_interp"][0], atol=1e-12)
    np.testing.assert_allclose(d2["cameras_interp"][-1],
                               data["cameras_interp"][-1], atol=1e-10)
