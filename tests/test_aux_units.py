"""Unit coverage for the four previously-untested auxiliary modules:
convert/downloader.py (preset tables + skip-if-exists + ModelConfig),
utils/observability.py (Metrics/StepTimer/profile_trace),
cli/moge_scale.py (no-MoGe degradation path), and
hostops/geometry_train.py (training-era crop/resize/rot90/depth-IO
primitives vs their documented invariants).
"""
import os

import numpy as np
import pytest

import conftest  # noqa: F401


# ---------------------------------------------------------------------------
# convert/downloader.py
# ---------------------------------------------------------------------------

def test_preset_table_shape():
    from fantasy_world_tpu.convert.downloader import PRESET_MODELS
    # every entry is (repo_id, pattern, local_subdir) with sane parts
    for name, entries in PRESET_MODELS.items():
        assert entries, name
        for repo_id, pattern, subdir in entries:
            assert "/" in repo_id, (name, repo_id)
            assert os.path.basename(pattern), (name, pattern)
            assert subdir and not subdir.startswith("/"), (name, subdir)
    # the wan21 preset carries all 7 DiT shards + VAE + CLIP + T5 + tokenizer
    wan21 = PRESET_MODELS["Wan2.1-I2V-14B-480P"]
    shards = [e for e in wan21 if "diffusion_pytorch_model" in e[1]]
    assert len(shards) == 7


def test_download_models_skip_if_exists(tmp_path, monkeypatch):
    """Pre-placed files must never touch the hub libraries (the TPU-pod
    deployment path where weights arrive via GCS)."""
    from fantasy_world_tpu.convert import downloader

    local = tmp_path / "models" / "FantasyWorld"
    local.mkdir(parents=True)
    (local / "model.pth").write_bytes(b"x")

    def boom(*a, **k):
        raise AssertionError("hub download attempted despite local file")

    monkeypatch.setattr(downloader, "_hub_download", boom)
    out = downloader.download_models(["FantasyWorld"],
                                     local_model_path=str(tmp_path / "models"))
    assert out == [str(local / "model.pth")]

    with pytest.raises(ValueError, match="unknown preset"):
        downloader.download_models(["nope"], str(tmp_path))


def test_download_models_fetches_missing(tmp_path, monkeypatch):
    from fantasy_world_tpu.convert import downloader

    calls = []

    def fake_hub(repo_id, pattern, local_dir, priority):
        calls.append((repo_id, pattern))
        with open(os.path.join(local_dir, os.path.basename(pattern)),
                  "wb") as f:
            f.write(b"w")

    monkeypatch.setattr(downloader, "_hub_download", fake_hub)
    out = downloader.download_models(["FantasyWorld"], str(tmp_path))
    assert calls == [("amap_cvlab/FantasyWorld", "model.pth")]
    assert out and out[0].endswith("model.pth") and os.path.exists(out[0])


def test_model_config_resolution(tmp_path):
    from fantasy_world_tpu.convert.downloader import ModelConfig

    # concrete path passes through untouched
    mc = ModelConfig(path="/x/y.safetensors")
    mc.download_if_necessary()
    assert mc.path == "/x/y.safetensors"

    # neither path nor model_id is a config error
    with pytest.raises(ValueError, match="No valid model files"):
        ModelConfig().download_if_necessary()

    # glob resolution: single match collapses to a str, multi stays a list
    base = tmp_path / "org" / "repo"
    base.mkdir(parents=True)
    (base / "a-00001.safetensors").write_bytes(b"")
    (base / "a-00002.safetensors").write_bytes(b"")
    mc = ModelConfig(model_id="org/repo", origin_file_pattern="a-*.safetensors",
                     local_model_path=str(tmp_path), skip_download=True)
    mc.download_if_necessary()
    assert [os.path.basename(p) for p in mc.path] == [
        "a-00001.safetensors", "a-00002.safetensors"]

    (base / "one.pth").write_bytes(b"")
    mc = ModelConfig(model_id="org/repo", origin_file_pattern="one.pth",
                     local_model_path=str(tmp_path), skip_download=True)
    mc.download_if_necessary()
    assert mc.path == str(base / "one.pth")

    # folder pattern resolves to the directory path
    (base / "tok").mkdir()
    (base / "tok" / "spiece.model").write_bytes(b"")
    mc = ModelConfig(model_id="org/repo", origin_file_pattern="tok/",
                     local_model_path=str(tmp_path), skip_download=True)
    mc.download_if_necessary()
    assert mc.path == str(base / "tok") + "/"

    # missing + skip_download surfaces as FileNotFoundError
    mc = ModelConfig(model_id="org/repo", origin_file_pattern="missing.bin",
                     local_model_path=str(tmp_path), skip_download=True)
    with pytest.raises(FileNotFoundError):
        mc.download_if_necessary()


def test_resolve_ckpt_dir(tmp_path):
    from fantasy_world_tpu.convert.downloader import resolve_ckpt_dir

    ck = tmp_path / "Wan2.1-I2V-14B-480P"
    ck.mkdir()
    (ck / "x.safetensors").write_bytes(b"")
    assert resolve_ckpt_dir(str(ck)) == str(ck)   # populated: no download

    with pytest.raises(FileNotFoundError, match="auto-download off"):
        resolve_ckpt_dir(str(tmp_path / "absent"), auto_download=False)


# ---------------------------------------------------------------------------
# utils/observability.py
# ---------------------------------------------------------------------------

def test_metrics_registry():
    from fantasy_world_tpu.utils.observability import Metrics

    m = Metrics()
    m.count("steps")
    m.count("steps", 2)
    m.gauge("loss", 0.5)
    m.observe("fwd", 0.1)
    m.observe("fwd", 0.3)
    with m.timed("block"):
        pass
    s = m.summary()
    assert s["steps"] == 3
    assert s["loss"] == 0.5
    assert s["fwd.count"] == 2
    assert abs(s["fwd.total_s"] - 0.4) < 1e-9
    assert abs(s["fwd.mean_s"] - 0.2) < 1e-9
    assert abs(s["fwd.max_s"] - 0.3) < 1e-9
    assert s["block.count"] == 1


def test_step_timer_and_profile_trace(tmp_path):
    import jax.numpy as jnp
    from fantasy_world_tpu.utils.observability import (Metrics, StepTimer,
                                                       profile_trace)

    reg = Metrics()
    t = StepTimer("s", registry=reg)
    t.start()
    dt = t.stop(jnp.arange(4.0))       # syncs by fetching one element
    assert dt >= 0 and reg.summary()["s.count"] == 1

    with profile_trace(None):          # no-op path
        pass
    with profile_trace(str(tmp_path / "trace")):
        _ = jnp.zeros(4) + 1
    assert os.path.isdir(tmp_path / "trace")


def test_get_logger_idempotent(capsys):
    from fantasy_world_tpu.utils.observability import get_logger
    a = get_logger("fw.test.aux")
    b = get_logger("fw.test.aux")
    assert a is b and len(a.handlers) == 1


# ---------------------------------------------------------------------------
# cli/moge_scale.py
# ---------------------------------------------------------------------------

def test_moge_scale_degrades_to_first_frame_rebase():
    """No MoGe weights: the scale is identity but extrinsics still rebase
    to frame 0 (first camera becomes the origin)."""
    from fantasy_world_tpu.cli.moge_scale import moge_scale_normalize
    from fantasy_world_tpu.hostops.rotation import quat_to_mat

    rng = np.random.default_rng(0)
    S = 3
    extr = np.tile(np.eye(4, dtype=np.float32), (S, 1, 1))
    for i in range(S):
        q = rng.standard_normal(4)
        extr[i, :3, :3] = np.asarray(quat_to_mat(
            (q / np.linalg.norm(q))[None]))[0]
        extr[i, :3, 3] = rng.standard_normal(3)
    img = rng.uniform(0, 1, (8, 8, 3)).astype(np.float32)
    out = moge_scale_normalize(img, extr, np.tile(np.eye(3), (S, 1, 1)),
                               moge_infer=None)
    assert out.shape == (S, 4, 4)
    np.testing.assert_allclose(out[0], np.eye(4), atol=1e-5)
    # relative pose between frames is preserved by the rebase
    rel_in = extr[1] @ np.linalg.inv(extr[0])
    rel_out = out[1] @ np.linalg.inv(out[0])
    np.testing.assert_allclose(rel_out, rel_in, atol=1e-4)


def test_moge_scale_with_stub_inference():
    from fantasy_world_tpu.cli.moge_scale import moge_scale_normalize

    H = W = 8
    S = 2
    extr = np.tile(np.eye(4, dtype=np.float32), (S, 1, 1))
    extr[1, 0, 3] = 2.0      # 2 units of baseline
    intr = np.tile(np.eye(3, dtype=np.float32), (S, 1, 1))
    intr[:, 0, 0] = intr[:, 1, 1] = 8.0
    intr[:, 0, 2] = intr[:, 1, 2] = 4.0

    def stub(image01):
        return {"depth": np.full((H, W), 4.0, np.float32),
                "mask": np.ones((H, W), bool)}

    out = moge_scale_normalize(np.zeros((H, W, 3), np.float32), extr, intr,
                               moge_infer=stub)
    assert out.shape == (S, 4, 4)
    np.testing.assert_allclose(out[0, :3, :3], np.eye(3), atol=1e-5)
    # translations divided by the mean scene distance (~depth 4 plus ray
    # spread): strictly positive shrink of the 2-unit baseline
    assert 0 < abs(out[1, 0, 3]) < 2.0


# ---------------------------------------------------------------------------
# hostops/geometry_train.py
# ---------------------------------------------------------------------------

def test_rot90_roundtrip_and_projection_consistency():
    from fantasy_world_tpu.hostops import geometry_train as gt

    rng = np.random.default_rng(1)
    H, W = 12, 20
    img = rng.integers(0, 255, (H, W, 3), np.uint8)
    depth = rng.uniform(1, 5, (H, W)).astype(np.float32)
    extr = np.hstack([np.eye(3, dtype=np.float64),
                      np.array([[0.3], [-0.2], [1.0]])])
    intr = np.array([[10.0, 0, W / 2], [0, 11.0, H / 2], [0, 0, 1]])

    # four clockwise rotations restore pixels AND cameras exactly
    im, dp, ex, ik = img, depth, extr, intr
    for _ in range(4):
        im, dp, ex, ik = gt.rotate_90_degrees(im, dp, ex, ik, clockwise=True)
    np.testing.assert_array_equal(im, img)
    np.testing.assert_array_equal(dp, depth)
    np.testing.assert_allclose(ex, extr, atol=1e-12)
    np.testing.assert_allclose(ik, intr, atol=1e-12)

    # a world point's projection moves exactly with the camera-side rot90
    # mapping: clockwise (u,v) -> (H - v, u); counterclockwise -> (v, W - u)
    # (adjust_intrinsic_matrix_rot90's convention, no half-pixel shift)
    X = np.array([0.4, -0.1, 3.0])
    uv = intr @ (extr[:, :3] @ X + extr[:, 3])
    uv = uv[:2] / uv[2]
    for clockwise, expect in ((True, np.array([H - uv[1], uv[0]])),
                              (False, np.array([uv[1], W - uv[0]]))):
        _, _, ex2, ik2 = gt.rotate_90_degrees(img, None, extr, intr,
                                              clockwise=clockwise)
        uv2 = ik2 @ (ex2[:, :3] @ X + ex2[:, 3])
        np.testing.assert_allclose(uv2[:2] / uv2[2], expect, atol=1e-9)

    # the track mapping is its own inverse across a cw -> ccw roundtrip
    # (dims swap in the rotated frame)
    tr = np.array([[3.0, 7.0], [0.0, 0.0], [W - 1.0, H - 1.0]])
    back = gt.adjust_track_rot90(
        gt.adjust_track_rot90(tr, W, H, True), H, W, False)
    np.testing.assert_allclose(back, tr)


def test_crop_by_principal_point():
    from fantasy_world_tpu.hostops.geometry_train import (
        crop_image_depth_and_intrinsic_by_pp)

    H, W = 30, 40
    img = np.arange(H * W * 3, dtype=np.float32).reshape(H, W, 3)
    depth = np.arange(H * W, dtype=np.float32).reshape(H, W)
    intr = np.array([[12.0, 0, 23.0], [0, 13.0, 14.0], [0, 0, 1]])
    # note the module's convention: intr[1,2] indexes rows, intr[0,2] cols
    out_img, out_depth, out_intr, _, _ = crop_image_depth_and_intrinsic_by_pp(
        img, depth, intr, (16, 20))
    assert out_img.shape[0] <= 16 + 1 and out_img.shape[1] <= 20 + 1
    assert out_depth.shape == out_img.shape[:2]
    # cropped principal point lands at the crop center (within a pixel)
    assert abs(out_intr[1, 2] - out_img.shape[0] / 2) <= 1.0
    assert abs(out_intr[0, 2] - out_img.shape[1] / 2) <= 1.0

    # strict mode pads up to the exact target shape
    out_img2, out_depth2, _, _, _ = crop_image_depth_and_intrinsic_by_pp(
        img, depth, intr, (16, 20), strict=True)
    assert out_img2.shape == (16, 20, 3)
    assert out_depth2.shape == (16, 20)

    with pytest.raises(AssertionError, match="smaller than target"):
        crop_image_depth_and_intrinsic_by_pp(img, None, intr, (64, 64))


def test_resize_updates_intrinsics():
    from fantasy_world_tpu.hostops.geometry_train import (
        resize_by_short_side_and_update_intrinsics)

    H, W = 48, 84
    img = np.zeros((H, W, 3), np.uint8)
    depth = np.ones((H, W), np.float32)
    intr = np.array([[50.0, 0, W / 2], [0, 52.0, H / 2], [0, 0, 1]])
    out_img, out_depth, out_intr, track, _ = \
        resize_by_short_side_and_update_intrinsics(
            img, depth, intr, short_side_target=24,
            track=np.array([[10.0, 6.0]]))
    # the function's scale: landscape input -> max(short/h, long/w)
    scale = max(24.0 / H, (24.0 * 592.0 / 336.0) / W)
    assert out_depth.shape == out_img.shape[:2]
    assert out_img.shape[0] == int(round(H * scale))
    np.testing.assert_allclose(out_intr[0, 0], intr[0, 0] * scale, rtol=1e-6)
    np.testing.assert_allclose(out_intr[1, 1], intr[1, 1] * scale, rtol=1e-6)
    np.testing.assert_allclose(track, [[10.0 * scale, 6.0 * scale]])


def test_threshold_depth_map():
    from fantasy_world_tpu.hostops.geometry_train import threshold_depth_map

    assert threshold_depth_map(None) is None
    d = np.linspace(1, 100, 1000).reshape(20, 50)
    out = threshold_depth_map(d, max_percentile=99, min_percentile=-1)
    assert out.max() <= np.nanpercentile(d, 99)
    # min clamp alone: everything under the 10th percentile zeroed
    out3 = threshold_depth_map(d, max_percentile=-1, min_percentile=10)
    assert (out3[out3 > 0]).min() >= np.nanpercentile(d, 10)
    assert (out3 == 0).sum() >= 0.09 * d.size
    out2 = threshold_depth_map(d, max_depth=50, max_percentile=-1,
                               min_percentile=-1)
    assert out2.max() <= 50


def test_depth_png_roundtrip_and_readers(tmp_path):
    from PIL import Image
    from fantasy_world_tpu.hostops.geometry_train import (
        load_16bit_png_depth, read_depth, read_image_retry)

    rng = np.random.default_rng(2)
    depth = rng.uniform(0.5, 8.0, (6, 9)).astype(np.float16)
    png = tmp_path / "d.png"
    Image.fromarray(depth.view(np.uint16), mode="I;16").save(png)
    back = load_16bit_png_depth(str(png))
    np.testing.assert_allclose(back, depth.astype(np.float32))

    npy = tmp_path / "d.npy"
    bad = depth.astype(np.float32)
    bad[0, 0] = np.inf
    np.save(npy, bad)
    out = read_depth(str(npy), scale_adjustment=2.0)
    assert out[0, 0] == 0.0                       # non-finite zeroed
    np.testing.assert_allclose(out[1:], bad[1:] * 2.0)

    with pytest.raises(ValueError, match="unsupported depth format"):
        read_depth(str(tmp_path / "d.exr"))

    rgb = tmp_path / "im.png"
    Image.fromarray(np.zeros((4, 4, 3), np.uint8)).save(rgb)
    assert read_image_retry(str(rgb)).shape == (4, 4, 3)
    with pytest.raises(IOError, match="failed to read"):
        read_image_retry(str(tmp_path / "absent.png"), retries=2,
                         delay_s=0.0)


def test_hub_download_flattens_directory_glob(tmp_path, monkeypatch):
    """snapshot_download preserves repo-relative layout, so a pattern like
    'high_noise_model/diffusion_pytorch_model*.safetensors' into a
    local_dir that already ends in high_noise_model used to land one level
    too deep and return no paths (r4 review). The flatten must now cover
    glob patterns, not just single files."""
    import sys
    import types
    from fantasy_world_tpu.convert import downloader

    def fake_snapshot_download(repo_id, allow_patterns=None, local_dir=None):
        # the real hub writes files at local_dir/<repo-relative-path>
        pat = allow_patterns[0]
        sub = os.path.join(local_dir, os.path.dirname(pat))
        os.makedirs(sub, exist_ok=True)
        for i in (1, 2):
            with open(os.path.join(
                    sub, f"diffusion_pytorch_model-{i}.safetensors"),
                    "w") as fh:
                fh.write("x")

    fake_hub = types.ModuleType("huggingface_hub")
    fake_hub.snapshot_download = fake_snapshot_download
    monkeypatch.setitem(sys.modules, "huggingface_hub", fake_hub)
    monkeypatch.setattr(downloader, "_have_hub",
                        lambda r: r == "huggingface")

    local_dir = str(tmp_path / "Wan2.2" / "high_noise_model")
    os.makedirs(local_dir)
    downloader._hub_download(
        "PAI/x", "high_noise_model/diffusion_pytorch_model*.safetensors",
        local_dir, priority=("huggingface",))
    got = sorted(os.listdir(local_dir))
    assert got == ["diffusion_pytorch_model-1.safetensors",
                   "diffusion_pytorch_model-2.safetensors"], got


def test_model_config_folder_pattern_missing_raises(tmp_path):
    """A folder origin_file_pattern with nothing on disk must raise the
    'no files matching' error, not set a dangling path (r4 review)."""
    from fantasy_world_tpu.convert.downloader import ModelConfig
    mc = ModelConfig(model_id="x/y", origin_file_pattern="google/umt5-xxl/",
                     local_model_path=str(tmp_path), skip_download=True)
    with pytest.raises(FileNotFoundError, match="no files matching"):
        mc.download_if_necessary()


def test_model_manager_keeps_multiple_same_arch(monkeypatch):
    """Two checkpoints of one architecture (the wan22 dual 14B experts
    both hash-detect as wan_video_dit) must coexist; pre-r4 the second
    silently overwrote the first. Mirrors the reference's list +
    fetch_model(index=N) semantics (wan22 model_manager.py:383-415)."""
    from fantasy_world_tpu.convert import manager as mgr_mod
    import fantasy_world_tpu.convert.wan_dit as wd
    monkeypatch.setattr(mgr_mod, "detect",
                        lambda sd: ("wan_video_dit", {}))
    monkeypatch.setattr(wd, "convert_wan_dit", lambda sd, cfg: dict(sd))
    m = mgr_mod.ModelManager()
    m.load_model({"w": np.ones(1)})      # "high-noise expert"
    m.load_model({"w": np.zeros(1)})     # "low-noise expert"
    both = m.fetch_model("wan_video_dit", index=2)
    assert len(both) == 2
    assert both[0][1]["w"][0] == 1.0 and both[1][1]["w"][0] == 0.0
    cfg, params = m.fetch_model("wan_video_dit")   # first, like the ref
    assert params["w"][0] == 1.0


def test_track_rot90_consistent_with_image_rotation():
    """A track point must follow the pixel it annotates through rot90.
    The reference's own adjust_track_rot90 branches are swapped relative
    to its image/intrinsic maps (utils.py:785-790 vs 735-760) -- a
    deliberate-deviation fix here; the cw->ccw roundtrip test alone
    passes even with the branches swapped, so pin content-following."""
    from fantasy_world_tpu.hostops import geometry_train as gt

    H, W = 6, 9
    img = np.zeros((H, W, 3), np.float32)
    x, y = 7, 2
    img[y, x] = 1.0
    depth = np.zeros((H, W), np.float32)
    for clockwise in (True, False):
        rot_img, _ = gt.rotate_image_and_depth_rot90(img, depth, clockwise)
        (nx, ny), = gt.adjust_track_rot90(
            np.array([[x, y]], np.float64), W, H, clockwise)
        assert rot_img[int(ny), int(nx), 0] == 1.0, (clockwise, nx, ny)


def test_model_config_folder_download_keeps_nested_layout(tmp_path,
                                                          monkeypatch):
    """ModelConfig folder patterns glob base/<full pattern> (repo-relative
    layout), so _hub_download must NOT flatten for them -- the r4 fix for
    the preset tables initially flattened here too, moving the files out
    from under the glob that looks for them."""
    import sys
    import types
    from fantasy_world_tpu.convert import downloader
    from fantasy_world_tpu.convert.downloader import ModelConfig

    def fake_snapshot_download(repo_id, allow_patterns=None, local_dir=None):
        pat = allow_patterns[0]
        sub = os.path.join(local_dir, os.path.dirname(pat))
        os.makedirs(sub, exist_ok=True)
        with open(os.path.join(sub, "spiece.model"), "w") as fh:
            fh.write("x")

    fake_hub = types.ModuleType("huggingface_hub")
    fake_hub.snapshot_download = fake_snapshot_download
    monkeypatch.setitem(sys.modules, "huggingface_hub", fake_hub)
    monkeypatch.setattr(downloader, "_have_hub",
                        lambda r: r == "huggingface")

    mc = ModelConfig(model_id="x/y", origin_file_pattern="google/umt5-xxl/",
                     local_model_path=str(tmp_path),
                     download_resource="HuggingFace")
    mc.download_if_necessary()
    assert os.path.isfile(os.path.join(
        str(tmp_path), "x/y/google/umt5-xxl/spiece.model"))
    assert mc.path == os.path.join(str(tmp_path), "x/y", "google/umt5-xxl/")
