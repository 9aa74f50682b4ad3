"""MoGe-2 port parity vs the reference torch implementation (tiny/CPU)."""
import numpy as np
import pytest

import conftest as C

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.parity


def _add_moge_paths():
    import sys
    C.add_reference_to_path()
    for p in ("/root/reference/thirdparty/MoGe",
              "/root/reference/thirdparty/utils3d"):
        if p not in sys.path:
            sys.path.insert(0, p)


@pytest.mark.skipif(not C.reference_available(), reason="reference absent")
def test_torch_bicubic_parity():
    from fantasy_world_tpu.ops.bicubic import bicubic_resize_2d
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 37, 37)).astype(np.float32)
    # size-based and scale-factor-based (DINOv2 offset kludge) paths
    ref1 = F.interpolate(torch.from_numpy(x)[None], size=(24, 30),
                         mode="bicubic", align_corners=False)[0].numpy()
    out1 = bicubic_resize_2d(x, (24, 30))
    np.testing.assert_allclose(out1, ref1, rtol=2e-4, atol=2e-4)

    sy, sx = (24 + 0.1) / 37, (30 + 0.1) / 37
    ref2 = F.interpolate(torch.from_numpy(x)[None], scale_factor=(sy, sx),
                         mode="bicubic", align_corners=False)[0].numpy()
    out2 = bicubic_resize_2d(x, ref2.shape[-2:], (sy, sx))
    np.testing.assert_allclose(out2, ref2, rtol=2e-4, atol=2e-4)


@pytest.mark.skipif(not C.reference_available(), reason="reference absent")
def test_moge_forward_parity_tiny():
    """Full MoGe graph with a shrunken DINOv2 + real neck/head topology."""
    _add_moge_paths()
    from moge.model.v2 import MoGeModel
    from fantasy_world_tpu.models.moge.model import (
        MoGeConfig, DINOv2Config, moge_forward)
    from fantasy_world_tpu.convert.moge import convert_moge
    import jax.numpy as jnp

    model_config = {
        "encoder": {"backbone": "dinov2_vits14",
                    "intermediate_layers": [2, 5, 8, 11],
                    "dim_out": 64},
        "neck": {"dim_in": [66, 2, 2, 2, 2], "dim_out": None,
                 "dim_res_blocks": [64, 48, 32, 32, 16],
                 "num_res_blocks": [0, 2, 2, 2, 0],
                 "res_block_in_norm": "none", "res_block_hidden_norm": "none",
                 "resamplers": ["conv_transpose", "conv_transpose",
                                "conv_transpose", "bilinear"]},
        "points_head": {"dim_in": [64, 48, 32, 32, 16],
                        "dim_out": [None, None, None, None, 3],
                        "dim_res_blocks": [64, 48, 32, 32, 16],
                        "num_res_blocks": [0, 1, 1, 1, 0],
                        "res_block_in_norm": "none",
                        "res_block_hidden_norm": "none",
                        "resamplers": ["conv_transpose", "conv_transpose",
                                       "conv_transpose", "bilinear"]},
        "mask_head": {"dim_in": [64, 48, 32, 32, 16],
                      "dim_out": [None, None, None, None, 1],
                      "dim_res_blocks": [64, 48, 32, 32, 16],
                      "num_res_blocks": [0, 1, 1, 1, 0],
                      "res_block_in_norm": "none",
                      "res_block_hidden_norm": "none",
                      "resamplers": ["conv_transpose", "conv_transpose",
                                     "conv_transpose", "bilinear"]},
        "scale_head": {"dims": [384, 64, 64, 1]},
        "remap_output": "exp",
        "num_tokens_range": [1200, 3600],
    }
    torch.manual_seed(0)
    ref = MoGeModel(**model_config).float().eval()

    cfg = MoGeConfig(
        encoder=DINOv2Config(dim=384, depth=12, num_heads=6),
        intermediate_layers=(2, 5, 8, 11), dim_proj_out=64,
        dim_res_blocks=(64, 48, 32, 32, 16),
        scale_head_dims=(384, 64, 64, 1), with_normal_head=False)

    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = convert_moge(sd, cfg)

    rng = np.random.default_rng(1)
    img = rng.uniform(0, 1, (1, 3, 70, 98)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(img), num_tokens=35)
    out = moge_forward(params, cfg, jnp.asarray(img), num_tokens=35)

    np.testing.assert_allclose(np.asarray(out["points"]),
                               ref_out["points"].numpy(), rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(out["mask"]),
                               ref_out["mask"].numpy(), rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(out["metric_scale"]),
                               ref_out["metric_scale"].numpy(), rtol=5e-3,
                               atol=5e-3)


@pytest.mark.skipif(not C.reference_available(), reason="reference absent")
def test_recover_focal_shift_parity():
    _add_moge_paths()
    from moge.utils.geometry_numpy import (solve_optimal_focal_shift as ref_solve)
    from fantasy_world_tpu.models.moge.infer import solve_optimal_focal_shift

    rng = np.random.default_rng(2)
    # synthesize a consistent projective point map
    H, W = 16, 20
    from fantasy_world_tpu.models.moge.model import normalized_view_plane_uv
    uv = normalized_view_plane_uv(W, H)
    true_focal, true_shift = 0.8, 0.3
    z = rng.uniform(1.0, 3.0, (H, W)).astype(np.float32)
    xy = uv * (z[..., None] + 0.0) / true_focal
    pts = np.concatenate([xy, z[..., None] - true_shift], axis=-1)

    shift, focal = solve_optimal_focal_shift(uv, pts)
    ref_shift, ref_focal = ref_solve(uv.reshape(-1, 2), pts.reshape(-1, 3))
    np.testing.assert_allclose(shift, ref_shift, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(focal, ref_focal, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(shift, true_shift, rtol=1e-2, atol=1e-2)
    np.testing.assert_allclose(focal, true_focal, rtol=1e-2, atol=1e-2)
