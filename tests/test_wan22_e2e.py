"""End-to-end joint_forward parity vs the reference wan22 fusion model.

test_fusion_e2e pins the wan21 orchestration; the wan22 variant differs in
its conditioning plumbing -- control-camera latents folded into the patch
embedding through SimpleAdapter (pixel-unshuffle 8x + patch-stride conv),
no CLIP branch, require_vae_embedding y-concat -- while sharing the
PCB/IRG interleave. This runs the reference model_wan22.py joint_forward
(assembled via __new__ + the deepcopy->Identity IRG surgery of :199-226,
exactly like the wan21 builder) against our joint_forward with
control_camera_latents on one tiny config, heads included.

Reference: fusion/model_wan22.py:231-348, wan22 wan_video_dit.py:386
(control_adapter), wan_video_camera_controller.py:8-33 (SimpleAdapter).
"""
import numpy as np
import pytest

import conftest as C

torch = pytest.importorskip("torch")

pytestmark = [pytest.mark.parity, pytest.mark.parity_fast]

from test_checkpoint_rehearsal import _wan22_cfg, AGG_DIM, HIDDEN  # noqa: E402

B, F, H2, W2 = 1, 3, 8, 12
START, N_IRG, DIM = 2, 4, 96


def _build_wan22_fusion():
    C.add_reference_to_path()
    import copy
    import torch.nn as nn
    from FantasyWorld.fusion.model_wan22 import FantasyWorldFusionModel
    from FantasyWorld.fusion.layer.block import IRGBlock
    from FantasyWorld.diffsynth_wan22.models.wan_video_dit import (
        WanModel, precompute_freqs_cis_3d)
    from FantasyWorld.vggt.models.vggt import VGGT
    from FantasyWorld.vggt.heads.camera_head import CameraHead
    from FantasyWorld.vggt.heads.dpt_head import DPTHead_3D_Causal
    from test_fusion_e2e import _patched_aggregator_class
    Aggregator = _patched_aggregator_class()

    torch.manual_seed(31)
    dit = WanModel(has_image_input=False, patch_size=[1, 2, 2], in_dim=8,
                   dim=DIM, ffn_dim=128, freq_dim=64, text_dim=32, out_dim=4,
                   num_heads=4, num_layers=START + N_IRG, eps=1e-6,
                   has_ref_conv=False, add_control_adapter=True,
                   in_dim_control_adapter=24,
                   require_clip_embedding=False).float().eval()

    def dpt(out_dim, act):
        return DPTHead_3D_Causal(dim_in=2 * AGG_DIM, output_dim=out_dim,
                                 activation=act, conf_activation="expp1",
                                 patch_size=16, features=32,
                                 out_channels=[16, 32, 48, 48],
                                 intermediate_layer_idx=[3, 2, 1, 0]
                                 ).float().eval()

    vggt = VGGT.__new__(VGGT)
    nn.Module.__init__(vggt)
    vggt.spatial_frame = F
    vggt.freq_dim = 64
    vggt.embed_dim = AGG_DIM
    vggt.projection_head = nn.Conv3d(DIM, AGG_DIM, 1)
    vggt.aggregator = Aggregator(img_size=64, patch_size=16,
                                 embed_dim=AGG_DIM, depth=N_IRG, num_heads=4,
                                 spatial_time=F)
    vggt.camera_head = CameraHead(dim_in=2 * AGG_DIM, num_heads=4)
    vggt.depth_head = dpt(2, "exp")
    vggt.point_head = dpt(4, "inv_log")
    vggt.track_head = None
    vggt.time_embedding = nn.Sequential(nn.Linear(64, AGG_DIM), nn.SiLU(),
                                        nn.Linear(AGG_DIM, AGG_DIM))
    vggt.time_projection = nn.Sequential(nn.SiLU(),
                                         nn.Linear(AGG_DIM, AGG_DIM * 6))
    vggt.float().eval()

    class Pipe(nn.Module):
        def __init__(self, dit):
            super().__init__()
            self.dit = dit

    m = FantasyWorldFusionModel.__new__(FantasyWorldFusionModel)
    nn.Module.__init__(m)
    m.pipe = Pipe(dit)
    m.vggt = vggt
    m.camera_control = True
    m.start_index = START
    m.use_gradient_checkpointing = False
    m.use_gradient_checkpointing_offload = False
    m.cross_attention_list = list(range(N_IRG))
    m.device = "cpu"
    m.bicross_dim = HIDDEN
    m.bicross_num_heads = 4
    m.freqs_bicross = precompute_freqs_cis_3d(HIDDEN // 4)
    m.use_info = False

    base_sd = {k: v.numpy().copy() for k, v in dit.state_dict().items()}

    irg_blocks = nn.ModuleList()
    for idx in m.cross_attention_list:
        dit_copy = copy.deepcopy(m.pipe.dit.blocks[idx + m.start_index])
        agg_copy = copy.deepcopy(m.vggt.aggregator.global_blocks[idx])
        m.pipe.dit.blocks[idx + m.start_index] = nn.Identity()
        m.vggt.aggregator.global_blocks[idx] = nn.Identity()
        irg_blocks.append(IRGBlock(
            x_agg_block=agg_copy, x_dit_block=dit_copy,
            m1_dim=DIM, m2_dim=AGG_DIM, hidden_size=HIDDEN,
            num_heads=4, drop_path=None))
    m.IRGBlock = irg_blocks
    with torch.no_grad():
        for irg in m.IRGBlock:
            irg.bicross_attention.gamma_m1.normal_(std=0.05)
            irg.bicross_attention.gamma_m2.normal_(std=0.05)
    m.float().eval()
    return m, base_sd


@pytest.mark.skipif(not C.reference_available(), reason="reference absent")
def test_wan22_joint_forward_e2e_parity():
    import jax.numpy as jnp
    from fantasy_world_tpu.convert.fusion import convert_fusion_checkpoint
    from fantasy_world_tpu.models.fusion.model import (
        prepare_scan_params, joint_forward)

    ref, base_sd = _build_wan22_fusion()
    cfg = _wan22_cfg(START, N_IRG, DIM)
    fusion_sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = convert_fusion_checkpoint(fusion_sd, base_sd, cfg)
    scan = prepare_scan_params(params, cfg)

    rng = np.random.default_rng(41)
    latents = rng.standard_normal((B, 4, F, H2, W2)).astype(np.float32)
    ctx = rng.standard_normal((B, 20, 32)).astype(np.float32)
    y = rng.standard_normal((B, 4, F, H2, W2)).astype(np.float32)
    # control-camera latents at PIXEL resolution (the 4-frame plucker fold;
    # SimpleAdapter pixel-unshuffles 8x then convs stride-2 to the grid)
    ctrl = (rng.standard_normal((B, 24, F, H2 * 8, W2 * 8)) * 0.3
            ).astype(np.float32)
    t = np.full((B,), 500.0, np.float32)

    with torch.no_grad():
        ref_noise, ref_pred = ref.joint_forward(
            torch.from_numpy(latents), timestep=torch.from_numpy(t),
            context=torch.from_numpy(ctx), y=torch.from_numpy(y),
            use_gradient_checkpointing=False,
            control_camera_latents_input=torch.from_numpy(ctrl),
            return_prediction=True)

    noise, pred = joint_forward(
        params, scan, cfg, jnp.asarray(latents), jnp.asarray(t),
        jnp.asarray(ctx), None, jnp.asarray(y),
        control_camera_latents=jnp.asarray(ctrl), return_prediction=True)

    np.testing.assert_allclose(np.asarray(noise, np.float32),
                               ref_noise.numpy(), rtol=2e-3, atol=2e-3)
    assert pred is not None and ref_pred is not None
    for k in ("pose_enc", "depth", "depth_conf", "world_points",
              "world_points_conf"):
        r = ref_pred[k].float().numpy()
        o = np.asarray(pred[k], np.float32)
        assert o.shape == r.shape, (k, o.shape, r.shape)
        np.testing.assert_allclose(o, r, rtol=8e-3, atol=8e-3, err_msg=k)
