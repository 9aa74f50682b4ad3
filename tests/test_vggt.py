"""VGGT branch parity vs reference torch modules (CPU, f32)."""
import numpy as np
import pytest

import conftest as C

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.parity


def _sd(mod):
    return {k: v.numpy() for k, v in mod.state_dict().items()}


@pytest.mark.skipif(not C.reference_available(), reason="reference absent")
def test_wanvae_dpt_upsampler_streaming_equivalence():
    """Full-sequence causal conv == the reference's per-frame feature-cache
    streaming decode (the core claim of ops/causal_conv.py)."""
    C.add_reference_to_path()
    from FantasyWorld.wan.modules.vae_modified import WanVAE_
    from fantasy_world_tpu.ops.causal_conv import wan_vae_dpt_upsampler
    from fantasy_world_tpu.convert.vggt import _convert_wanvae_dpt
    import jax.numpy as jnp

    torch.manual_seed(0)
    ref = WanVAE_(z_dim=8, location="DPT").float().eval()
    z = np.random.default_rng(0).standard_normal((1, 8, 5, 6, 7)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref.decode(torch.from_numpy(z)).numpy()

    sd = {"u." + k: v for k, v in _sd(ref).items()}
    p = _convert_wanvae_dpt(sd, "u")
    out = wan_vae_dpt_upsampler(p, jnp.asarray(z))
    assert out.shape == ref_out.shape == (1, 8, 17, 6, 7)
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=1e-4, atol=1e-4)


@pytest.mark.skipif(not C.reference_available(), reason="reference absent")
def test_aggregator_parity():
    C.add_reference_to_path()
    from FantasyWorld.vggt.models.aggregator import Aggregator
    from fantasy_world_tpu.models.vggt.aggregator import (
        AggregatorConfig, aggregator_forward)
    from fantasy_world_tpu.convert.vggt import convert_aggregator
    import jax.numpy as jnp

    torch.manual_seed(0)
    ref = Aggregator(img_size=64, patch_size=16, embed_dim=1024, depth=2,
                     spatial_time=3).float().eval()
    cfg = AggregatorConfig(depth=2)

    rng = np.random.default_rng(0)
    patch = rng.standard_normal((1, 3, 4, 5, 1024)).astype(np.float32)
    e0 = rng.standard_normal((1, 6, 1024)).astype(np.float32)

    with torch.no_grad():
        ref_outs, start = ref(torch.from_numpy(patch), None,
                              torch.from_numpy(e0))
    sd = {"aggregator." + k: v for k, v in _sd(ref).items()}
    params = convert_aggregator(sd, "aggregator", depth=2)
    outs, start2 = aggregator_forward(params, cfg, jnp.asarray(patch),
                                      None, jnp.asarray(e0))
    assert start2 == start == 5
    assert len(outs) == len(ref_outs) == 2
    for mine, theirs in zip(outs, ref_outs):
        np.testing.assert_allclose(np.asarray(mine), theirs.numpy(),
                                   rtol=5e-3, atol=5e-3)


@pytest.mark.skipif(not C.reference_available(), reason="reference absent")
def test_camera_head_parity():
    C.add_reference_to_path()
    from FantasyWorld.vggt.heads.camera_head import CameraHead
    from fantasy_world_tpu.models.vggt.heads import (
        CameraHeadConfig, camera_head_forward)
    from fantasy_world_tpu.convert.vggt import convert_camera_head
    import jax.numpy as jnp

    torch.manual_seed(1)
    ref = CameraHead(dim_in=128, num_heads=4).float().eval()
    cfg = CameraHeadConfig(dim_in=128, num_heads=4)

    rng = np.random.default_rng(1)
    tokens = rng.standard_normal((1, 3, 7, 128)).astype(np.float32)
    with torch.no_grad():
        ref_list = ref([torch.from_numpy(tokens)])
    sd = {"camera_head." + k: v for k, v in _sd(ref).items()}
    params = convert_camera_head(sd, "camera_head")
    preds = camera_head_forward(params, cfg, jnp.asarray(tokens))
    assert len(preds) == len(ref_list) == 4
    # pose tokens are (1 + 4*(S-1)) = 9 after temporal upsampling
    assert preds[-1].shape == tuple(ref_list[-1].shape) == (1, 9, 9)
    np.testing.assert_allclose(np.asarray(preds[-1]), ref_list[-1].numpy(),
                               rtol=5e-3, atol=5e-3)


@pytest.mark.skipif(not C.reference_available(), reason="reference absent")
def test_dpt_head_parity():
    C.add_reference_to_path()
    from FantasyWorld.vggt.heads.dpt_head import DPTHead_3D_Causal
    from fantasy_world_tpu.models.vggt.heads import (
        DPTHeadConfig, dpt_head_forward)
    from fantasy_world_tpu.convert.vggt import convert_dpt_head
    import jax.numpy as jnp

    torch.manual_seed(2)
    ref = DPTHead_3D_Causal(dim_in=64, output_dim=4, activation="inv_log",
                            conf_activation="expp1", patch_size=16,
                            features=32,
                            out_channels=[16, 32, 48, 48],
                            intermediate_layer_idx=[3, 2, 1, 0],
                            ).float().eval()
    cfg = DPTHeadConfig(dim_in=64, output_dim=4, activation="inv_log",
                        conf_activation="expp1", patch_size=16, features=32,
                        out_channels=(16, 32, 48, 48),
                        intermediate_layer_idx=(3, 2, 1, 0))

    rng = np.random.default_rng(2)
    S, ph, pw, start = 3, 4, 5, 5
    layers = [rng.standard_normal((1, S, start + ph * pw, 64)).astype(np.float32)
              for _ in range(4)]
    images = np.zeros((1, S, ph, pw, 64), np.float32)
    with torch.no_grad():
        ref_pred, ref_conf = ref([torch.from_numpy(t) for t in layers],
                                 images=torch.from_numpy(images),
                                 patch_start_idx=start)
    sd = {"dpt." + k: v for k, v in _sd(ref).items()}
    params = convert_dpt_head(sd, "dpt")
    pred, conf = dpt_head_forward(params, cfg,
                                  [jnp.asarray(t) for t in layers],
                                  (ph, pw), start)
    assert pred.shape == tuple(ref_pred.shape)
    assert conf.shape == tuple(ref_conf.shape)
    np.testing.assert_allclose(np.asarray(pred), ref_pred.numpy(),
                               rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(conf), ref_conf.numpy(),
                               rtol=5e-3, atol=5e-3)


@pytest.mark.skipif(not C.reference_available(), reason="reference absent")
def test_vggt_block_split_api():
    """attn_half + ffn_half == full block with e0 modulation."""
    from fantasy_world_tpu.models.vggt.blocks import (
        VGGTBlockConfig, init_vggt_block, vggt_block_apply,
        vggt_block_attn_half, vggt_block_ffn_half)
    import jax, jax.numpy as jnp

    cfg = VGGTBlockConfig(dim=64, num_heads=4)
    p = init_vggt_block(jax.random.PRNGKey(0), cfg, jnp.float32)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((6, 25, 64)).astype(np.float32))
    pos = jnp.asarray(np.tile(
        np.random.default_rng(4).integers(0, 5, (1, 25, 2)), (6, 1, 1)))
    e0 = jnp.asarray(rng.standard_normal((2, 6, 64)).astype(np.float32))

    full = vggt_block_apply(p, cfg, x, pos, e0)
    part, e = vggt_block_attn_half(p, cfg, x, pos, e0)
    split = vggt_block_ffn_half(p, cfg, part, e)
    np.testing.assert_allclose(np.asarray(full), np.asarray(split),
                               rtol=1e-6, atol=1e-6)
