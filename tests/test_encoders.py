"""T5 text encoder and CLIP visual tower parity (tiny configs, f32, CPU)."""
import numpy as np
import pytest

import conftest as C

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.parity


@pytest.mark.skipif(not C.reference_available(), reason="reference absent")
def test_t5_encoder_parity():
    C.add_reference_to_path()
    from FantasyWorld.diffsynth_wan21.models.wan_video_text_encoder import (
        WanTextEncoder)
    from fantasy_world_tpu.models.wan.t5 import T5Config, t5_encode
    from fantasy_world_tpu.convert.encoders import convert_t5
    import jax.numpy as jnp

    torch.manual_seed(0)
    ref = WanTextEncoder(vocab=100, dim=64, dim_attn=64, dim_ffn=128,
                         num_heads=4, num_layers=2, num_buckets=32,
                         shared_pos=False, dropout=0.0).float().eval()
    cfg = T5Config(vocab=100, dim=64, dim_attn=64, dim_ffn=128, num_heads=4,
                   num_layers=2)
    ids = np.random.default_rng(0).integers(0, 100, (2, 23))
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(ids)).numpy()
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    out = t5_encode(convert_t5(sd, cfg), cfg, jnp.asarray(ids, jnp.int32))
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=2e-3, atol=2e-3)


@pytest.mark.skipif(not C.reference_available(), reason="reference absent")
def test_clip_vision_parity():
    C.add_reference_to_path()
    from FantasyWorld.diffsynth_wan21.models.wan_video_image_encoder import (
        VisionTransformer)
    from fantasy_world_tpu.models.wan.clip import (
        CLIPVisionConfig, clip_encode_image)
    from fantasy_world_tpu.convert.encoders import convert_clip_vision
    import jax.numpy as jnp

    torch.manual_seed(1)
    ref = VisionTransformer(image_size=28, patch_size=14, dim=64, mlp_ratio=4,
                            out_dim=32, num_heads=4, num_layers=3,
                            pool_type="token", pre_norm=True,
                            activation="gelu").float().eval()
    cfg = CLIPVisionConfig(image_size=28, patch_size=14, dim=64, num_heads=4,
                           num_layers=3)
    imgs = np.random.default_rng(1).standard_normal((2, 3, 28, 28)).astype(
        np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(imgs), use_31_block=True).numpy()
    sd = {"model.visual." + k: v.numpy() for k, v in ref.state_dict().items()}
    out = clip_encode_image(convert_clip_vision(sd, cfg), cfg,
                            jnp.asarray(imgs), use_31_block=True)
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=2e-3, atol=2e-3)


def test_clip_preprocess_matches_torch_bicubic():
    """preprocess_image's resize must be the torch bicubic kernel
    (a=-0.75, half-pixel), NOT jax.image.resize's Catmull-Rom (a=-0.5):
    encode_image resizes with F.interpolate(mode='bicubic') at
    wan_video_image_encoder.py:864-880 and the r4 review caught the
    kernel-coefficient mismatch. Cross-checked against torch directly."""
    import torch
    import torch.nn.functional as F
    import jax.numpy as jnp
    from fantasy_world_tpu.models.wan.clip import (
        preprocess_image, CLIP_IMAGE_MEAN, CLIP_IMAGE_STD)

    rng = np.random.default_rng(11)
    img = rng.standard_normal((1, 3, 336, 592)).astype(np.float32)
    img = np.clip(img, -1, 1)

    got = np.asarray(preprocess_image(jnp.asarray(img)))

    with torch.no_grad():
        t = F.interpolate(torch.from_numpy(img), size=(224, 224),
                          mode="bicubic", align_corners=False)
    ref = t.numpy() * 0.5 + 0.5
    ref = ((ref - np.asarray(CLIP_IMAGE_MEAN)[None, :, None, None])
           / np.asarray(CLIP_IMAGE_STD)[None, :, None, None])
    np.testing.assert_allclose(got, ref, atol=1e-3)  # f32 order-of-ops; a=-0.5 would be ~0.8 post-norm
