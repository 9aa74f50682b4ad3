"""Multi-step generate_video loop parity vs the reference.

test_fusion_e2e pins a single joint_forward evaluation; this test pins the
ASSEMBLED denoise loop -- scheduler step ordering, sigma pairing, the CFG
combine, noise generation, and final-step prediction timing -- against the
reference's FantasyWorldFusionModel.generate_video semantics
(fusion/model_wan21.py:226-324) over 6 steps with identical injected noise,
fp32. Error compounding across steps is the stated hard part (SURVEY 7.3);
this is where a subtly-wrong sigma indexing or a CFG sign flip shows up
while single-step parity stays green.

The reference side replicates generate_video's loop body verbatim with the
reference FlowMatchScheduler(shift=5, sigma_min=0.0, extra_one_step=True)
(wan_video.py:32-33) and BasePipeline.generate_noise seeding
(base.py:124-127 + the torch.manual_seed(1024) quirk, model_wan21.py:250).
"""
import numpy as np
import pytest

import conftest as C

torch = pytest.importorskip("torch")

pytestmark = [pytest.mark.parity, pytest.mark.parity_fast]

from test_fusion_e2e import (_build_reference, _our_config,   # noqa: E402
                             B, F, H2, W2)

STEPS, CFG_SCALE, SEED = 6, 5.0, 42


def _reference_loop(ref, ctx_pos, ctx_neg, clip, y, plucker, steps, seed,
                    record=None):
    """fusion/model_wan21.py:226-324 with the 14B-only pieces (vram moves,
    pose encoder) factored out; plucker features are injected directly.
    ``record``: optional list collecting the post-step latents (fp32 numpy)
    after every scheduler step, for the 50-step drift-curve artifact
    (test_loop_parity_50.py)."""
    from FantasyWorld.diffsynth_wan21.schedulers.flow_match import (
        FlowMatchScheduler)

    sched = FlowMatchScheduler(shift=5, sigma_min=0.0, extra_one_step=True)
    sched.set_timesteps(steps)

    torch.manual_seed(1024)                     # :250-251 quirk
    generator = torch.Generator("cpu").manual_seed(seed)
    # tiny config: out_dim=4 latent channels (production 16)
    latents = torch.randn((B, 4, F, H2, W2), generator=generator,
                          dtype=torch.float32)

    plucker_context_lens = torch.ones(F, dtype=torch.long)
    final_prediction = None
    with torch.no_grad():
        for progress_id in range(steps):
            t = sched.timesteps[progress_id].unsqueeze(0).float()
            last = progress_id == steps - 1
            noise_pred_posi, final_prediction = ref.joint_forward(
                latents, timestep=t, context=ctx_pos, clip_feature=clip,
                y=y, use_gradient_checkpointing=False,
                plucker_fea=plucker,
                plucker_context_lens=plucker_context_lens,
                return_prediction=last)
            noise_pred_nega, _ = ref.joint_forward(
                latents, timestep=t, context=ctx_neg, clip_feature=clip,
                y=y, use_gradient_checkpointing=False,
                plucker_fea=plucker,
                plucker_context_lens=plucker_context_lens)
            noise_pred = noise_pred_nega + CFG_SCALE * (
                noise_pred_posi - noise_pred_nega)
            latents = sched.step(noise_pred, sched.timesteps[progress_id],
                                 latents)
            if record is not None:
                record.append(latents.float().numpy().copy())
    return latents, final_prediction


@pytest.mark.skipif(not C.reference_available(), reason="reference absent")
def test_generate_video_loop_parity():
    import jax.numpy as jnp
    from fantasy_world_tpu.convert.fusion import convert_fusion_checkpoint
    from fantasy_world_tpu.pipelines.wan_video import FantasyWorldPipeline

    ref, base_sd = _build_reference()
    cfg = _our_config()
    fusion_sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = convert_fusion_checkpoint(fusion_sd, base_sd, cfg)

    rng = np.random.default_rng(23)
    ctx_pos = rng.standard_normal((B, 20, 32)).astype(np.float32)
    ctx_neg = rng.standard_normal((B, 20, 32)).astype(np.float32) * 0.3
    clip = rng.standard_normal((B, 257, 1280)).astype(np.float32)
    y = rng.standard_normal((B, 4, F, H2, W2)).astype(np.float32)
    plucker = rng.standard_normal(
        (B, F * (H2 // 2) * (W2 // 2), 48)).astype(np.float32) * 0.5

    ref_lat, ref_pred = _reference_loop(
        ref, *(torch.from_numpy(a) for a in
               (ctx_pos, ctx_neg, clip, y, plucker)), STEPS, SEED)

    pipe = FantasyWorldPipeline(cfg=cfg, params={"fusion": params})
    lat, pred = pipe.denoise(
        jnp.asarray(ctx_pos), jnp.asarray(ctx_neg), jnp.asarray(clip),
        jnp.asarray(y), height=H2 * 8, width=W2 * 8,
        num_frames=4 * (F - 1) + 1, num_inference_steps=STEPS,
        cfg_scale=CFG_SCALE, seed=SEED, plucker_fea=jnp.asarray(plucker),
        torch_compat_noise=True)

    np.testing.assert_allclose(np.asarray(lat, np.float32),
                               ref_lat.numpy(), rtol=2e-3, atol=2e-3)
    assert pred is not None and ref_pred is not None
    for k in ("pose_enc", "depth", "depth_conf", "world_points",
              "world_points_conf"):
        r = ref_pred[k].float().numpy()
        o = np.asarray(pred[k], np.float32)
        assert o.shape == r.shape, (k, o.shape, r.shape)
        np.testing.assert_allclose(o, r, rtol=8e-3, atol=8e-3, err_msg=k)


@pytest.mark.skipif(not C.reference_available(), reason="reference absent")
def test_generate_video_loop_parity_with_frame_padding():
    """generate_video rounds num_frames%4!=1 up ((n+2)//4*4+1,
    model_wan21.py:246-247); both sides must land on the same latent f."""
    from fantasy_world_tpu.pipelines.wan_video import FantasyWorldPipeline

    # the rounding rule itself (host math, no model needed)
    def ref_round(n):
        return n if n % 4 == 1 else (n + 2) // 4 * 4 + 1

    cfg = _our_config()
    import jax.numpy as jnp
    from fantasy_world_tpu.models.fusion.model import init_fusion
    pipe = FantasyWorldPipeline(
        cfg=cfg, params={"fusion": init_fusion(0, cfg, jnp.float32)})
    for n in (7, 8, 9, 10, 11):
        f_ref = (ref_round(n) - 1) // 4 + 1
        lat, _ = pipe.denoise(
            jnp.zeros((1, 20, 32)), jnp.zeros((1, 20, 32)),
            jnp.zeros((1, 257, 1280)), jnp.zeros((1, 4, f_ref, H2, W2)),
            height=H2 * 8, width=W2 * 8, num_frames=n,
            num_inference_steps=1, seed=0,
            plucker_fea=jnp.zeros((1, f_ref * (H2 // 2) * (W2 // 2), 48)))
        assert lat.shape[2] == f_ref, (n, lat.shape)
