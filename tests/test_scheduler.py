"""FlowMatchScheduler golden-value parity with the reference."""
import numpy as np
import pytest

import conftest as C

torch = pytest.importorskip("torch")


@pytest.mark.skipif(not C.reference_available(), reason="reference absent")
def test_sigma_schedule_parity():
    C.add_reference_to_path()
    from FantasyWorld.diffsynth_wan21.schedulers.flow_match import (
        FlowMatchScheduler as RefSched)
    from fantasy_world_tpu.schedulers import FlowMatchScheduler

    ref = RefSched(shift=5, sigma_min=0.0, extra_one_step=True)
    ref.set_timesteps(50)

    ours = FlowMatchScheduler(shift=5.0, sigma_min=0.0, extra_one_step=True)
    ours.set_timesteps(50)

    np.testing.assert_allclose(ours.sigmas, ref.sigmas.numpy(), rtol=1e-6)
    np.testing.assert_allclose(ours.timesteps, ref.timesteps.numpy(), rtol=1e-6)


@pytest.mark.skipif(not C.reference_available(), reason="reference absent")
def test_euler_step_parity():
    C.add_reference_to_path()
    from FantasyWorld.diffsynth_wan21.schedulers.flow_match import (
        FlowMatchScheduler as RefSched)
    from fantasy_world_tpu.schedulers import FlowMatchScheduler
    import jax.numpy as jnp

    ref = RefSched(shift=5, sigma_min=0.0, extra_one_step=True)
    ref.set_timesteps(10)
    ours = FlowMatchScheduler().set_timesteps(10)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3)).astype(np.float32)
    v = rng.standard_normal((2, 3)).astype(np.float32)

    for i in range(10):
        ref_next = ref.step(torch.from_numpy(v), ref.timesteps[i],
                            torch.from_numpy(x)).numpy()
        our_next = np.asarray(ours.step(jnp.asarray(v), i, jnp.asarray(x)))
        np.testing.assert_allclose(our_next, ref_next, rtol=1e-5, atol=1e-6)
        x = ref_next

    pairs = ours.sigma_pairs()
    assert pairs.shape == (10, 2)
    np.testing.assert_allclose(pairs[:-1, 1], ours.sigmas[1:], rtol=1e-6)
    assert pairs[-1, 1] == 0.0


@pytest.mark.skipif(not C.reference_available(), reason="reference absent")
def test_continuous_ode_parity():
    C.add_reference_to_path()
    from FantasyWorld.diffsynth_wan21.schedulers.continuous_ode import (
        ContinuousODEScheduler as RefSched)
    from fantasy_world_tpu.schedulers import ContinuousODEScheduler

    ref = RefSched(num_inference_steps=20)
    ours = ContinuousODEScheduler().set_timesteps(20)
    np.testing.assert_allclose(ours.sigmas, ref.sigmas.numpy(), rtol=1e-5)
    np.testing.assert_allclose(ours.timesteps, ref.timesteps.numpy(),
                               rtol=1e-5)

    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 3)).astype(np.float32)
    v = rng.standard_normal((2, 3)).astype(np.float32)
    orig = rng.standard_normal((2, 3)).astype(np.float32)
    for i in [0, 5, 19]:
        ref_next = ref.step(torch.from_numpy(v), ref.timesteps[i],
                            torch.from_numpy(x.copy())).numpy()
        our_next = np.asarray(ours.step(v, i, x))
        np.testing.assert_allclose(our_next, ref_next, rtol=1e-4, atol=1e-5)
        ref_noisy = ref.add_noise(torch.from_numpy(orig),
                                  torch.from_numpy(v),
                                  ref.timesteps[i]).numpy()
        np.testing.assert_allclose(np.asarray(ours.add_noise(orig, v, i)),
                                   ref_noisy, rtol=1e-4, atol=1e-5)
        ref_tgt = ref.training_target(torch.from_numpy(orig),
                                      torch.from_numpy(v),
                                      ref.timesteps[i]).numpy()
        np.testing.assert_allclose(
            np.asarray(ours.training_target(orig, v, i)), ref_tgt,
            rtol=1e-4, atol=1e-5)


@pytest.mark.skipif(not C.reference_available(), reason="reference absent")
def test_ddim_parity():
    C.add_reference_to_path()
    from FantasyWorld.diffsynth_wan21.schedulers.ddim import (
        EnhancedDDIMScheduler as RefSched)
    from fantasy_world_tpu.schedulers import EnhancedDDIMScheduler

    for pred in ("epsilon", "v_prediction"):
        for zsnr in (False, True):
            ref = RefSched(prediction_type=pred,
                           rescale_zero_terminal_snr=zsnr)
            ref.set_timesteps(10)
            ours = EnhancedDDIMScheduler(
                prediction_type=pred,
                rescale_zero_terminal_snr_flag=zsnr).set_timesteps(10)
            np.testing.assert_allclose(ours.timesteps, ref.timesteps.numpy())
            # f32 cumprod rounding differs slightly between torch and numpy
            np.testing.assert_allclose(ours.alphas_cumprod,
                                       np.array(ref.alphas_cumprod),
                                       rtol=5e-6, atol=1e-10)
            if zsnr:
                continue   # terminal alpha==0 makes eps-step undefined
            rng = np.random.default_rng(2)
            x = rng.standard_normal((2, 3)).astype(np.float32)
            e = rng.standard_normal((2, 3)).astype(np.float32)
            for i in [0, 4, 9]:
                t = torch.tensor([ref.timesteps[i]])
                ref_next = ref.step(torch.from_numpy(e), t,
                                    torch.from_numpy(x.copy())).numpy()
                np.testing.assert_allclose(np.asarray(ours.step(e, i, x)),
                                           ref_next, rtol=2e-4, atol=1e-5)
                ref_noisy = ref.add_noise(torch.from_numpy(x),
                                          torch.from_numpy(e), t).numpy()
                np.testing.assert_allclose(
                    np.asarray(ours.add_noise(x, e, i)), ref_noisy,
                    rtol=2e-4, atol=1e-5)
