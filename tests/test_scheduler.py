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
