"""Orbax bundle roundtrip + loader fast-path dispatch.

The bundle (convert/orbax_io.py, cli/convert.py) is the once-only converted
form of the reference's torch checkpoint layout, replacing ModelManager's
per-run re-parse (diffsynth_wan21/models/model_manager.py:348-379).
"""
import numpy as np
import pytest


def _tiny_tree(seed):
    rng = np.random.default_rng(seed)
    import jax.numpy as jnp
    return {"w": jnp.asarray(rng.standard_normal((4, 8)), jnp.bfloat16),
            "inner": {"b": jnp.asarray(rng.standard_normal(8), jnp.float32)}}


def test_bundle_roundtrip(tmp_path):
    from fantasy_world_tpu.convert.orbax_io import (save_bundle, load_bundle,
                                                    is_bundle)

    comps = {"fusion": _tiny_tree(0), "vae": _tiny_tree(1)}
    path = save_bundle(comps, tmp_path / "b")
    assert is_bundle(path)
    assert not is_bundle(str(tmp_path))

    out = load_bundle(path)
    assert sorted(out) == ["fusion", "vae"]
    for name in comps:
        np.testing.assert_array_equal(
            np.asarray(out[name]["w"], np.float32),
            np.asarray(comps[name]["w"], np.float32))
        np.testing.assert_array_equal(np.asarray(out[name]["inner"]["b"]),
                                      np.asarray(comps[name]["inner"]["b"]))

    # component selection + missing-component error
    only = load_bundle(path, ("vae",))
    assert sorted(only) == ["vae"]
    with pytest.raises(KeyError):
        load_bundle(path, ("fusion", "clip"))


def test_config_roundtrip_through_bundle(tmp_path):
    """Self-describing bundles: configs stamped at save reconstruct to the
    exact dataclasses (incl. nesting, tuples, Optional fields)."""
    import json
    from fantasy_world_tpu.utils.configio import (config_to_dict,
                                                  config_from_dict)
    from fantasy_world_tpu.utils.demo import demo_config
    from fantasy_world_tpu.models.fusion.model import FusionConfig
    from fantasy_world_tpu.models.wan.t5 import T5Config
    from fantasy_world_tpu.models.wan.vae import VAEConfig
    from fantasy_world_tpu.convert.orbax_io import (save_bundle,
                                                    load_bundle_configs)

    cfg = demo_config(dim=64, layers=3, start_index=1, agg_dim=64,
                      text_dim=32, plucker_dim=48, clip_feature_dim=64)
    cfg = FusionConfig(**{**cfg.__dict__,
                          "cross_attention_list": (0, 1)})
    # pure-dict roundtrip survives JSON serialization
    d = json.loads(json.dumps(config_to_dict(cfg)))
    back = config_from_dict(FusionConfig, d)
    assert back == cfg
    assert isinstance(back.dit.patch_size, tuple)
    assert back.cross_attention_list == (0, 1)

    # bundle stamp + reload
    t5_cfg = T5Config(vocab=64, dim=32)
    path = save_bundle({"fusion": _tiny_tree(0)}, tmp_path / "b",
                       configs={"fusion": cfg, "t5": t5_cfg,
                                "vae": VAEConfig(dim=16)})
    cfgs = load_bundle_configs(path)
    assert cfgs["fusion"] == cfg
    assert cfgs["t5"] == t5_cfg
    assert cfgs["vae"].dim == 16
    # pre-configs bundles load as empty (back-compat)
    old = save_bundle({"fusion": _tiny_tree(1)}, tmp_path / "old")
    assert load_bundle_configs(old) == {}


def test_load_fusion_params_bundle_fast_path(tmp_path):
    import jax.numpy as jnp
    from fantasy_world_tpu.convert.orbax_io import save_bundle
    from fantasy_world_tpu.cli.infer_wan21 import load_fusion_params

    comps = {name: _tiny_tree(i) for i, name in
             enumerate(("fusion", "vae", "clip", "t5"))}
    path = save_bundle(comps, tmp_path / "wan21.bundle")
    # cfg is unused on the bundle path; model_ckpt likewise
    params = load_fusion_params(str(path), "unused.pth", None, jnp.bfloat16)
    assert sorted(params) == ["clip", "fusion", "t5", "vae"]
    assert params["fusion"]["w"].dtype == jnp.bfloat16
    # cast_tree normalizes every leaf to the requested dtype
    assert params["t5"]["inner"]["b"].dtype == jnp.bfloat16
