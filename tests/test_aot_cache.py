"""AOT executable cache: compile -> serialize -> reload roundtrip."""
import numpy as np

import conftest  # noqa: F401


def test_load_or_compile_roundtrip(tmp_path):
    import jax.numpy as jnp
    from fantasy_world_tpu.utils.aot_cache import load_or_compile, fingerprint

    logs = []
    x = jnp.arange(8.0, dtype=jnp.float32)

    def fn(x):
        return x * 2 + 1

    c1 = load_or_compile(fn, (x,), name="t", cache_dir=str(tmp_path),
                         log=logs.append)
    np.testing.assert_allclose(np.asarray(c1(x)), np.arange(8.0) * 2 + 1)
    assert any("serialized" in m for m in logs)

    # second call loads from disk (same fingerprint)
    logs.clear()
    c2 = load_or_compile(fn, (x,), name="t", cache_dir=str(tmp_path),
                         log=logs.append)
    np.testing.assert_allclose(np.asarray(c2(x)), np.arange(8.0) * 2 + 1)
    assert any("loaded" in m for m in logs)

    # a different shape gets a different fingerprint -> fresh compile
    assert fingerprint((x,)) != fingerprint((x[:4],))
    # a config change does too
    assert fingerprint((x,), config="a") != fingerprint((x,), config="b")


def test_stale_entries_pruned(tmp_path):
    import jax.numpy as jnp
    from fantasy_world_tpu.utils import aot_cache

    def fn(x):
        return x + 1

    aot_cache.load_or_compile(fn, (jnp.zeros(4),), name="p",
                              cache_dir=str(tmp_path))
    aot_cache.load_or_compile(fn, (jnp.zeros(8),), name="p",
                              cache_dir=str(tmp_path))
    entries = list(tmp_path.glob("aot_p_*.pkl"))
    assert len(entries) == 1          # the shape-4 entry was superseded
