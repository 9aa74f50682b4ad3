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


def test_retry_transient_retries_tunnel_errors_only(monkeypatch):
    """bench.retry_transient: transient remote-compile failures retry,
    real failures (OOM) surface immediately."""
    import sys, os, time
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import bench
    monkeypatch.setattr(time, "sleep", lambda s: None)

    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError(
                "INTERNAL: http://127.0.0.1:8083/remote_compile: read body: "
                "response body closed before all bytes were read")
        return 42

    assert bench.retry_transient(flaky, "x") == 42
    assert calls["n"] == 3

    def oom():
        raise RuntimeError("RESOURCE_EXHAUSTED: HBM out of memory while "
                           "talking to remote_compile")

    import pytest
    with pytest.raises(RuntimeError, match="RESOURCE_EXHAUSTED"):
        bench.retry_transient(oom, "x")

    def always():
        raise RuntimeError("remote_compile: HTTP 500: helper crashed")

    calls["n"] = 0

    def count_always():
        calls["n"] += 1
        raise RuntimeError("remote_compile: HTTP 500: helper crashed")

    with pytest.raises(RuntimeError, match="HTTP 500"):
        bench.retry_transient(count_always, "x", attempts=2)
    assert calls["n"] == 2
