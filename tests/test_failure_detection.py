"""Failure-detection / bootstrap coverage (COVERAGE.md §5 rows that had no
direct test): hostops.geometry_train.read_image_retry (the TPU port of the
reference's only failure-handling machinery, utils.py:815-821) and
parallel.distributed (the NCCL-process-group replacement, single-host no-op
semantics + pod autodetection).
"""
import os

import numpy as np
import pytest

import conftest  # noqa: F401


# ---------------------------------------------------------------------------
# hostops/geometry_train.py: read_image_retry
# ---------------------------------------------------------------------------

def _write_png(path, arr):
    from PIL import Image
    Image.fromarray(arr).save(path)


def test_read_image_retry_success_and_bgr(tmp_path):
    from fantasy_world_tpu.hostops.geometry_train import read_image_retry
    arr = (np.arange(2 * 3 * 3) % 251).astype(np.uint8).reshape(2, 3, 3)
    p = str(tmp_path / "img.png")
    _write_png(p, arr)
    rgb = read_image_retry(p)
    np.testing.assert_array_equal(rgb, arr)
    bgr = read_image_retry(p, rgb=False)
    np.testing.assert_array_equal(bgr, arr[..., ::-1])


def test_read_image_retry_recovers_from_transient_failure(tmp_path,
                                                          monkeypatch):
    """First two opens raise (simulated flaky FS); third succeeds -- the
    caller sees only the successful read."""
    from PIL import Image
    from fantasy_world_tpu.hostops import geometry_train
    arr = np.full((2, 2, 3), 7, np.uint8)
    p = str(tmp_path / "flaky.png")
    _write_png(p, arr)

    real_open = Image.open
    calls = {"n": 0}

    def flaky_open(path, *a, **k):
        calls["n"] += 1
        if calls["n"] <= 2:
            raise OSError("transient read failure")
        return real_open(path, *a, **k)

    monkeypatch.setattr(Image, "open", flaky_open)
    out = geometry_train.read_image_retry(p, retries=3, delay_s=0.0)
    np.testing.assert_array_equal(out, arr)
    assert calls["n"] == 3


def test_read_image_retry_exhausts_and_raises(tmp_path):
    from fantasy_world_tpu.hostops.geometry_train import read_image_retry
    missing = str(tmp_path / "nope.png")
    with pytest.raises(IOError, match="after 2 tries"):
        read_image_retry(missing, retries=2, delay_s=0.0)


# ---------------------------------------------------------------------------
# parallel/distributed.py: single-host no-op semantics + pod autodetection
# ---------------------------------------------------------------------------

def _clear_pod_env(monkeypatch):
    # Shared constant with the implementation: adding a coordinator variable
    # to distributed.py automatically clears (and thus tests) it here.
    from fantasy_world_tpu.parallel.distributed import POD_ENV_VARS
    for k in POD_ENV_VARS:
        monkeypatch.delenv(k, raising=False)


def test_is_multiprocess_env_detection(monkeypatch):
    from fantasy_world_tpu.parallel import distributed
    _clear_pod_env(monkeypatch)
    assert not distributed.is_multiprocess_env()
    # the tunneled single-chip dev TPU exports a ONE-entry hostname list;
    # that must NOT count as a pod (bootstrapping a 1-process coordination
    # service only adds failure modes)
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "localhost")
    assert not distributed.is_multiprocess_env()
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "host-0,host-1")
    assert distributed.is_multiprocess_env()
    _clear_pod_env(monkeypatch)
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:8476")
    assert distributed.is_multiprocess_env()


def test_initialize_is_noop_on_single_host(monkeypatch):
    from fantasy_world_tpu.parallel import distributed
    _clear_pod_env(monkeypatch)
    assert distributed.initialize() is False
    assert distributed._INITIALIZED is False


def test_initialize_force_failure_handling(monkeypatch):
    """force=True on a host with no resolvable coordinator must raise (the
    caller explicitly demanded multi-process), while the env-autodetected
    path degrades to single-host False."""
    import jax
    from fantasy_world_tpu.parallel import distributed
    _clear_pod_env(monkeypatch)

    def boom(**kw):
        raise RuntimeError("backend already initialized")

    monkeypatch.setattr(jax.distributed, "initialize", boom)
    monkeypatch.setenv("SLURM_JOB_NODELIST", "node[0-3]")
    assert distributed.initialize() is False          # degrades, no raise
    with pytest.raises(RuntimeError, match="already initialized"):
        distributed.initialize(force=True)
    assert distributed._INITIALIZED is False


def test_runtime_info_topology(monkeypatch):
    from fantasy_world_tpu.parallel import distributed
    # Pin the module-global so the assertion does not depend on whether an
    # earlier test in the session initialised jax.distributed.
    monkeypatch.setattr(distributed, "_INITIALIZED", False)
    info = distributed.runtime_info()
    assert info["global_device_count"] >= info["local_device_count"] >= 1
    assert info["global_device_count"] == (info["process_count"]
                                           * info["local_device_count"])
    assert info["platform"] in ("cpu", "tpu")
    assert info["initialized"] is False
