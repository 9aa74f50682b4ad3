"""Test configuration: run on a virtual 8-device CPU mesh.

Environment must be set before jax is imported anywhere, so this conftest
performs the setup at import time (pytest loads conftest first).
"""
import os
import sys

# FW_TPU_TESTS=1 keeps the real platform (the tunneled TPU) instead of the
# virtual CPU mesh, for the `tpu`-marked hardware-numerics tests:
#   FW_TPU_TESTS=1 python -m pytest tests/ -m tpu -q
# Platform choice is process-global in JAX, so under FW_TPU_TESTS=1 every
# NON-tpu-marked test is auto-skipped (see pytest_collection_modifyitems):
# they assume the 8-virtual-CPU-device mesh and would otherwise run -- and
# fail -- against the single tunneled chip.
_TPU_TESTS = os.environ.get("FW_TPU_TESTS") == "1"

if not _TPU_TESTS:
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_llvm_disable_expensive_passes" not in flags:
    # LLVM O2 passes dominate compile time on this 1-core host and buy
    # nothing for correctness tests
    flags = (flags + " --xla_llvm_disable_expensive_passes=true").strip()
if "collective_call_terminate_timeout" not in flags:
    # 8 virtual device threads time-share ONE core: a device can reach a
    # collective minutes after its peers; the default 40 s watchdog
    # SIGABRTs the whole process
    flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=300"
              " --xla_cpu_collective_call_terminate_timeout_seconds=3000")
os.environ["XLA_FLAGS"] = flags

# A pytest plugin may have imported jax before this conftest ran; the config
# update below still wins as long as no backend has been initialized yet.
import jax  # noqa: E402

if not _TPU_TESTS:
    jax.config.update("jax_platforms", "cpu")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

# Persistent compilation cache: XLA compile time on the 1-core CI host
# dominates the suite (a tiny fusion forward costs minutes to build), so
# every jitted program is cached on disk and reruns hit the cache.
#
# The directory is HOST-SCOPED by a CPU-feature hash: XLA:CPU AOT entries
# embed the compile machine's features, and loading an entry written by a
# different machine is at best a wall of cpu_aot_loader warnings and at
# worst a SIGILL/segfault -- measured 2026-08-21: a parity run SEGV'd
# inside compilation_cache.get_executable_and_time deserializing a
# foreign-host entry. Each machine now reads only its own entries.


def _host_cache_tag() -> str:
    import hashlib
    try:
        with open("/proc/cpuinfo") as fh:
            flags = next(ln for ln in fh if ln.startswith("flags"))
    except (OSError, StopIteration):
        import platform
        flags = platform.machine() + platform.processor()
    return hashlib.md5(flags.encode()).hexdigest()[:10]


jax.config.update("jax_compilation_cache_dir",
                  os.path.join(REPO_ROOT, ".jax_cache",
                               f"cpu-{_host_cache_tag()}"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

def pytest_collection_modifyitems(config, items):
    if not _TPU_TESTS:
        return
    import pytest
    skip = pytest.mark.skip(
        reason="FW_TPU_TESTS=1 pins the real TPU platform; this test "
               "needs the virtual CPU mesh -- run it without the variable")
    for item in items:
        if "tpu" not in item.keywords:
            item.add_marker(skip)


REFERENCE_ROOT = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_ROOT, "FantasyWorld"))


def add_reference_to_path():
    """Make the reference torch implementation importable as a CPU oracle.

    Optional heavyweight deps of the reference that are absent from this
    image are stubbed out -- the oracle modules we exercise do not use them.
    """
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import types

    import importlib.machinery

    def stub(name):
        mod = types.ModuleType(name)
        mod.__dict__["__getattr__"] = lambda *_a, **_k: None
        mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
        sys.modules[name] = mod
        return mod

    for name in ("modelscope", "imageio", "imageio_ffmpeg", "pandas", "ftfy",
                 "cv2"):
        if name not in sys.modules:
            try:
                __import__(name)
            except ImportError:
                stub(name)
    try:
        import torchvision  # noqa: F401
        import torchvision.transforms.functional  # noqa: F401
    except (ImportError, ValueError):
        tv = stub("torchvision")
        tv.transforms = stub("torchvision.transforms")
        tv.transforms.functional = stub("torchvision.transforms.functional")
    try:
        import diffusers  # noqa: F401
    except (ImportError, ValueError):
        dif = stub("diffusers")
        cu = stub("diffusers.configuration_utils")
        cu.ConfigMixin = type("ConfigMixin", (), {})
        cu.register_to_config = lambda fn=None, **kw: fn if fn else (lambda f: f)
        dif.configuration_utils = cu
        mu = stub("diffusers.models.modeling_utils")
        mu.ModelMixin = type("ModelMixin", (), {})
        stub("diffusers.models").modeling_utils = mu
        dif.models = sys.modules["diffusers.models"]
        ld = stub("diffusers.loaders")
        ld.PeftAdapterMixin = type("PeftAdapterMixin", (), {})
        dif.loaders = ld
