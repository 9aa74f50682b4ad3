"""Multi-host bootstrap: the TPU-native replacement for the reference's
NCCL process-group / xfuser model-parallel initialisation
(diffsynth_wan22/pipelines/wan_video_new.py:316-341 ``initialize_usp``:
``dist.init_process_group(backend="nccl")`` + xfuser
``init_distributed_environment`` / ``initialize_model_parallel``).

On TPU there is no explicit communication backend to construct: XLA
compiles collectives over ICI/DCN directly. The only per-process setup a
multi-host pod needs is ``jax.distributed.initialize()`` so every process
sees the global device set; after that, a ``Mesh`` spanning
``jax.devices()`` (all hosts) with GSPMD-sharded arrays replaces the
reference's rank-chunking + all_gather (wan_video.py:808-830).

Typical pod usage (same program on every host):

    from fantasy_world_tpu.parallel import distributed, sharding
    distributed.initialize()                      # no-op on single host
    mesh = sharding.make_mesh(data=1, seq=2, model=4)   # global devices
"""
from __future__ import annotations

import os
from typing import Optional

_INITIALIZED = False

# Environment variables that mark a multi-host coordinator. Exported so
# tests (and tools that sanitise the environment) stay in sync with
# is_multiprocess_env() when a new coordinator variable is added.
POD_ENV_VARS = (
    "JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
    "MEGASCALE_COORDINATOR_ADDRESS",
    "SLURM_STEP_NODELIST", "SLURM_JOB_NODELIST",
    "TPU_WORKER_HOSTNAMES",
)

# The hostname-list variable is special-cased: it only counts as a pod when
# it names MORE than one worker (see is_multiprocess_env).
_COORDINATOR_VARS = tuple(v for v in POD_ENV_VARS
                          if v != "TPU_WORKER_HOSTNAMES")


def is_multiprocess_env() -> bool:
    """True when launched under a multi-host coordinator (TPU pod metadata
    or explicit JAX_COORDINATOR_ADDRESS / Slurm-style variables).

    TPU_WORKER_HOSTNAMES counts only when it lists MORE than one worker:
    single-chip environments (e.g. the tunneled dev TPU here) export it as
    'localhost', and bootstrapping a one-process coordination service only
    adds failure modes."""
    if any(os.environ.get(k) for k in _COORDINATOR_VARS):
        return True
    hostnames = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    return len([h for h in hostnames.split(",") if h.strip()]) > 1


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               force: bool = False) -> bool:
    """``jax.distributed.initialize`` with single-host no-op semantics.

    On Cloud TPU pods all three arguments are auto-detected from the
    metadata server, so call sites pass nothing. Single-host runs (and unit
    tests) skip initialisation entirely unless ``force`` or an explicit
    coordinator is given -- starting the coordination service for one
    process only adds failure modes.

    Returns True if jax.distributed was initialised (now or previously).
    Idempotent: repeat calls are no-ops.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return True
    if not (force or coordinator_address or is_multiprocess_env()):
        return False
    import jax
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except (ValueError, RuntimeError):
        # ValueError: a pod-ish environment variable was present but no
        # coordinator could be resolved. RuntimeError: the XLA backend was
        # already initialised (e.g. library imported after first jax use).
        # Both mean single-host operation, not an error.
        if force:
            raise
        return False
    _INITIALIZED = True
    return True


def runtime_info() -> dict:
    """Process/device topology summary (for logs and sanity asserts)."""
    import jax
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_device_count": jax.local_device_count(),
        "global_device_count": jax.device_count(),
        "platform": jax.devices()[0].platform,
        "initialized": _INITIALIZED,
    }
