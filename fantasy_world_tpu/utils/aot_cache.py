"""Ahead-of-time compiled-executable cache.

The persistent XLA compilation cache (``jax_compilation_cache_dir``) only
skips the XLA compile; tracing + Pallas/Mosaic lowering of a large model
still costs minutes per process (measured 2026-08 on a tunneled v5e:
~250-340 s for the fusion forward, cache hit or not). For production
serving and benchmarking, that cold-start is unacceptable, so this module
snapshots the COMPILED executable via
``jax.experimental.serialize_executable`` and reloads it directly --
skipping trace, lowering, and compile entirely (reload through the tunnel:
60-270 s, dominated by executable transfer).

Cache keys fingerprint (a) the package sources, (b) a caller-supplied
config string, and (c) the arg shapes/dtypes, so a stale executable can
never be silently loaded after a code or shape change. Entries are plain
pickle files: executables are machine/topology-specific, so the cache
directory should live on the machine (or image) that runs them; loading
falls back to a fresh compile on any mismatch.

Replaces, on TPU terms, what the reference lacks entirely -- its torch
pipeline re-traces CUDA graphs per process (SURVEY.md section 5: no
checkpoint/resume of compiled state).
"""
from __future__ import annotations

import glob
import hashlib
import os
import pickle
from typing import Any, Callable, Optional, Sequence

import jax

_PKG_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC_HASH: Optional[str] = None


def _package_source_hash() -> str:
    """md5 over every .py under fantasy_world_tpu/ (cached per process)."""
    global _SRC_HASH
    if _SRC_HASH is None:
        h = hashlib.md5()
        for dirpath, dirnames, filenames in sorted(os.walk(_PKG_ROOT)):
            dirnames.sort()
            for fn in sorted(filenames):
                if fn.endswith(".py"):
                    p = os.path.join(dirpath, fn)
                    h.update(p.encode())
                    with open(p, "rb") as fh:
                        h.update(fh.read())
        _SRC_HASH = h.hexdigest()
    return _SRC_HASH


def fingerprint(args: Sequence[Any], config: str = "") -> str:
    """12-hex-char key over package sources + config + arg shapes/dtypes."""
    h = hashlib.md5()
    h.update(_package_source_hash().encode())
    h.update(config.encode())
    for a in jax.tree_util.tree_leaves(args):
        h.update(f"{getattr(a, 'shape', ())}{getattr(a, 'dtype', '')}"
                 .encode())
    return h.hexdigest()[:12]


def load_or_compile(fn: Callable, args: Sequence[Any], *, name: str,
                    cache_dir: str, config: str = "",
                    donate_argnums=(), prune_stale: bool = True,
                    log: Optional[Callable[[str], None]] = None):
    """Return a compiled executable for ``jax.jit(fn)`` at ``args``.

    Loads ``<cache_dir>/aot_<name>_<fingerprint>.pkl`` when present;
    otherwise lowers + compiles, serializes the result for the next
    process, and (by default) prunes superseded entries for ``name``.
    Any load/serialize failure degrades to a plain compile.
    """
    from jax.experimental import serialize_executable as se

    def say(msg):
        if log:
            log(msg)

    fp = fingerprint(args, config)
    path = os.path.join(cache_dir, f"aot_{name}_{fp}.pkl")
    if os.path.exists(path):
        try:
            with open(path, "rb") as fh:
                n_dev, payload = pickle.load(fh)
            # deserialize_and_load defaults execution_devices to ALL local
            # devices; a 1-device program loaded into an 8-device process
            # (virtual CPU mesh) then demands 8 input shards. Restore onto
            # the same device count it was compiled for.
            compiled = se.deserialize_and_load(
                *payload, execution_devices=jax.devices()[:n_dev])
            say(f"{name}: loaded AOT executable ({fp})")
            return compiled
        except Exception as e:
            say(f"{name}: AOT load failed ({type(e).__name__}: {e}); "
                f"recompiling")
    compiled = jax.jit(fn, donate_argnums=donate_argnums).lower(
        *args).compile()
    try:
        n_dev = len(compiled._executable.xla_executable.local_devices())
        os.makedirs(cache_dir, exist_ok=True)
        with open(path, "wb") as fh:
            pickle.dump((n_dev, se.serialize(compiled)), fh)
        if prune_stale:
            for stale in glob.glob(
                    os.path.join(cache_dir, f"aot_{name}_*.pkl")):
                if stale != path:
                    os.remove(stale)
        say(f"{name}: compiled + serialized AOT executable ({fp})")
    except Exception as e:
        say(f"{name}: AOT serialize failed ({type(e).__name__}: {e})")
    return compiled
