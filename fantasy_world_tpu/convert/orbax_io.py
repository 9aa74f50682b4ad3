"""Orbax persistence for converted param trees + the end-to-end converter.

Replaces the reference ModelManager load path (model_manager.py:348-379):
.pth/.safetensors are detected by key-census hash (convert/registry.py),
converted to this framework's pytrees, cast to the target dtype, and saved
as an Orbax checkpoint directory for fast mmap-style reloads (optionally
sharded at restore time by passing PartitionSpecs).
"""
from __future__ import annotations

import os
from typing import Dict, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np


def _torch_to_np(v):
    """torch tensor -> numpy WITHOUT upcasting: a 14B bf16 checkpoint
    upcast to fp32 is 56 GB of host RAM before conversion even starts
    (measured during the r4 production-shape rehearsal); keep bf16 as
    ml_dtypes.bfloat16 (the dtype numpy/jax already share) and fp16 as
    fp16. The converters are renames/transposes (dtype-agnostic) and
    cast_tree produces the same final bf16 bits either way (bf16->f32->bf16
    is the identity)."""
    import torch
    if v.dtype == torch.bfloat16:
        import ml_dtypes
        return v.view(torch.int16).numpy().view(ml_dtypes.bfloat16)
    return v.numpy()


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load .pth/.bin (torch) or .safetensors into numpy, preserving the
    stored precision (bf16 arrives as ml_dtypes.bfloat16)."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file
        try:
            return load_file(path)
        except Exception:
            # bf16 safetensors need the torch loader
            from safetensors.torch import load_file as load_pt
            return {k: _torch_to_np(v) for k, v in load_pt(path).items()}
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "model_state" in sd:
        sd = sd["model_state"]
    if isinstance(sd, dict) and "model" in sd and isinstance(sd["model"], dict):
        sd = sd["model"]
    return {k: _torch_to_np(v)
            for k, v in sd.items() if hasattr(v, "numpy")}


def load_sharded_state_dict(paths) -> Dict[str, np.ndarray]:
    """Merge split checkpoint files (e.g. 7-shard safetensors) into one dict.
    A key appearing in two shards is corruption (the reference's shard merge
    never sees one either, model_manager.py:348-374) -- fail loudly instead
    of silently keeping whichever shard loaded last."""
    sd: Dict[str, np.ndarray] = {}
    for p in paths:
        part = load_torch_state_dict(p)
        dup = sd.keys() & part.keys()
        if dup:
            raise ValueError(f"duplicate keys across shards ({p}): "
                             f"{sorted(dup)[:5]}")
        sd.update(part)
    return sd


def cast_tree(tree, dtype):
    return jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, dtype) if not isinstance(x, jnp.ndarray)
        else x.astype(dtype), tree)


def save_orbax(tree, path: str) -> None:
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), tree, force=True)
    ckptr.wait_until_finished()


def load_orbax(path: str, abstract_tree=None):
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    if abstract_tree is not None:
        return ckptr.restore(os.path.abspath(path), abstract_tree)
    return ckptr.restore(os.path.abspath(path))


def convert_checkpoint_file(path: str, out_dir: Optional[str] = None,
                            dtype=jnp.bfloat16):
    """Detect-and-convert one torch checkpoint; returns (name, tree)."""
    from . import registry
    from .wan_dit import convert_wan_dit
    from .wan_vae import convert_wan_vae
    from .encoders import convert_t5, convert_clip_vision
    from ..models.wan.dit import WanDiTConfig

    sd = load_torch_state_dict(path)
    name, cfg_kwargs = registry.detect(sd)
    if name == "wan_video_dit":
        known = {f.name for f in
                 __import__("dataclasses").fields(WanDiTConfig)}
        cfg = WanDiTConfig(**{k: v for k, v in cfg_kwargs.items()
                              if k in known})
        tree = convert_wan_dit(sd, cfg)
    elif name == "wan_video_vae":
        tree = convert_wan_vae({"model." + k if not k.startswith("model.")
                                else k: v for k, v in sd.items()})
    elif name == "wan_video_text_encoder":
        tree = convert_t5(sd)
    elif name == "wan_video_image_encoder":
        # the raw checkpoint carries bare 'visual.*' keys; 'model.visual.*'
        # only appears in from_civitai-renamed dicts (manager.py uses the
        # bare prefix for the same file -- the two paths used to diverge)
        pr = ("visual." if "visual.patch_embedding.weight" in sd
              else "model.visual.")
        tree = convert_clip_vision(sd, prefix=pr)
    else:
        raise KeyError(name)
    tree = cast_tree(tree, dtype)
    if out_dir:
        save_orbax(tree, os.path.join(out_dir, name))
    return name, tree


# -- pre-converted bundles ----------------------------------------------------
#
# The reference re-parses torch checkpoints on every run (ModelManager,
# model_manager.py:348-379). Converting the ~28 GB layout costs minutes of
# host work; a bundle is the converted pytree saved once (cli/convert.py)
# and mmap-restored on every later run. Layout:
#     <dir>/bundle.json            {"components": [...], "format": 1}
#     <dir>/<component>/           one Orbax dir per top-level tree

BUNDLE_MANIFEST = "bundle.json"


def is_bundle(path: str) -> bool:
    return bool(path) and os.path.isfile(os.path.join(path, BUNDLE_MANIFEST))


def save_bundle(components: Mapping[str, object], path: str,
                configs: Mapping[str, object] = None) -> str:
    """Save {name: pytree} as an Orbax bundle directory.

    configs: optional {key: config dataclass} (keys per
    utils/configio.py:config_registry) stamped into ``configs.json`` so the
    bundle is self-describing -- loaders reconstruct the exact architecture
    configs instead of hard-coding production dims."""
    import json
    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    for name, tree in components.items():
        save_orbax(tree, os.path.join(path, name))
    if configs:
        from ..utils.configio import config_to_dict
        with open(os.path.join(path, "configs.json"), "w") as f:
            json.dump({k: config_to_dict(v) for k, v in configs.items()},
                      f, indent=1)
    with open(os.path.join(path, BUNDLE_MANIFEST), "w") as f:
        json.dump({"components": sorted(components), "format": 1,
                   "configs": sorted(configs) if configs else []}, f)
    return path


def load_bundle_configs(path: str) -> Dict[str, object]:
    """Reconstruct the config dataclasses stamped by save_bundle (empty
    dict for bundles written before configs existed)."""
    import json
    fn = os.path.join(os.path.abspath(path), "configs.json")
    if not os.path.isfile(fn):
        return {}
    from ..utils.configio import config_from_dict, config_registry
    reg = config_registry()
    with open(fn) as f:
        raw = json.load(f)
    return {k: config_from_dict(reg[k], v) for k, v in raw.items()
            if k in reg}


def load_bundle(path: str, components=None) -> Dict[str, object]:
    """Restore an Orbax bundle; `components` optionally restricts/orders
    which trees load (a missing requested component raises KeyError)."""
    import json
    path = os.path.abspath(path)
    with open(os.path.join(path, BUNDLE_MANIFEST)) as f:
        manifest = json.load(f)
    have = set(manifest["components"])
    want = list(components) if components is not None else manifest["components"]
    missing = [c for c in want if c not in have]
    if missing:
        raise KeyError(f"bundle {path} lacks components {missing}; "
                       f"has {sorted(have)}")
    return {name: load_orbax(os.path.join(path, name)) for name in want}
