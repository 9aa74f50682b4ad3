"""Config (de)serialization for self-describing Orbax bundles.

The reference derives every architecture config from a state-dict hash
registry at load time (configs/model_config.py:10-30) -- each run re-hashes
the checkpoint to find out what it is. Here the conversion CLI stamps the
resolved configs INTO the bundle once (convert/orbax_io.py:save_bundle),
and the loaders reconstruct the exact dataclasses from `configs.json`, so a
bundle of any size (production 14B or a reduced demo config) loads without
the caller hard-coding dims.

All config classes are (nested) frozen dataclasses whose fields are ints,
floats, bools, strings, tuples, or further config dataclasses -- the two
functions below round-trip exactly that shape through JSON.
"""
from __future__ import annotations

import dataclasses
import typing
from typing import Dict


def config_to_dict(cfg) -> Dict:
    """Recursive dataclass -> plain JSON-serializable dict."""
    out = {}
    for f in dataclasses.fields(cfg):
        v = getattr(cfg, f.name)
        if dataclasses.is_dataclass(v):
            out[f.name] = config_to_dict(v)
        elif isinstance(v, tuple):
            out[f.name] = list(v)
        else:
            out[f.name] = v
    return out


def config_from_dict(cls, d: Dict):
    """Reconstruct a config dataclass from ``config_to_dict`` output.

    Unknown keys are ignored (forward compatibility); missing keys keep
    the class defaults. Lists are converted back to tuples when the field
    is tuple-typed, and dataclass-typed fields recurse.
    """
    try:
        hints = typing.get_type_hints(cls)
    except Exception:      # unresolvable forward refs: fall back to raw
        hints = {f.name: f.type for f in dataclasses.fields(cls)}
    kw = {}
    for f in dataclasses.fields(cls):
        if f.name not in d:
            continue
        v = d[f.name]
        t = hints.get(f.name, f.type)
        origin = typing.get_origin(t)
        if origin is typing.Union:          # Optional[...]
            args = [a for a in typing.get_args(t) if a is not type(None)]
            if args:
                t = args[0]
                origin = typing.get_origin(t)
        if v is None:
            kw[f.name] = None
        elif dataclasses.is_dataclass(t):
            kw[f.name] = config_from_dict(t, v)
        elif origin is tuple or t is tuple:
            kw[f.name] = tuple(v)
        else:
            kw[f.name] = v
    return cls(**kw)


def config_registry() -> Dict[str, type]:
    """Bundle config-key -> dataclass. Keys match the bundle component
    names (fusion/fusion_high/fusion_low/t5/clip/vae) plus 'pose' for the
    camera pose-encoder config the wan21 pipeline needs."""
    from ..models.fusion.model import FusionConfig
    from ..models.wan.t5 import T5Config
    from ..models.wan.clip import CLIPVisionConfig
    from ..models.wan.vae import VAEConfig
    from ..models.wan.camera import CameraPoseEncoderConfig
    return {
        "fusion": FusionConfig,
        "fusion_high": FusionConfig,
        "fusion_low": FusionConfig,
        "t5": T5Config,
        "clip": CLIPVisionConfig,
        "vae": VAEConfig,
        "pose": CameraPoseEncoderConfig,
    }
