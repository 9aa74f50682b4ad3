"""ModelManager: files -> hash-detected, converted param trees.

Re-design of the reference ModelManager (diffsynth_wan21/models/
model_manager.py:269-407): load .pth/.safetensors (single file, shard list,
or directory), detect the architecture by the md5-of-keys census
(convert/registry.py), convert with the matching converter, and serve the
trees by name. Instead of torch classes on a device, the artifacts here are
(config, numpy param tree) pairs ready for jax.device_put / Orbax.

Also exposes ``from_pretrained``-style resolution through
convert/downloader.ModelConfig (diffsynth_wan22/utils/__init__.py:159-230).
"""
from __future__ import annotations

import glob
import os
from typing import Dict, List, Optional, Sequence, Tuple, Union

from .registry import detect
from .orbax_io import load_torch_state_dict, load_sharded_state_dict


def _translate_dit_config(overrides: Dict) -> Dict:
    """Registry entries use the reference's flag names; WanDiTConfig uses
    has_image_input (CLIP context / image-kv module structure). wan22 carries
    require_clip_embedding as a separate pipeline flag next to an explicit
    has_image_input (wan22 wan_video_dit.py:841-859) -- the explicit module
    flag wins; require_clip_embedding only substitutes when absent."""
    out = dict(overrides)
    clip_flag = out.pop("require_clip_embedding", None)
    if clip_flag is not None and "has_image_input" not in out:
        out["has_image_input"] = clip_flag
    return out


class ModelManager:
    """load_models(paths) -> fetch_model(name) over converted param trees."""

    def __init__(self):
        # name -> [(config_obj_or_None, params), ...] in load order: two
        # checkpoints of one architecture (the wan22 dual 14B experts both
        # hash-detect as wan_video_dit) must coexist, matching the
        # reference's list-of-models + fetch_model(index=...) semantics
        # (wan22 model_manager.py:383-415)
        self.models: Dict[str, List[Tuple[object, Dict]]] = {}

    # -- loading --------------------------------------------------------------

    @staticmethod
    def _read(path: Union[str, Sequence[str]]) -> Dict:
        if isinstance(path, (list, tuple)):
            return load_sharded_state_dict(list(path))
        if os.path.isdir(path):
            shards = sorted(glob.glob(os.path.join(path, "*.safetensors")))
            if not shards:
                raise FileNotFoundError(f"no safetensors under {path}")
            return load_sharded_state_dict(shards)
        return load_torch_state_dict(path)

    def load_model(self, path: Union[str, Sequence[str], Dict]) -> str:
        """path: file path, shard list, directory, or an already-loaded flat
        state dict (in-memory serving / tests)."""
        sd = path if isinstance(path, dict) else self._read(path)
        name, overrides = detect(sd)
        if name == "wan_video_dit":
            from ..models.wan.dit import WanDiTConfig
            from .wan_dit import convert_wan_dit
            cfg = WanDiTConfig(**_translate_dit_config(overrides))
            params = convert_wan_dit(sd, cfg)
        elif name == "wan_video_text_encoder":
            from ..models.wan.t5 import T5Config
            from .encoders import convert_t5
            cfg, params = T5Config(), convert_t5(sd)
        elif name == "wan_video_image_encoder":
            from ..models.wan.clip import CLIPVisionConfig
            from .encoders import convert_clip_vision
            # file layout is the bare XLMRobertaCLIP dict ('visual.*' +
            # 'textual.*'); from_civitai drops textual and adds 'model.'
            # (wan_video_image_encoder.py:894-905) -- convert straight from
            # the file keys instead
            cfg, params = CLIPVisionConfig(), convert_clip_vision(
                sd, prefix="visual.")
        elif name == "wan_video_vae":
            from ..models.wan.vae import VAEConfig
            from .wan_vae import convert_wan_vae
            cfg = VAEConfig()
            params = convert_wan_vae(
                {("model." + k) if not k.startswith("model.") else k: v
                 for k, v in sd.items()})
        else:                                        # pragma: no cover
            raise KeyError(name)
        self.models.setdefault(name, []).append((cfg, params))
        return name

    def load_models(self, paths: Sequence[Union[str, Sequence[str]]]
                    ) -> List[str]:
        return [self.load_model(p) for p in paths]

    # -- serving ----------------------------------------------------------------

    def fetch_model(self, name: str, index: Optional[int] = None
                    ) -> Union[Tuple[object, Dict],
                               List[Tuple[object, Dict]]]:
        """index=None -> the first loaded (cfg, params) pair (the
        reference's behavior, with its warning when several match);
        index=N -> the first N pairs as a list (dual-DiT flow,
        wan22 model_manager.py:400-407)."""
        if name not in self.models:
            raise KeyError(f"{name} not loaded; have {sorted(self.models)}")
        entries = self.models[name]
        if index is not None:
            return entries[:index]
        if len(entries) > 1:
            print(f"More than one {name} loaded; using the first of "
                  f"{len(entries)} (pass index=N for the list)")
        return entries[0]

    def fetch_params(self, name: str) -> Dict:
        return self.fetch_model(name)[1]


def from_model_configs(model_configs: Sequence, manager: Optional[ModelManager]
                       = None) -> ModelManager:
    """Resolve downloader.ModelConfig entries (download-if-missing) and load
    them -- the wan22 WanVideoPipeline.from_pretrained flow
    (wan_video_new.py:344-418) without the torch modules."""
    manager = manager or ModelManager()
    for mc in model_configs:
        mc.download_if_necessary()
        manager.load_model(mc.path)
    return manager
