"""Model auto-fetch: preset ids -> local files, download-if-missing.

Re-design of the reference's two download layers:

  * diffsynth_wan21/models/downloader.py:9-111 -- preset-name tables with
    (repo_id, file, local_dir) triples, ModelScope-then-HuggingFace
    priority, skip-if-exists;
  * diffsynth_wan22/utils/__init__.py:159-230 -- per-model ``ModelConfig``
    dataclass resolving {model_id, origin_file_pattern, local_model_path}
    to concrete paths via glob, downloading only missing files.

Both are folded into one module. Network access is optional: resolution is
glob-first, so fully pre-populated model directories (the common TPU-pod
deployment, where weights arrive via GCS) never touch the hub libraries;
downloads only run when files are missing AND huggingface_hub/modelscope
is importable.
"""
from __future__ import annotations

import dataclasses
import fnmatch
import glob
import os
import shutil
from typing import List, Optional, Sequence, Union

# preset name -> list of (repo_id, origin_file_pattern, local_subdir).
# Exactly the artifacts the FantasyWorld entry points load
# (inference_wan21.py:183-187, 151; inference_wan22.py:86-116;
# fusion/model_wan22.py:160-182).
PRESET_MODELS = {
    "Wan2.1-I2V-14B-480P": [
        ("Wan-AI/Wan2.1-I2V-14B-480P",
         f"diffusion_pytorch_model-0000{i}-of-00007.safetensors",
         "Wan2.1-I2V-14B-480P") for i in range(1, 8)
    ] + [
        ("Wan-AI/Wan2.1-I2V-14B-480P", "Wan2.1_VAE.pth",
         "Wan2.1-I2V-14B-480P"),
        ("Wan-AI/Wan2.1-I2V-14B-480P",
         "models_clip_open-clip-xlm-roberta-large-vit-huge-14.pth",
         "Wan2.1-I2V-14B-480P"),
        ("Wan-AI/Wan2.1-I2V-14B-480P", "models_t5_umt5-xxl-enc-bf16.pth",
         "Wan2.1-I2V-14B-480P"),
        ("Wan-AI/Wan2.1-I2V-14B-480P", "google/umt5-xxl/*",
         "Wan2.1-I2V-14B-480P/google/umt5-xxl"),
    ],
    "Wan2.2-Fun-A14B-Control-Camera": [
        ("PAI/Wan2.2-Fun-A14B-Control-Camera",
         "high_noise_model/diffusion_pytorch_model*.safetensors",
         "Wan2.2-Fun-A14B-Control-Camera/high_noise_model"),
        ("PAI/Wan2.2-Fun-A14B-Control-Camera",
         "low_noise_model/diffusion_pytorch_model*.safetensors",
         "Wan2.2-Fun-A14B-Control-Camera/low_noise_model"),
        ("PAI/Wan2.2-Fun-A14B-Control-Camera", "Wan2.1_VAE.pth",
         "Wan2.2-Fun-A14B-Control-Camera"),
        ("PAI/Wan2.2-Fun-A14B-Control-Camera",
         "models_t5_umt5-xxl-enc-bf16.pth",
         "Wan2.2-Fun-A14B-Control-Camera"),
    ],
    "Wan2.2-Fun-Reward-LoRAs": [
        ("PAI/Wan2.2-Fun-Reward-LoRAs",
         "Wan2.2-Fun-A14B-InP-high-noise-HPS2.1.safetensors",
         "PAI/Wan2.2-Fun-Reward-LoRAs"),
        ("PAI/Wan2.2-Fun-Reward-LoRAs",
         "Wan2.2-Fun-A14B-InP-low-noise-HPS2.1.safetensors",
         "PAI/Wan2.2-Fun-Reward-LoRAs"),
    ],
    "FantasyWorld": [
        ("amap_cvlab/FantasyWorld", "model.pth", "FantasyWorld"),
    ],
    "MoGe-2": [
        ("Ruicheng/moge-2-vitl-normal", "model.pt", "moge-2-vitl-normal"),
    ],
}


def _have_hub(resource: str) -> bool:
    try:
        if resource == "huggingface":
            import huggingface_hub  # noqa: F401
        else:
            import modelscope  # noqa: F401
        return True
    except ImportError:
        return False


def _hub_download(repo_id: str, pattern: str, local_dir: str,
                  priority: Sequence[str] = ("modelscope", "huggingface"),
                  flatten: bool = True):
    """Fetch files matching ``pattern`` from the first reachable hub.
    Mirrors download_from_{modelscope,huggingface} incl. the flatten-move
    of nested origin paths (downloader.py:9-36).

    flatten: the PRESET tables glob ``local_dir/<basename>`` afterwards,
    so nested repo-relative paths must be hoisted; ModelConfig callers
    glob ``base/<full pattern>`` (the repo-relative layout) and pass
    flatten=False -- hoisting there would move the files out from under
    the very glob that looks for them (caught by the r4 review)."""
    last_err = None
    for resource in priority:
        if not _have_hub(resource):
            continue
        try:
            if resource == "modelscope":
                from modelscope import snapshot_download
                snapshot_download(repo_id, allow_file_pattern=pattern,
                                  local_dir=local_dir)
            else:
                from huggingface_hub import snapshot_download
                snapshot_download(repo_id, allow_patterns=[pattern],
                                  local_dir=local_dir)
            # flatten nested repo-relative paths like the reference does.
            # snapshot_download preserves the repo layout under local_dir,
            # so a directory-qualified pattern (with or without a glob --
            # e.g. "high_noise_model/diffusion_pytorch_model*.safetensors"
            # into a local_dir that already ends in high_noise_model) lands
            # one level too deep; move every match up and drop the shell
            if flatten and "/" in pattern:
                for src in glob.glob(os.path.join(local_dir, pattern)):
                    dst = os.path.join(local_dir, os.path.basename(src))
                    if os.path.abspath(src) != os.path.abspath(dst):
                        shutil.move(src, dst)
                shutil.rmtree(os.path.join(local_dir, pattern.split("/")[0]),
                              ignore_errors=True)
            return
        except Exception as e:                      # noqa: BLE001
            last_err = e
    raise RuntimeError(
        f"cannot fetch {repo_id}:{pattern}: no hub library reachable "
        f"(last error: {last_err}); pre-place the files in {local_dir}")


def download_models(model_id_list: Sequence[str],
                    local_model_path: str = "./models",
                    priority: Sequence[str] = ("modelscope", "huggingface")
                    ) -> List[str]:
    """Preset-name download (downloader.py:72-111): returns the local paths,
    downloading only what is missing."""
    out = []
    for name in model_id_list:
        if name not in PRESET_MODELS:
            raise ValueError(f"unknown preset {name!r}; choose from "
                             f"{sorted(PRESET_MODELS)}")
        for repo_id, pattern, subdir in PRESET_MODELS[name]:
            local_dir = os.path.join(local_model_path, subdir)
            base = os.path.basename(pattern)
            existing = glob.glob(os.path.join(local_dir, base))
            if not existing:
                os.makedirs(local_dir, exist_ok=True)
                _hub_download(repo_id, pattern, local_dir, priority)
                existing = glob.glob(os.path.join(local_dir, base))
            out.extend(sorted(existing))
    return out


@dataclasses.dataclass
class ModelConfig:
    """Declarative model source (diffsynth_wan22/utils/__init__.py:159-230):
    either a concrete ``path`` or {model_id, origin_file_pattern} resolved
    under ``local_model_path``/<model_id>/."""
    path: Union[str, List[str], None] = None
    model_id: Optional[str] = None
    origin_file_pattern: Union[str, List[str], None] = None
    download_resource: str = "ModelScope"
    local_model_path: Optional[str] = None
    skip_download: bool = False

    def download_if_necessary(self) -> None:
        if self.path is not None:
            return
        if self.model_id is None:
            raise ValueError(
                'No valid model files. Use ModelConfig(path="xxx") or '
                'ModelConfig(model_id="xxx/yyy", origin_file_pattern="zzz").')
        root = self.local_model_path or "./models"
        base = os.path.join(root, self.model_id)
        pattern = self.origin_file_pattern or ""
        is_folder = pattern == "" or (isinstance(pattern, str)
                                      and pattern.endswith("/"))
        matches = glob.glob(os.path.join(base, pattern or "*"))
        if not matches and not self.skip_download:
            os.makedirs(base, exist_ok=True)
            priority = ([self.download_resource.lower(), "huggingface"]
                        if self.download_resource.lower() != "huggingface"
                        else ["huggingface", "modelscope"])
            _hub_download(self.model_id,
                          (pattern + "*") if is_folder else pattern,
                          base, priority, flatten=False)
            matches = glob.glob(os.path.join(base, pattern or "*"))
        # check MATCHES, not self.path: the folder branch builds a
        # non-empty string even when nothing exists on disk, which used to
        # defeat this error and fail later with a confusing glob/open error
        if not matches:
            raise FileNotFoundError(
                f"no files matching {pattern!r} under {base}")
        if is_folder:
            self.path = os.path.join(base, pattern)
        else:
            self.path = sorted(matches)
            if len(self.path) == 1:
                self.path = self.path[0]


def resolve_ckpt_dir(ckpt_dir: str, preset: str = "Wan2.1-I2V-14B-480P",
                     auto_download: bool = True) -> str:
    """CLI glue: if ckpt_dir exists, use it; otherwise treat it as
    ``<local_model_path>/<preset subdir>`` and fetch the preset into it."""
    probe = os.path.join(ckpt_dir, "models_t5_umt5-xxl-enc-bf16.pth")
    if os.path.isdir(ckpt_dir) and (os.path.exists(probe)
                                    or glob.glob(os.path.join(
                                        ckpt_dir, "*.safetensors"))):
        return ckpt_dir
    if not auto_download:
        raise FileNotFoundError(f"{ckpt_dir} missing and auto-download off")
    root = os.path.dirname(ckpt_dir.rstrip("/")) or "."
    download_models([preset], local_model_path=root)
    # the preset downloads into root/<preset subdir>; when the caller's
    # basename differs, returning ckpt_dir unchanged pointed the sampler
    # at a still-empty directory -- re-validate and return where the
    # files actually are
    for cand in (ckpt_dir, os.path.join(root, preset)):
        if os.path.isdir(cand) and (
                os.path.exists(os.path.join(
                    cand, "models_t5_umt5-xxl-enc-bf16.pth"))
                or glob.glob(os.path.join(cand, "*.safetensors"))
                or glob.glob(os.path.join(cand, "*.pth"))
                or glob.glob(os.path.join(cand, "*.pt"))):
            return cand
    raise FileNotFoundError(
        f"downloaded preset {preset!r} but neither {ckpt_dir} nor "
        f"{os.path.join(root, preset)} contains its files")
