"""Production-SHAPE checkpoint conversion rehearsal (multi-gigabyte IO).

The r3 VERDICT's only unfixable gap was "the converter path has never
digested a real multi-gigabyte shard set end-to-end" (missing-#1): real
weights cannot enter this environment, but their SHAPES and file layouts
can. This tool synthesizes the wan21 set at FULL production geometry --
the 7-shard 14B bf16 DiT (28 GB), umT5-XXL bf16 .pth (11 GB), CLIP ViT-H
.pth, the VAE, and the fusion model.pth (pipe.dit + IRG + vggt, 33 GB) --
drives the same loader/converter/Orbax functions the CLIs compose, and
records wall times, peak RSS and full-census integrity into
CONVERT_REHEARSAL.json.

What each phase proves at scale (values are zeros + spot-seeded random
tensors; conversion ALGEBRA is covered by the parity suites, so the
rehearsal checks mechanics + structure):
  * 7-shard glob + merge + registry hash-detection from REAL 4 GB files
    (hash covers shapes, so only production geometry detects);
  * bf16 stays bf16 through the host (ml_dtypes; the old fp32 upcast would
    have needed 56 GB for the DiT alone -- found and fixed by this
    rehearsal's first run);
  * converted tree == the abstract production init tree, path-for-path and
    shape-for-shape (the census assertion, now from disk);
  * Orbax save -> reload bit-identity on spot leaves;
  * peak-RSS / wall-time numbers a deployment can plan against.

The fusion phase runs in a SUBPROCESS (it holds base DiT + fusion dicts +
the converted tree at once; if the host OOM-kills it, the parent still
writes the artifact with that outcome recorded).

Run: python tools/convert_rehearsal.py          (re-execs itself on CPU)
     python tools/convert_rehearsal.py --phase fusion   (subprocess entry)
"""
from __future__ import annotations

import json
import os
import resource
import shutil
import subprocess
import sys
import time

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir)
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

WORK = os.environ.get("FW_REHEARSAL_DIR", "/tmp/fw_convert_rehearsal")
OUT = os.path.join(REPO, "CONVERT_REHEARSAL.json")
N_SPOT = 16


def _ensure_cpu():
    """jax on this host defaults to the tunneled TPU (and the axon
    sitecustomize overrides JAX_PLATFORMS when PALLAS_AXON_POOL_IPS is
    set); 28 GB trees must stay on host RAM. Re-exec once with a clean
    environment."""
    if os.environ.get("FW_REHEARSAL_CPU") == "1":
        return
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["FW_REHEARSAL_CPU"] = "1"
    r = subprocess.run([sys.executable] + sys.argv, env=env)
    raise SystemExit(r.returncode)


def rss_gb():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def _spot_fill(sd_shapes, seed):
    """keys -> torch tensors: zeros everywhere (virtual pages, cheap)
    except N_SPOT deterministic keys seeded with real random values."""
    import numpy as np
    import torch
    keys = sorted(sd_shapes)
    spots = set(keys[:: max(1, len(keys) // N_SPOT)][:N_SPOT])
    rng = np.random.default_rng(seed)
    out = {}
    for k in keys:
        shape = tuple(sd_shapes[k])
        if k in spots:
            out[k] = torch.from_numpy(
                rng.standard_normal(shape).astype(np.float32)
            ).to(torch.bfloat16)
        else:
            out[k] = torch.zeros(shape, dtype=torch.bfloat16)
    return out, sorted(spots)


def _census_assert(converted, abstract_tree):
    from test_census import _shapes
    got, want = _shapes(converted), _shapes(abstract_tree)
    assert set(got) == set(want), (
        f"paths differ: extra={sorted(set(got) - set(want))[:6]} "
        f"missing={sorted(set(want) - set(got))[:6]}")
    bad = {p: (got[p], want[p]) for p in got if got[p] != want[p]}
    assert not bad, f"shape mismatches: {dict(list(bad.items())[:6])}"
    return len(got)


def _leaf_paths(tree, prefix=""):
    if isinstance(tree, dict):
        for k in sorted(tree):
            yield from _leaf_paths(tree[k], f"{prefix}/{k}")
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            yield from _leaf_paths(v, f"{prefix}/{i}")
    else:
        yield prefix, tree


def _spot_leaves(tree):
    import numpy as np
    leaves = list(_leaf_paths(tree))
    picked = leaves[:: max(1, len(leaves) // N_SPOT)][:N_SPOT]
    return {p: np.asarray(v).view(np.uint16).sum(dtype=np.uint64)
            .item() if np.asarray(v).dtype.itemsize == 2
            else float(np.asarray(v, np.float64).sum())
            for p, v in picked}


def timed(rec, key, fn):
    t0 = time.perf_counter()
    out = fn()
    rec[key] = round(time.perf_counter() - t0, 1)
    return out


def phase_dit(rec):
    import gc
    import torch
    import jax.numpy as jnp
    import conftest as C
    C.add_reference_to_path()
    from test_census import _ref_wan21_dit
    from fantasy_world_tpu.convert.orbax_io import (load_sharded_state_dict,
                                                    cast_tree, save_orbax,
                                                    load_orbax)
    from fantasy_world_tpu.convert.registry import detect
    from fantasy_world_tpu.convert.manager import _translate_dit_config
    from fantasy_world_tpu.convert.wan_dit import convert_wan_dit
    from fantasy_world_tpu.models.wan.dit import WanDiTConfig, init_wan_dit
    from fantasy_world_tpu.core.params import abstract_init
    from safetensors.torch import save_file

    with torch.device("meta"):
        shapes = {k: v.shape for k, v in _ref_wan21_dit().state_dict().items()}
    sd_t, spots = _spot_fill(shapes, seed=1)
    rec["n_keys"] = len(sd_t)

    d = os.path.join(WORK, "dit")
    os.makedirs(d, exist_ok=True)
    keys = sorted(sd_t)

    def write():
        total = 0
        for i in range(7):
            part = {k: sd_t[k] for k in keys[i::7]}
            p = os.path.join(
                d, f"diffusion_pytorch_model-{i + 1:05d}-of-00007"
                   f".safetensors")
            save_file(part, p)
            total += os.path.getsize(p)
        return total

    rec["bytes_written"] = timed(rec, "write_s", write)
    del sd_t
    gc.collect()

    sd = timed(rec, "load_merge_s", lambda: load_sharded_state_dict(
        sorted(os.path.join(d, f) for f in os.listdir(d))))
    rec["rss_after_load_gb"] = round(rss_gb(), 1)
    name, overrides = detect(sd)
    assert name == "wan_video_dit", name
    cfg = WanDiTConfig(**_translate_dit_config(overrides))
    assert cfg.dim == 5120 and cfg.num_layers == 40
    rec["hash_detected"] = True
    tree = timed(rec, "convert_s", lambda: convert_wan_dit(sd, cfg))
    del sd
    gc.collect()
    tree = timed(rec, "cast_s", lambda: cast_tree(tree, jnp.bfloat16))
    with abstract_init():
        rec["census_leaves"] = _census_assert(tree, init_wan_dit(0, cfg,
                                                                 jnp.bfloat16))
    pre = _spot_leaves(tree)
    ckpt = os.path.join(WORK, "dit_orbax")
    timed(rec, "orbax_save_s", lambda: save_orbax(tree, ckpt))
    del tree
    gc.collect()
    back = timed(rec, "orbax_load_s", lambda: load_orbax(ckpt))
    post = _spot_leaves(back)
    assert pre == post, "orbax round-trip changed spot leaves"
    rec["spot_roundtrip_ok"] = True
    del back
    gc.collect()
    shutil.rmtree(ckpt)
    rec["peak_rss_gb"] = round(rss_gb(), 1)
    # shards stay on disk for the fusion phase


def _encoder_phase(rec, which):
    import gc
    import torch
    import jax.numpy as jnp
    import conftest as C
    C.add_reference_to_path()
    from fantasy_world_tpu.convert.orbax_io import (load_torch_state_dict,
                                                    cast_tree, save_orbax,
                                                    load_orbax)
    from fantasy_world_tpu.core.params import abstract_init

    if which == "t5":
        from FantasyWorld.diffsynth_wan21.models.wan_video_text_encoder \
            import WanTextEncoder
        from fantasy_world_tpu.convert.encoders import convert_t5 as conv
        from fantasy_world_tpu.models.wan.t5 import T5Config, init_t5
        with torch.device("meta"):
            shapes = {k: v.shape for k, v in
                      WanTextEncoder().state_dict().items()}
        fname, seed = "models_t5_umt5-xxl-enc-bf16.pth", 2
        init_abs = lambda: init_t5(0, T5Config(), jnp.bfloat16)   # noqa: E731
    elif which == "clip":
        from FantasyWorld.diffsynth_wan21.models.wan_video_image_encoder \
            import XLMRobertaCLIP
        from fantasy_world_tpu.convert.encoders import convert_clip_vision
        from fantasy_world_tpu.models.wan.clip import (CLIPVisionConfig,
                                                       init_clip_vision)
        with torch.device("meta"):
            clip = XLMRobertaCLIP(
                embed_dim=1024, image_size=224, patch_size=14,
                vision_dim=1280, vision_mlp_ratio=4, vision_heads=16,
                vision_layers=32, vision_pool='token', activation='gelu',
                vocab_size=250002, max_text_len=514, type_size=1, pad_id=1,
                text_dim=1024, text_heads=16, text_layers=24,
                text_post_norm=True, text_dropout=0.1, attn_dropout=0.0,
                proj_dropout=0.0, embedding_dropout=0.0)
            shapes = {k: v.shape for k, v in clip.state_dict().items()}
        fname, seed = \
            "models_clip_open-clip-xlm-roberta-large-vit-huge-14.pth", 3
        conv = lambda sd: convert_clip_vision(sd, prefix="visual.")  # noqa
        init_abs = lambda: init_clip_vision(0, CLIPVisionConfig(),  # noqa
                                            jnp.bfloat16)
    else:
        from FantasyWorld.diffsynth_wan21.models.wan_video_vae import (
            WanVideoVAE)
        from fantasy_world_tpu.convert.wan_vae import convert_wan_vae
        from fantasy_world_tpu.models.wan.vae import VAEConfig, init_wan_vae
        with torch.device("meta"):
            shapes = {k: v.shape for k, v in
                      WanVideoVAE().state_dict().items()}
        fname, seed = "Wan2.1_VAE.pth", 4
        conv = lambda sd: convert_wan_vae(                        # noqa
            {("model." + k) if not k.startswith("model.") else k: v
             for k, v in sd.items()})
        init_abs = lambda: init_wan_vae(0, VAEConfig(), jnp.bfloat16)  # noqa

    sd_t, _ = _spot_fill(shapes, seed=seed)
    rec["n_keys"] = len(sd_t)
    path = os.path.join(WORK, fname)
    timed(rec, "write_s", lambda: torch.save(sd_t, path))
    rec["bytes_written"] = os.path.getsize(path)
    del sd_t
    gc.collect()
    sd = timed(rec, "load_s", lambda: load_torch_state_dict(path))
    tree = timed(rec, "convert_s", lambda: conv(sd))
    del sd
    gc.collect()
    import jax.numpy as jnp2
    tree = timed(rec, "cast_s", lambda: cast_tree(tree, jnp2.bfloat16))
    with abstract_init():
        rec["census_leaves"] = _census_assert(tree, init_abs())
    pre = _spot_leaves(tree)
    ckpt = os.path.join(WORK, which + "_orbax")
    timed(rec, "orbax_save_s", lambda: save_orbax(tree, ckpt))
    del tree
    gc.collect()
    back = timed(rec, "orbax_load_s", lambda: load_orbax(ckpt))
    assert pre == _spot_leaves(back), "orbax round-trip changed spot leaves"
    rec["spot_roundtrip_ok"] = True
    del back
    gc.collect()
    os.remove(path)
    shutil.rmtree(ckpt)
    rec["peak_rss_gb"] = round(rss_gb(), 1)


def phase_fusion(rec):
    """pipe.dit overlay + IRG surgery + vggt tree from a 33 GB model.pth
    against the 28 GB shard set: the single heaviest RAM point of the real
    pipeline. Census keys from test_census._ref_fusion_census (the
    meta-device reconstruction whose key set the hash registry pins)."""
    import gc
    import torch
    import jax.numpy as jnp
    import conftest as C
    C.add_reference_to_path()
    from test_census import _ref_fusion_census
    from fantasy_world_tpu.convert.orbax_io import (load_sharded_state_dict,
                                                    load_torch_state_dict,
                                                    cast_tree)
    from fantasy_world_tpu.convert.fusion import convert_fusion_checkpoint
    from fantasy_world_tpu.models.fusion.model import (FusionConfig,
                                                       init_fusion)
    from fantasy_world_tpu.core.params import abstract_init

    census = _ref_fusion_census()
    shapes = {k: tuple(v.shape) for k, v in census.items()}
    del census
    gc.collect()
    sd_t, _ = _spot_fill(shapes, seed=5)
    rec["n_keys"] = len(sd_t)
    path = os.path.join(WORK, "model.pth")
    timed(rec, "write_s", lambda: torch.save(sd_t, path))
    rec["bytes_written"] = os.path.getsize(path)
    del sd_t
    gc.collect()

    d = os.path.join(WORK, "dit")
    base_sd = timed(rec, "load_base_s", lambda: load_sharded_state_dict(
        sorted(os.path.join(d, f) for f in os.listdir(d))))
    fusion_sd = timed(rec, "load_fusion_s",
                      lambda: load_torch_state_dict(path))
    rec["rss_after_load_gb"] = round(rss_gb(), 1)
    cfg = FusionConfig()
    tree = timed(rec, "convert_s", lambda: convert_fusion_checkpoint(
        fusion_sd, base_sd, cfg))
    del base_sd, fusion_sd
    gc.collect()
    tree = timed(rec, "cast_s", lambda: cast_tree(tree, jnp.bfloat16))
    with abstract_init():
        expected = init_fusion(0, cfg, jnp.bfloat16)
    # pose encoder enters via the camera_condition keys; census compares
    # the shared structure (same allowance test_census makes)
    tree.pop("camera_pose_encoder", None)
    rec["census_leaves"] = _census_assert(tree, expected)
    rec["peak_rss_gb"] = round(rss_gb(), 1)
    del tree
    gc.collect()
    os.remove(path)


def main():
    _ensure_cpu()
    os.makedirs(WORK, exist_ok=True)
    doc = {"machine_ram_gb": 125, "workdir": WORK, "phases": {}}
    if os.path.exists(OUT):
        with open(OUT) as fh:
            doc = json.load(fh)

    only = None
    if "--phase" in sys.argv:
        only = sys.argv[sys.argv.index("--phase") + 1]

    def run_phase(name, fn):
        rec = {"status": "running"}
        doc["phases"][name] = rec
        t0 = time.perf_counter()
        try:
            fn(rec)
            rec["status"] = "ok"
        except Exception as e:
            rec["status"] = f"{type(e).__name__}: {str(e)[:300]}"
        rec["total_s"] = round(time.perf_counter() - t0, 1)
        with open(OUT, "w") as fh:
            json.dump(doc, fh, indent=1)
        print(f"[rehearsal] {name}: {rec['status']} in {rec['total_s']}s "
              f"(peak RSS {rec.get('peak_rss_gb', '?')} GB)", flush=True)

    if only == "fusion":
        run_phase("fusion_model_pth", phase_fusion)
        return
    if only in ("t5", "clip", "vae"):
        run_phase({"t5": "t5_umt5xxl_bf16", "clip": "clip_vit_h",
                   "vae": "vae"}[only],
                  lambda r: _encoder_phase(r, only))
        return
    if only == "dit":
        run_phase("dit_7shard_14b", phase_dit)
        return

    run_phase("dit_7shard_14b", phase_dit)
    run_phase("t5_umt5xxl_bf16", lambda r: _encoder_phase(r, "t5"))
    run_phase("clip_vit_h", lambda r: _encoder_phase(r, "clip"))
    run_phase("vae", lambda r: _encoder_phase(r, "vae"))
    # fusion in a subprocess: a host OOM kill must not lose the artifact
    r = subprocess.run([sys.executable, os.path.abspath(__file__),
                        "--phase", "fusion"], env=dict(os.environ))
    if r.returncode != 0:
        with open(OUT) as fh:
            doc = json.load(fh)
        ph = doc["phases"].setdefault("fusion_model_pth", {})
        if ph.get("status") in (None, "running"):
            ph["status"] = f"subprocess rc={r.returncode} (OOM-killed?)"
            with open(OUT, "w") as fh:
                json.dump(doc, fh, indent=1)
    shutil.rmtree(WORK, ignore_errors=True)
    with open(OUT) as fh:
        print(json.dumps(json.load(fh), indent=1))


if __name__ == "__main__":
    main()
