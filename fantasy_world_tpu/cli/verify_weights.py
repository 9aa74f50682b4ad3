"""One-command real-weights dress rehearsal (r4 VERDICT next-#9).

The day the published checkpoints become available, validation is:

    python -m fantasy_world_tpu.cli.verify_weights --variant wan21 \
        --wan_ckpt_path ./Wan2.1-I2V-14B-480P --model_ckpt ./model.pth \
        --report verify_report.json [--out_bundle ./wan21.bundle]

    python -m fantasy_world_tpu.cli.verify_weights --variant wan22 \
        --wan_ckpt_path ./Wan2.2-Fun-A14B-Control-Camera \
        --model_ckpt_high ./high_noise_model.pth \
        --model_ckpt_low ./low_noise_model.pth --report verify_report.json

Phases (each recorded in the report with ok/wall/detail; the process exits
non-zero if any fails):

  load      -- the SAME loader the inference CLIs compose
               (cli/infer_wan21.py:load_fusion_params /
               cli/infer_wan22.py:load_expert: shard glob+merge, hash-keyed
               converters, LoRA merge at 0.55, fusion overlay) over the
               real files; bundle directories mmap-restore instead.
  census    -- structural census of the loaded fusion tree(s) against the
               architecture's abstract init: missing/unexpected paths and
               shape mismatches, the TPU-side form of the reference's
               `assert not messages.unexpected_keys`
               (/root/reference/inference_wan21.py:217-223).
  finite    -- every leaf checked for NaN/Inf on device.
  bundle    -- optional: save an Orbax bundle, reload, bit-compare.
  denoise   -- a REAL 2-step CFG denoise (random conditioning at the
               architecture's widths, reduced frame count) through
               FantasyWorldPipeline / DualModelDenoiser with heads on.
  heads     -- sanity on the final-step geometry outputs: finiteness,
               depth > 0 (exp head), confidences >= 1 (expp1 head),
               pose encoding finite.

Tested against the reduced-width synthetic production layouts of
tests/test_checkpoint_rehearsal.py (tests/test_verify_weights.py).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="real-weights dress rehearsal")
    p.add_argument("--variant", choices=["wan21", "wan22"], default="wan21")
    p.add_argument("--wan_ckpt_path", type=str, required=True,
                   help="reference checkpoint dir OR pre-converted bundle")
    p.add_argument("--model_ckpt", type=str, default=None,
                   help="wan21 fusion checkpoint (model.pth)")
    p.add_argument("--model_ckpt_high", type=str, default=None)
    p.add_argument("--model_ckpt_low", type=str, default=None)
    p.add_argument("--config_from", type=str, default=None,
                   help="bundle dir whose stamped configs describe the "
                        "architecture (for non-production-width layouts); "
                        "default: the production 14B config, or the "
                        "bundle's own configs when --wan_ckpt_path is one")
    p.add_argument("--out_bundle", type=str, default=None,
                   help="also save + reload + bit-verify an Orbax bundle")
    p.add_argument("--steps", type=int, default=2)
    p.add_argument("--frames", type=int, default=9)
    p.add_argument("--height", type=int, default=None,
                   help="default: variant production height (336/480)")
    p.add_argument("--width", type=int, default=None)
    p.add_argument("--quant", type=str, default=None, choices=[None, "int8"],
                   help="verify the quantized serving path instead")
    p.add_argument("--report", type=str, default="verify_report.json")
    return p.parse_args(argv)


def _tree_paths(tree, prefix=""):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _tree_paths(v, f"{prefix}{k}/")
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            yield from _tree_paths(v, f"{prefix}{i}/")
    else:
        yield prefix[:-1], tree


def _census(got_fusion, cfg):
    """Loaded fusion tree vs the architecture's abstract init."""
    import jax
    import jax.numpy as jnp
    from ..core.params import abstract_init
    from ..models.fusion.model import init_fusion
    with abstract_init():
        want = init_fusion(0, cfg, jnp.bfloat16)
    got = dict(_tree_paths(got_fusion))
    exp = dict(_tree_paths(want))
    missing = sorted(set(exp) - set(got))
    unexpected = sorted(set(got) - set(exp))
    mismatched = sorted(
        p for p in set(got) & set(exp)
        if tuple(got[p].shape) != tuple(exp[p].shape))
    return {"keys": len(exp), "missing": missing[:20],
            "n_missing": len(missing), "unexpected": unexpected[:20],
            "n_unexpected": len(unexpected),
            "shape_mismatch": mismatched[:20],
            "n_shape_mismatch": len(mismatched),
            "ok": not (missing or unexpected or mismatched)}


def _finiteness(trees):
    """Device-side NaN/Inf scan of every leaf. Counts are accumulated as
    device scalars and fetched in ONE bulk transfer (a per-leaf int()
    would pay hundreds of sequential round trips on the tunneled TPU);
    per-leaf attribution is recomputed only when something is nonfinite."""
    import jax
    import numpy as np
    import jax.numpy as jnp
    check = jax.jit(lambda x: (~jnp.isfinite(x.astype(jnp.float32))).sum())

    def scannable(leaf):
        return (hasattr(leaf, "dtype") and leaf.dtype != bool
                and "int" not in str(leaf.dtype))

    names, counts = [], []
    for name, tree in trees.items():
        for path, leaf in _tree_paths(tree):
            if scannable(leaf):
                names.append(f"{name}/{path}")
                counts.append(check(leaf))
    fetched = [int(c) for c in np.asarray(jax.device_get(counts),
                                          np.int64)] if counts else []
    bad = {n: c for n, c in zip(names, fetched) if c}
    return {"leaves": sum(1 for _, t in trees.items()
                          for _ in _tree_paths(t)),
            "scanned": len(names), "nonfinite": bad, "ok": not bad}


def _head_sanity(pred):
    import numpy as np
    checks = {}
    ok = True
    for k, v in pred.items():
        a = np.asarray(v, np.float32)
        c = {"shape": list(a.shape), "finite": bool(np.isfinite(a).all())}
        if k == "depth":
            c["positive"] = bool((a > 0).all())       # exp activation
        if k.endswith("_conf"):
            c["ge_one"] = bool((a >= 1.0 - 1e-3).all())   # expp1
        checks[k] = c
        ok = ok and all(v for kk, v in c.items() if kk != "shape")
    return {"heads": checks, "ok": ok}


def run(args) -> dict:
    import numpy as np
    import jax.numpy as jnp

    report = {"variant": args.variant, "phases": [], "argv": vars(args)}

    def phase(name, fn):
        t0 = time.perf_counter()
        try:
            detail = fn()
            ok = bool(detail.pop("ok", True)) if isinstance(detail, dict) \
                else True
        except Exception as e:
            detail, ok = {"error": f"{type(e).__name__}: {e}"[:500]}, False
        rec = {"name": name, "ok": ok,
               "wall_s": round(time.perf_counter() - t0, 1),
               "detail": detail}
        report["phases"].append(rec)
        print(f"[verify] {name}: {'OK' if ok else 'FAIL'} "
              f"({rec['wall_s']}s)", flush=True)
        return ok, detail if isinstance(detail, dict) else {}

    # -- argument validation (fail as a usage error, not a deep-loader
    # traceback attributed to the weights) --------------------------------
    from ..convert.orbax_io import is_bundle, load_bundle_configs
    raw_layout = not is_bundle(args.wan_ckpt_path)
    if raw_layout and args.variant == "wan21" and not args.model_ckpt:
        sys.exit("verify_weights: --model_ckpt is required for a raw wan21 "
                 "checkpoint layout (pass the fusion model.pth)")
    if raw_layout and args.variant == "wan22" and not (
            args.model_ckpt_high and args.model_ckpt_low):
        sys.exit("verify_weights: --model_ckpt_high and --model_ckpt_low "
                 "are required for a raw wan22 checkpoint layout")
    if args.config_from and not is_bundle(args.config_from):
        sys.exit(f"verify_weights: --config_from {args.config_from!r} is "
                 f"not an Orbax bundle directory (expected one written by "
                 f"cli/convert.py); refusing to silently fall back to the "
                 f"production 14B config")
    if args.variant == "wan21":
        from ..models.fusion.model import FusionConfig
        cfg = FusionConfig()
    else:
        from .infer_wan22 import wan22_fusion_config
        cfg = wan22_fusion_config()
    cfg_src = args.config_from or (
        args.wan_ckpt_path if is_bundle(args.wan_ckpt_path) else None)
    if cfg_src and is_bundle(cfg_src):
        cfgs = load_bundle_configs(cfg_src)
        cfg = cfgs.get("fusion", cfgs.get("fusion_high", cfg))
    report["config"] = repr(cfg)[:300]

    # -- load ----------------------------------------------------------------
    state = {}

    def do_load():
        if args.variant == "wan21":
            from .infer_wan21 import load_fusion_params
            params = load_fusion_params(args.wan_ckpt_path, args.model_ckpt,
                                        cfg, jnp.bfloat16)
            state["trees"] = params
            state["fusions"] = {"fusion": params["fusion"]}
        else:
            from ..convert.orbax_io import load_bundle, cast_tree
            if is_bundle(args.wan_ckpt_path):
                bundle = load_bundle(args.wan_ckpt_path,
                                     ("fusion_high", "fusion_low"))
                trees = {k: cast_tree(v, jnp.bfloat16)
                         for k, v in bundle.items()}
            else:
                from .infer_wan22 import load_expert
                lora_dir = os.path.join(args.wan_ckpt_path, "PAI",
                                        "Wan2.2-Fun-Reward-LoRAs")
                trees = {}
                for side, ckpt in (("high", args.model_ckpt_high),
                                   ("low", args.model_ckpt_low)):
                    trees[f"fusion_{side}"] = load_expert(
                        args.wan_ckpt_path,
                        f"{side}_noise_model/"
                        f"diffusion_pytorch_model*.safetensors",
                        os.path.join(
                            lora_dir, f"Wan2.2-Fun-A14B-InP-{side}-noise-"
                                      f"HPS2.1.safetensors"),
                        ckpt, cfg, jnp.bfloat16)
            state["trees"] = trees
            state["fusions"] = trees
        import jax
        return {"components": sorted(state["trees"]),
                "leaves": sum(1 for _ in _tree_paths(state["trees"])),
                "gbytes": round(sum(
                    x.size * x.dtype.itemsize for x in
                    jax.tree_util.tree_leaves(state["trees"])) / 1e9, 2)}

    ok, _ = phase("load", do_load)
    if not ok:
        return report

    for name, tree in state["fusions"].items():
        phase(f"census:{name}", lambda t=tree: _census(t, cfg))
    phase("finite", lambda: _finiteness(state["trees"]))

    if args.out_bundle:
        def do_bundle():
            import jax
            from ..convert.orbax_io import save_bundle, load_bundle
            path = save_bundle(state["trees"], args.out_bundle,
                               configs={"fusion": cfg})
            back = load_bundle(path, tuple(sorted(state["trees"])))
            leaves_a = jax.tree_util.tree_leaves(state["trees"])
            leaves_b = jax.tree_util.tree_leaves(back)
            same = all(np.array_equal(np.asarray(a), np.asarray(b))
                       for a, b in zip(leaves_a, leaves_b))
            return {"path": str(path), "bit_exact_reload": same, "ok": same}
        phase("bundle", do_bundle)

    # -- denoise + heads -----------------------------------------------------
    g_h = args.height or (336 if args.variant == "wan21" else 480)
    g_w = args.width or (592 if args.variant == "wan21" else 832)
    f_lat = (args.frames - 1) // 4 + 1
    rng = np.random.default_rng(0)

    def bf16(*shape, scale=1.0):
        return jnp.asarray(rng.standard_normal(shape) * scale, jnp.bfloat16)

    state["pred"] = None

    def do_denoise():
        d = cfg.dit
        h2, w2 = g_h // 8, g_w // 8
        y_ch = d.in_dim - d.out_dim
        ctx_pos = bf16(1, 20, d.text_dim)
        ctx_neg = bf16(1, 20, d.text_dim, scale=0.3)
        y = bf16(1, y_ch, f_lat, h2, w2)
        if args.variant == "wan21":
            from ..pipelines.wan_video import FantasyWorldPipeline
            pipe = FantasyWorldPipeline(cfg=cfg, params=state["trees"])
            if args.quant:
                pipe.quantize(args.quant)
            lat, pred = pipe.denoise(
                ctx_pos, ctx_neg,
                bf16(1, 257, d.clip_feature_dim) if d.has_image_input
                else None,
                y, height=g_h, width=g_w, num_frames=args.frames,
                num_inference_steps=args.steps, cfg_scale=5.0, seed=1,
                plucker_fea=bf16(1, f_lat * (h2 // 2) * (w2 // 2),
                                 d.plucker_dim, scale=0.5))
        else:
            from ..pipelines.wan_video_22 import DualModelDenoiser
            den = DualModelDenoiser(cfg=cfg,
                                    params_high=state["fusions"]
                                    ["fusion_high"],
                                    params_low=state["fusions"]
                                    ["fusion_low"])
            if args.quant:
                den.quantize(args.quant)
            lat, pred = den.denoise(
                ctx_pos, ctx_neg, y, g_h, g_w, num_frames=args.frames,
                num_inference_steps=args.steps, cfg_scale=5.0, seed=1,
                control_camera_latents=bf16(1, 24, f_lat, g_h, g_w,
                                            scale=0.5))
        state["pred"] = pred
        lat_np = np.asarray(lat, np.float32)
        return {"latent_shape": list(lat_np.shape),
                "latent_finite": bool(np.isfinite(lat_np).all()),
                "steps": args.steps, "quant": args.quant,
                "ok": bool(np.isfinite(lat_np).all())
                and pred is not None}

    ok, _ = phase("denoise", do_denoise)
    if ok and state["pred"] is not None:
        phase("heads", lambda: _head_sanity(state["pred"]))
    return report


def main(argv=None):
    args = parse_args(argv)
    report = run(args)
    report["ok"] = all(p["ok"] for p in report["phases"])
    with open(args.report, "w") as fh:
        json.dump(report, fh, indent=1)
    print(f"[verify] report written to {args.report}; "
          f"{'ALL OK' if report['ok'] else 'FAILURES PRESENT'}")
    if not report["ok"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
