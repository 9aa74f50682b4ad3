"""Serve FantasyWorld generation over HTTP with batched denoising.

Deployment surface around the reference's one-shot CLI capability
(inference_wan21.py): a device-owning worker drains same-shape jobs from
an HTTP queue and denoises them as ONE CFG-batched program
(sampler.generate_videos, CFG batch of 2B rows over the mesh 'data' axis),
then exports MP4 + PLY per job.

    python -m fantasy_world_tpu.cli.serve \
        --ckpt_dir ./models/Wan2.1-I2V-14B-480P --model_ckpt model.pth \
        --port 8000 --max_batch 4

    curl -X POST localhost:8000/v1/generate -d '{
        "prompt": "a boat sails past a lighthouse",
        "image_path": "examples/images/input_image.png",
        "camera_json": "examples/cameras/camera_data.json", "seed": 7}'
    curl localhost:8000/v1/jobs/<job_id>
"""
from __future__ import annotations

import argparse
import json
import os

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="fantasy-world-tpu server")
    p.add_argument("--ckpt_dir", type=str, required=True)
    p.add_argument("--variant", choices=["wan21", "wan22"], default="wan21",
                   help="wan21 = single fusion model (CFG-batched multi-job "
                        "denoise); wan22 = dual-expert Fun-Control-Camera "
                        "(jobs run one at a time)")
    p.add_argument("--model_ckpt", type=str, default=None,
                   help="fusion model.pth (wan21; unused for bundles)")
    p.add_argument("--model_ckpt_high", type=str, default=None)
    p.add_argument("--model_ckpt_low", type=str, default=None,
                   help="wan22 expert fusion checkpoints (unused for "
                        "bundles)")
    p.add_argument("--timestep_boundary", type=float, default=900.0)
    p.add_argument("--moge_ckpt", type=str, default=None)
    p.add_argument("--tokenizer_path", type=str, default=None)
    p.add_argument("--auto_download", action="store_true")
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--max_batch", type=int, default=4)
    p.add_argument("--linger_s", type=float, default=2.0,
                   help="wait this long after the first queued job for "
                        "same-shape jobs to fill the batch")
    p.add_argument("--output_root", type=str, default="serve_outputs")
    p.add_argument("--mesh_data", type=int, default=1)
    p.add_argument("--mesh_seq", type=int, default=1)
    p.add_argument("--mesh_model", type=int, default=1)
    p.add_argument("--ulysses", action="store_true")
    p.add_argument("--segment_size", type=int, default=None,
                   help="run each batch's denoise scan in host segments of "
                        "this many steps; jobs then report live progress "
                        "via GET /v1/jobs/<id>")
    p.add_argument("--quant", type=str, default=None, choices=["int8", "fp8"],
                   help="quantize the denoiser hot path before serving "
                        "(int8 w8a8 MXU fast path / fp8 storage, "
                        "core/quant.py)")
    p.add_argument("--auth_token", type=str, default=None,
                   help="require 'Authorization: Bearer <token>' on the "
                        "generate/jobs endpoints")
    p.add_argument("--io_root", type=str, default=None,
                   help="restrict request file paths (image_path, "
                        "camera_json, output_dir) to this directory -- "
                        "requests carry raw filesystem paths, so set this "
                        "(plus --auth_token) for any non-loopback --host")
    return p.parse_args(argv)


def make_validate_fn(args):
    """Per-job POST-time validation: reject malformed jobs with a 400
    instead of letting them error their whole batch at run time, and
    enforce the --io_root path sandbox."""

    def _inside(path):
        if args.io_root is None:
            return True
        root = os.path.realpath(args.io_root)
        rp = os.path.realpath(path)
        return rp == root or rp.startswith(root + os.sep)

    def validate(req):
        img = req.get("image_path")
        if not isinstance(img, str) or not img:
            return "'image_path' is required"
        if not _inside(img):
            return "image_path outside --io_root"
        if not os.path.isfile(img):
            return f"image_path not found: {img}"
        cam = req.get("camera_json")
        if cam is not None:
            if not isinstance(cam, str) or not _inside(cam):
                return "camera_json outside --io_root"
            if not os.path.isfile(cam):
                return f"camera_json not found: {cam}"
        out_dir = req.get("output_dir")
        if out_dir is not None:
            if not isinstance(out_dir, str):
                return "'output_dir' must be a string"
            if not _inside(out_dir):
                return "output_dir outside --io_root"
        seed = req.get("seed")
        if seed is not None and not isinstance(seed, int):
            return "'seed' must be an integer"
        for k in ("height", "width", "num_frames", "sample_steps"):
            v = req.get(k)
            if v is not None and (not isinstance(v, int) or v <= 0):
                return f"'{k}' must be a positive integer"
        return None

    return validate


def make_batch_fn(sampler, args, mesh=None):
    """jobs -> result dicts via one generate_videos call + per-job export."""
    from ..hostops.camera import cameras_json_to_camera_list
    from ..serving.server import DEFAULTS

    def batch_fn(jobs):
        reqs = [{**DEFAULTS, **j.request} for j in jobs]
        r0 = reqs[0]
        camera_params = None
        if any(r.get("camera_json") for r in reqs):
            camera_params = []
            for r in reqs:
                if not r.get("camera_json"):
                    raise ValueError("mixed camera/no-camera batch")
                with open(r["camera_json"]) as f:
                    camera_params.append(cameras_json_to_camera_list(
                        json.load(f),
                        image_size=(r["height"], r["width"])))
        progress = None
        if args.segment_size:
            def progress(done, total):
                for j in jobs:
                    j.progress = {"done": done, "total": total}
        results = sampler.generate_videos(
            prompts=[r["prompt"] for r in reqs],
            image_paths=[r["image_path"] for r in reqs],
            camera_params=camera_params,
            neg_prompt=r0["neg_prompt"],
            using_scale=all(r["using_scale"] for r in reqs),
            seeds=[r["seed"] if r["seed"] is not None else 1024
                   for r in reqs],
            height=r0["height"], width=r0["width"],
            num_frames=r0["num_frames"], sample_steps=r0["sample_steps"],
            cfg_scale=r0["cfg_scale"], mesh=mesh, ulysses=args.ulysses,
            segment_size=args.segment_size, progress_callback=progress,
            tea_cache_l1_thresh=r0["tea_cache_l1_thresh"])
        out = []
        for job, req, (video, pred) in zip(jobs, reqs, results):
            out_dir = req.get("output_dir") or os.path.join(args.output_root,
                                                            job.id)
            sampler.export(video, pred, out_dir,
                           conf_threshold=req.get("conf_threshold", 1.0),
                           stride=req.get("stride", 4))
            out.append({"output_dir": os.path.abspath(out_dir),
                        "video": "video.mp4",
                        "frames": int(np.asarray(video).shape[0])})
        return out

    return batch_fn


def make_batch_fn22(sampler, args, mesh=None):
    """wan22 dual-expert jobs: denoised one at a time (the dual denoiser
    is single-clip), still queued/batched and exported per job."""
    from ..hostops.camera import cameras_json_to_camera_list
    from ..serving.server import DEFAULTS

    def batch_fn(jobs):
        out = []
        for job in jobs:
            req = {**DEFAULTS, **job.request}
            cams = None
            if req.get("camera_json"):
                with open(req["camera_json"]) as f:
                    cams = cameras_json_to_camera_list(
                        json.load(f),
                        image_size=(req["height"], req["width"]))
            progress = None
            if args.segment_size:
                def progress(done, total, job=job):
                    job.progress = {"done": done, "total": total}
            video, pred = sampler.generate_video(
                prompt=req["prompt"], neg_prompt=req["neg_prompt"],
                image_path=req["image_path"], camera_params=cams,
                using_scale=req["using_scale"],
                seed=req["seed"] if req["seed"] is not None else 42,
                height=req["height"], width=req["width"],
                num_frames=req["num_frames"],
                sample_steps=req["sample_steps"],
                cfg_scale=req["cfg_scale"],
                tea_cache_l1_thresh=req["tea_cache_l1_thresh"],
                mesh=mesh, ulysses=args.ulysses,
                segment_size=args.segment_size,
                progress_callback=progress)
            out_dir = req.get("output_dir") or os.path.join(args.output_root,
                                                            job.id)
            sampler.export(video, pred, out_dir,
                           conf_threshold=req.get("conf_threshold", 1.5),
                           stride=req.get("stride", 4))
            out.append({"output_dir": os.path.abspath(out_dir),
                        "video": "video.mp4",
                        "frames": int(np.asarray(video).shape[0])})
        return out

    return batch_fn


def main(argv=None) -> None:
    args = parse_args(argv)
    from ..serving.server import GenerationServer

    mesh = None
    if args.mesh_data * args.mesh_seq * args.mesh_model > 1:
        from ..parallel.sharding import make_mesh
        mesh = make_mesh(data=args.mesh_data, seq=args.mesh_seq,
                         model=args.mesh_model)

    from ..convert.orbax_io import is_bundle
    if not is_bundle(args.ckpt_dir):
        need = (("--model_ckpt_high", args.model_ckpt_high),
                ("--model_ckpt_low", args.model_ckpt_low)) \
            if args.variant == "wan22" else (("--model_ckpt",
                                              args.model_ckpt),)
        for flag, val in need:
            if val is None:
                raise SystemExit(f"{flag} is required unless --ckpt_dir "
                                 f"is a pre-converted bundle")
    if args.variant == "wan22":
        from ..sampler import Wan22Sampler
        sampler = Wan22Sampler(args.ckpt_dir, args.model_ckpt_high,
                               args.model_ckpt_low,
                               moge_ckpt=args.moge_ckpt,
                               tokenizer_path=args.tokenizer_path,
                               auto_download=args.auto_download,
                               timestep_boundary=args.timestep_boundary)
        if args.quant:
            sampler.denoiser.quantize(args.quant)
        if mesh is not None:
            sampler.denoiser.shard(mesh)
        batch_fn = make_batch_fn22(sampler, args, mesh)
    else:
        from ..sampler import FantasyWorldSampler
        sampler = FantasyWorldSampler(args.ckpt_dir, args.model_ckpt,
                                      moge_ckpt=args.moge_ckpt,
                                      tokenizer_path=args.tokenizer_path,
                                      auto_download=args.auto_download)
        if args.quant:
            sampler.pipe.quantize(args.quant)
        if mesh is not None:
            sampler.pipe.shard(mesh)
        batch_fn = make_batch_fn(sampler, args, mesh)
    if args.host not in ("127.0.0.1", "localhost", "::1") \
            and not (args.auth_token and args.io_root):
        print("WARNING: non-loopback --host without --auth_token/--io_root: "
              "requests carry raw filesystem paths", flush=True)
    server = GenerationServer(batch_fn,
                              host=args.host, port=args.port,
                              max_batch=args.max_batch,
                              linger_s=args.linger_s,
                              validate_fn=make_validate_fn(args),
                              auth_token=args.auth_token)
    print(f"serving on http://{args.host}:{server.port}  "
          f"(max_batch={args.max_batch}, linger={args.linger_s}s)",
          flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()


if __name__ == "__main__":
    main()
