"""Training CLI smoke test: sharded synthetic run + Orbax save/resume.

The reference ships no trainer (only the single-process loss utilities,
diffsynth_wan22/pipelines/wan_video_new.py:586-719); this exercises the
full loop the repo adds around them -- mesh build, param sharding, jitted
donated train step, checkpoint save, and resume -- on the virtual 8-device
CPU mesh from conftest.
"""
import numpy as np
import pytest

# Each trainer invocation executes jitted train steps on the 8-thread
# virtual mesh time-sharing this host's single core: minutes per step of
# pure execution even with a warm compile cache. Heavyweight tier only.
pytestmark = pytest.mark.slow


def _args(ckpt_dir, steps):
    return ["--synthetic", "--steps", str(steps),
            "--mesh_data", "2", "--mesh_model", "2",
            "--demo_dim", "64", "--demo_layers", "2",
            "--demo_start_index", "1",
            "--warmup", "1", "--lr", "1e-4",
            "--save_every", "100", "--log_every", "1",
            "--checkpoint_dir", str(ckpt_dir)]


def test_train_cli_synthetic_and_resume(tmp_path, capsys):
    from fantasy_world_tpu.cli.train import main

    ckpt_dir = tmp_path / "ckpt"
    main(_args(ckpt_dir, 2))
    out = capsys.readouterr().out
    assert "train done: 2 step(s)" in out
    assert (ckpt_dir / "step_00000002").exists()

    # resume picks up at step 2 and runs exactly one more step
    main(_args(ckpt_dir, 3))
    out = capsys.readouterr().out
    assert "train done: 1 step(s)" in out
    assert (ckpt_dir / "step_00000003").exists()

    # already-done checkpoint short-circuits
    main(_args(ckpt_dir, 3))
    out = capsys.readouterr().out
    assert "already at step 3" in out


def test_train_cli_lora_mode(capsys):
    # frozen-base LoRA fine-tuning (training/lora.py) through the same CLI
    from fantasy_world_tpu.cli.train import main

    main(["--synthetic", "--steps", "1",
          "--mesh_data", "2", "--mesh_model", "2",
          "--demo_dim", "64", "--demo_layers", "2",
          "--demo_start_index", "1",
          "--warmup", "1", "--lr", "1e-3", "--log_every", "1",
          "--lora_rank", "2"])
    out = capsys.readouterr().out
    assert "train done: 1 step(s)" in out


def test_train_cli_pipe_mode_and_resume(tmp_path, capsys):
    """--pipe_stages: the GPipe video-DiT trainer (training/pp.py) through
    the same CLI loop -- blocks stage-sharded over ('pipe','data'),
    checkpoint save + resume."""
    from fantasy_world_tpu.cli.train import main

    ckpt_dir = tmp_path / "ckpt_pp"
    args = ["--synthetic", "--steps", "2",
            "--pipe_stages", "2", "--pipe_microbatches", "2",
            "--mesh_data", "2",
            "--demo_dim", "64", "--demo_layers", "4",
            "--warmup", "1", "--lr", "1e-4",
            "--save_every", "100", "--log_every", "1",
            "--checkpoint_dir", str(ckpt_dir)]
    main(args)
    out = capsys.readouterr().out
    assert "train done: 2 step(s)" in out
    assert (ckpt_dir / "step_00000002").exists()

    # resume runs exactly one more step
    main(args[:2] + ["3"] + args[3:])
    out = capsys.readouterr().out
    assert "train done: 1 step(s)" in out
    assert (ckpt_dir / "step_00000003").exists()
