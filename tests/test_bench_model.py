"""Unit checks of bench.py's analytic models (no TPU needed)."""
import sys, os

import conftest  # noqa: F401

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import bench


def test_v5p8_comm_model_shape_and_magnitude():
    s, info = bench.v5p8_comm_model()
    # positive, and sane: the per-step collectives of a 16k-token 5120-wide
    # model over 180 GB/s axes must land in the 10ms-1s band
    assert 0.01 < s < 1.0, s
    for key in ("mesh", "tp_gbytes_per_chip_per_step",
                "sp_gbytes_per_chip_per_step", "ici_axis_bandwidth_gbs",
                "assumes"):
        assert key in info, key
    assert info["tp_gbytes_per_chip_per_step"] > 0
    assert info["sp_gbytes_per_chip_per_step"] > 0
    # the model is consistent with its own constituents
    total_gb = (info["tp_gbytes_per_chip_per_step"]
                + info["sp_gbytes_per_chip_per_step"])
    assert abs(s - total_gb / info["ici_axis_bandwidth_gbs"]) < 1e-3


def test_extrapolate_recovers_planted_per_layer_costs():
    # t = fixed + n_pcb*c_pcb + n_irg*c_irg must be recovered exactly from
    # three exact observations
    fixed, c_pcb, c_irg = 0.05, 0.1, 0.25
    pts = [(p, i, fixed + p * c_pcb + i * c_irg)
           for p, i in [(2, 2), (3, 3), (2, 4)]]
    full, fit, predict = bench.extrapolate(pts)
    assert fit == "per-layer-type"
    expect = fixed + bench.FULL_PCB * c_pcb + bench.FULL_IRG * c_irg
    assert abs(full - expect) < 1e-9
    assert abs(predict(3, 2) - (fixed + 3 * c_pcb + 2 * c_irg)) < 1e-9


def test_comm_model_tp_term_matches_param_rules():
    """The TP byte count must reflect what parallel/sharding.py actually
    shards: row-parallel output projections exist ONLY on the DiT half
    (self-attn o, cross-attn o, ffn fc2); VGGT ('attn'/'mlp' keys) and
    bicross ('*_proj' keys) replicate and must contribute nothing."""
    from fantasy_world_tpu.parallel.sharding import spec_for_path

    # row-parallel (P('model', None)) paths that trigger an output
    # all-reduce -- these ARE sharded:
    for p in ["dit/blocks/0/self_attn/o/kernel",
              "dit/blocks/0/cross_attn/o/kernel",
              "dit/blocks/0/ffn/fc2/kernel"]:
        assert spec_for_path(p) == __import__("jax").sharding.PartitionSpec(
            "model", None), p
    # VGGT and bicross params replicate -> no TP all-reduce may be counted
    for p in ["fusion/irg/0/vggt/attn/qkv/kernel",
              "fusion/irg/0/vggt/mlp/fc1/kernel",
              "fusion/irg/0/bicross/m1_proj/kernel",
              "fusion/irg/0/bicross/out_m2_proj/kernel"]:
        assert spec_for_path(p) == __import__("jax").sharding.PartitionSpec(), p

    # and the model's TP bytes equal exactly the DiT-only closed form
    _, info = bench.v5p8_comm_model()
    l_dit = bench.L_DIT // 2
    n_dit = bench.FULL_PCB + bench.FULL_IRG
    expect_tp = n_dit * 3 * (2 * (2 - 1) / 2) * (l_dit * 5120 * 2)
    assert abs(info["tp_gbytes_per_chip_per_step"] - expect_tp / 1e9) < 5e-3


def test_comm_model_sp_term_matches_dispatch_set():
    """The ulysses byte count must cover exactly the attentions that clear
    the min_lq=2048 dispatch gate at production shapes -- including the
    SECOND cross-attention call of the deploy has_image_input config
    (image branch re-attends the full query against 257 CLIP tokens) --
    and exclude the 782-token per-frame VGGT attention."""
    _, info = bench.v5p8_comm_model()
    D, A, BD = 5120, 1024, 1152
    n_dit = bench.FULL_PCB + bench.FULL_IRG
    n_irg = bench.FULL_IRG
    l_dit, l_agg = bench.L_DIT // 2, bench.L_AGG // 2
    a2a = lambda size: (2 - 1) / 2 * size * 2      # noqa: E731 (bf16 bytes)
    expect = n_dit * 4 * a2a(l_dit * D)
    expect += n_dit * 2 * (a2a(l_dit * D) + a2a(512 / 2 * D))
    expect += n_dit * 2 * (a2a(l_dit * D) + a2a(257 / 2 * D))
    expect += n_irg * 4 * a2a(l_agg * A)
    expect += n_irg * 4 * (a2a(l_dit * BD) + a2a(l_agg * BD))
    assert abs(info["sp_gbytes_per_chip_per_step"] - expect / 1e9) < 5e-3


def test_wan22_geometry_and_comm_model():
    """r4 wan22 family pins: token counts derive from the 480x832 latent
    grid (inference_wan22.py:459-468), the comm model scales with them and
    drops the CLIP image-branch a2a (no clip tokens), and the analytic
    FLOPs grow superlinearly (attention is quadratic in tokens)."""
    ld, lp, la = bench.geom_tokens("wan22")
    assert (ld, lp, la) == (32760, 1565, 32865)
    ld1, lp1, la1 = bench.geom_tokens("wan21")
    assert (ld1, lp1, la1) == (16317, 782, 16422)

    s21, i21 = bench.v5p8_comm_model("wan21")
    s22, i22 = bench.v5p8_comm_model("wan22")
    assert i22["variant"] == "wan22"
    # tokens double -> per-step bytes roughly double, minus the missing
    # image-branch a2a; bounded both sides so neither term silently drifts
    assert 1.6 < s22 / s21 < 2.0, (s21, s22)

    f21 = bench.analytic_flops(40, 16, "wan21")
    f22 = bench.analytic_flops(40, 16, "wan22")
    # 2x tokens: dense terms 2x, attention terms 4x -> strictly between
    assert 2.0 < f22 / f21 < 4.0, (f21, f22)


def test_wan22_step_args_shapes():
    """The wan22 step consumes PRE-computed control tokens (the
    step-invariant SimpleAdapter is hoisted out of the denoise loop --
    dit.control_adapter_tokens; its one-time cost is benched separately as
    ctrl_adapter_s, which itself consumes pixel-res latents)."""
    args = bench.step_args(None, None, "wan22")
    params, scan, latents, t, ctx, y, ctok = args
    assert latents.shape == (2, 16, 21, 60, 104)
    assert ctx.shape == (2, 512, 4096)          # no CLIP tokens appended
    l_dit, _, _ = bench.geom_tokens("wan22")
    assert ctok.shape == (2, l_dit, 5120)       # token-space, hoisted
    a21 = bench.step_args(None, None, "wan21")
    assert a21[2].shape == (2, 16, 21, 42, 74)
    assert a21[5].shape == (2, 257, 1280)       # CLIP branch present


def test_emit_contract_one_stdout_line(monkeypatch, capsys):
    """The driver parses ONE JSON line from stdout. Checkpoint emissions
    (partial phases) must go to stderr only; the final emission and the
    SIGTERM flush are the only stdout writers."""
    monkeypatch.setattr(bench, "_LAST_RECORD", None)
    monkeypatch.setattr(bench, "_STDOUT_EMITTED", False)

    bench.emit(1.0, 1e12, True, {"p": 1})            # checkpoint
    out = capsys.readouterr()
    assert out.out == ""                              # nothing on stdout
    assert '"metric"' in out.err                      # forensics on stderr
    assert bench._LAST_RECORD is not None
    assert not bench._STDOUT_EMITTED

    bench.emit(2.0, 1e12, False, {"p": 2}, to_stdout=True)   # final
    out = capsys.readouterr()
    import json as _json
    lines = [l for l in out.out.splitlines() if l.strip()]
    assert len(lines) == 1
    rec = _json.loads(lines[0])
    assert rec["value"] == 2.0 and rec["partial"] is False
    assert bench._STDOUT_EMITTED


def test_sigterm_flush_emits_best_so_far(monkeypatch, capsys):
    """A driver-side `timeout` kill (SIGTERM) must still leave a parseable
    best-so-far line on stdout, marked partial + terminated_by_signal."""
    import json as _json
    monkeypatch.setattr(bench, "_LAST_RECORD", None)
    monkeypatch.setattr(bench, "_STDOUT_EMITTED", False)
    bench.emit(3.0, 1e12, True, {"p": 3})            # only a checkpoint ran
    capsys.readouterr()
    try:
        bench._flush_on_term(15, None)
    except SystemExit as e:
        assert e.code == 143
    else:
        raise AssertionError("handler must SystemExit")
    out = capsys.readouterr()
    rec = _json.loads(out.out.strip())
    assert rec["value"] == 3.0
    assert rec["partial"] is True
    assert rec["terminated_by_signal"] == 15
