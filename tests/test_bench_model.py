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


def _full_points():
    """A points tree with EVERY optional phase populated -- the r4 failure
    mode was the real tree outgrowing the driver's 2,000-char stdout tail
    capture, so the cap test must exercise the worst case (r4's actual
    snapshot keys plus the r5 additions)."""
    comm = {"comm_seconds_per_step": 0.1454, "mesh": "data=2(cfg) seq=2 model=2",
            "variant": "wan21", "tp_gbytes_per_chip_per_step": 10.025,
            "sp_gbytes_per_chip_per_step": 16.141,
            "ici_axis_bandwidth_gbs": 180.0,
            "assumes": "v5p 9e10 B/s/link/dir, 2 links per submesh axis, "
                       "no compute/comm overlap (conservative)"}
    tea = {"hit_step_s": 0.0044,
           "clip_seconds_at_skip_rate": {"0.2": 433.7, "0.4": 326.8,
                                         "0.6": 219.9},
           "note": "hit = prologue + cached-residual add + head "
                   "(depth-independent, measured on-chip); rate requires "
                   "real weights"}

    def depth(blocks, pcb, prec):
        return {"blocks": blocks, "pcb": pcb, "irg": blocks - pcb,
                "precision": prec, "measured_s": 3.333, "predicted_s": 3.341,
                "residual_pct": 0.25}

    pts = {
        "shallow_s": 1.0159, "deep_s": 1.5482, "irgheavy_s": 1.6473,
        "holdout_s": 1.2237, "deep_holdout_bf16": depth(10, 5, "bf16"),
        "fit": "per-layer-type", "fit_residual_pct": 0.57,
        "vae_decode_s": 4.822,
        "vae_decode_min_med_max": [4.821, 4.822, 4.912],
        "heads_s": 0.972, "heads_min_med_max": [0.971, 0.972, 1.011],
        "projected_clip_seconds": 540.7, "v5p8_comm_model": comm,
        "projected_clip_seconds_v5p8_equiv": 36.3,
        "int8_shallow_s": 0.8229, "int8_deep_s": 1.2613,
        "int8_irgheavy_s": 1.3593, "int8_full_s": 8.7785,
        "int8_fit": "per-layer-type", "int8_speedup": 1.219,
        "deep_holdout": depth(12, 6, "int8"),
        "deep_holdout_16": depth(16, 8, "int8"),
        "tea_cache_hit_step_s": 0.0044, "tea_cache": tea,
        "int8_full40": {"blocks": 40, "precision": "int8", "oom": True,
                        "int8_weights_gb": 19.36,
                        "hbm_note": "weights alone exceed the v5e's 16 GB; "
                                    "measured alloc failure in "
                                    "int8_hbm_ladder",
                        "measured_wall_blocks": 32,
                        "wall_error": "RESOURCE_EXHAUSTED: " + "x" * 130,
                        "deepest_measured_blocks": 28, "measured_s": 6.1,
                        "predicted_s": 6.05, "residual_pct": 0.83},
        "int8_hbm_ladder": [
            {"blocks": b, "pcb": p, "int8_weights_gb": g,
             "bf16_weights_gb": 2 * g, "attempted": True,
             "result": "RESOURCE_EXHAUSTED at weight alloc: ..." * 3}
            for b, p, g in ((40, 16, 19.36), (36, 15, 17.58),
                            (32, 13, 15.84), (28, 11, 14.09),
                            (24, 10, 12.32))],
        "composed_clip": {"blocks": 12, "precision": "int8",
                          "composed_s": 172.3, "sum_of_parts_s": 171.2,
                          "delta_pct": 0.6, "vae_tiles": "(16,26)/(8,13)",
                          "note": "16-block tower + VAE + heads co-resident "
                                  "OOM the 16 GB v5e (measured); 12-block "
                                  "leaves ~4 GB"},
        "composed_clip_detail": {"step_s": 3.31, "steps_wall_s": 165.5,
                                 "vae_s": 4.8, "heads_s": 0.97,
                                 "heads_warm_s": 61.0},
    }
    w22 = dict(pts)
    w22.pop("int8_full40"), w22.pop("composed_clip")
    w22.update({
        "metric": "sec_per_denoise_step_wan22_480x832_14b_extrapolated",
        "value": 29.9806,
        "note": "dual 14B experts are phase-switched; exactly one is hot "
                "per step, so step cost == single-expert cost",
        "w22_shallow_s": 2.1, "w22_deep_s": 2.9, "w22_irgheavy_s": 3.0,
        "w22_deep6_s": 3.6, "w22_holdout_s": 2.5, "w22_holdout_up_s": 3.4,
        "fit_residual_up_pct": 0.2, "ctrl_adapter_s": 0.87,
        "ctrl_adapter_min_med_max": [0.86, 0.87, 0.9],
        "deep_holdout_int8": depth(8, 4, "int8"),
        "flops_floor_seconds_v5p8_mfu1": 57.2,
        "projected_clip_seconds_v5p16_equiv": 53.3,
        "v5p8_comm_model": dict(comm, variant="wan22"),
        "v5p16_bracket": {"best_s": 50.8, "nominal_s": 53.3,
                          "worst_s": 57.9, "comm_overhead_factor": 1.37,
                          "note": "best=full compute/comm overlap; "
                                  "nominal=no-overlap analytic model; "
                                  "worst=no-overlap x measured HLO byte "
                                  "factor (COMM_HLO.json)"},
        "deploy_options_v5p16": {"int8_s": 47.1, "tea0.2_s": 45.2,
                                 "int8_tea0.2_s": 40.3,
                                 "note": "v5p-16 clip under measured "
                                         "serving options; tea rate 0.2 "
                                         "is the conservative end of the "
                                         "TeaCache operating range"},
        "int8_full_s": 25.9326,
    })
    pts["wan22"] = w22
    return pts


def test_compact_line_stays_under_cap(monkeypatch, capsys, tmp_path):
    """r4's of-record BENCH artifact came back parsed:null because the one
    stdout line (3,615 chars) outgrew the driver's 2,000-char tail capture.
    The compact emission must stay under COMPACT_CAP with EVERY optional
    phase populated, parse as JSON, and carry both variants' headline
    values; the full tree must land in BENCH_DETAILS.json."""
    import json as _json
    monkeypatch.setattr(bench, "_LAST_RECORD", None)
    monkeypatch.setattr(bench, "_STDOUT_EMITTED", False)
    monkeypatch.setattr(bench, "DETAILS_PATH", str(tmp_path / "details.json"))

    bench.emit(10.71, bench.analytic_flops(40, 16), False, _full_points(),
               to_stdout=True)
    out = capsys.readouterr()
    lines = [l for l in out.out.splitlines() if l.strip()]
    assert len(lines) == 1
    assert len(lines[0]) <= bench.COMPACT_CAP, len(lines[0])
    rec = _json.loads(lines[0])
    assert rec["value"] == 10.71
    assert "truncated" not in rec           # nothing was dropped to fit
    # both variants' deploy headline numbers survive compaction
    assert rec["wan21"]["clip_s"] == 540.7
    assert rec["wan21"]["v5p8_s"] == 36.3
    assert rec["wan21"]["int8_step_s"] == 8.7785
    assert rec["wan22"]["step_s"] == 29.9806
    assert rec["wan22"]["v5p16_s"] == 53.3
    assert rec["wan22"]["floor_v5p8_mfu1_s"] == 57.2
    assert rec["wan22"]["v5p16_range_s"] == [50.8, 57.9]
    assert rec["wan22"]["v5p16_options_s"]["int8_tea0.2"] == 40.3
    assert rec["int8_full40"]["oom"] is True
    assert rec["int8_full40"]["deepest_measured_blocks"] == 28
    assert rec["composed_clip"]["delta_pct"] == 0.6
    # deepest validated depth is summarized, not the whole forensics dict
    # (int8_full40 is excluded from the scan -- it reports an OOM at 40,
    # not a measurement; its deepest_measured_blocks carries the depth)
    assert rec["wan21"]["deepest_depth_check"]["blocks"] == 16
    # the full tree is preserved in the details artifact
    details = _json.loads((tmp_path / "details.json").read_text())
    assert details["points"]["wan22"]["w22_deep6_s"] == 3.6
    assert details["points"]["v5p8_comm_model"]["tp_gbytes_per_chip_per_step"] \
        == 10.025


def test_compact_drops_sections_rather_than_overflow(monkeypatch):
    """If a future field pushes the line over the cap anyway, sections are
    dropped (marked truncated) instead of overflowing the driver tail."""
    pts = _full_points()
    pts["int8_full40"]["huge_note"] = "x" * 3000
    rec = {"metric": "m", "value": 1.0, "unit": "s", "vs_baseline": 1.0,
           "sane": True, "partial": False, "points": pts}
    line = bench.make_compact(rec)
    import json as _json
    parsed = _json.loads(line)
    assert len(line) <= bench.COMPACT_CAP
    assert parsed["truncated"] is True
    assert parsed["value"] == 1.0


def test_emit_contract_one_stdout_line(monkeypatch, capsys, tmp_path):
    """The driver parses ONE JSON line from stdout. Checkpoint emissions
    (partial phases) must go to stderr only; the final emission and the
    SIGTERM flush are the only stdout writers."""
    monkeypatch.setattr(bench, "_LAST_RECORD", None)
    monkeypatch.setattr(bench, "_STDOUT_EMITTED", False)
    monkeypatch.setattr(bench, "DETAILS_PATH", str(tmp_path / "details.json"))

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


def test_sigterm_flush_emits_best_so_far(monkeypatch, capsys, tmp_path):
    """A driver-side `timeout` kill (SIGTERM) must still leave a parseable
    best-so-far line on stdout, marked partial + terminated_by_signal."""
    import json as _json
    monkeypatch.setattr(bench, "_LAST_RECORD", None)
    monkeypatch.setattr(bench, "_STDOUT_EMITTED", False)
    monkeypatch.setattr(bench, "DETAILS_PATH", str(tmp_path / "details.json"))
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
