"""The analytic v5p-8 comm model vs the PARTITIONED HLO (r4 VERDICT
next-#7): compile the real sharded+ulysses fusion forward on the virtual
2x2x2 mesh, count the collective bytes XLA actually emits, and assert they
match ``bench.comm_model_bytes`` evaluated at the same geometry.

Until r5 the comm model's FORMULA was pinned by tests
(test_bench_model.py::test_comm_model_*) but nothing checked it against a
real partitioned graph. Findings this encodes (see tools/comm_hlo.py and
COMM_HLO.json):
  * total modeled (tp+sp) matches total observed (model-axis all-reduce +
    seq-axis all-to-all) within ~8%;
  * XLA REWRITES the self-attn ulysses out-a2a into a per-head-shard dot
    + model-axis all-reduce (fusing it with the row-parallel o
    projection), so ~one a2a per self-attn shows up as AR instead --
    category totals shift but the sum holds;
  * GSPMD adds unmodeled all-gathers/permutes (re-replicating the
    column-parallel q/k/v around the head-resharding ulysses region,
    token-concat reshards) worth ~25-35% of the modeled bytes at this
    geometry -- the measured worst-case overhead the v5p-16 bracket
    carries (bench.py V5P16_COMM_OVERHEAD).
"""
import os
import sys

import pytest

import conftest  # noqa: F401  (forces cpu + 8 virtual devices)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


@pytest.fixture(scope="module")
def hlo_result():
    from comm_hlo import build_and_count, compare_to_model
    cfg, geom, ops, agg, text = build_and_count()
    return compare_to_model(geom, ops), ops


def test_total_collective_bytes_match_model(hlo_result):
    res, _ = hlo_result
    # the headline assertion: what the deploy sharding's collectives
    # actually move (AR over 'model' + a2a over 'seq') equals what the
    # analytic model bills for, within 10%
    assert 0.90 < res["ratio_total"] < 1.10, res


def test_a2a_bytes_match_sp_term(hlo_result):
    res, _ = hlo_result
    # every seq-axis all-to-all (shard_map's own + the k-concat-attributed
    # cross-attention ones) vs the ulysses sp term. Observed ~+3%: the
    # small excess is token-concat resharding a2as.
    assert 0.85 < res["ratio_a2a_vs_sp"] < 1.08, res


def test_ar_bytes_match_tp_term_with_hybrid_rewrite(hlo_result):
    res, _ = hlo_result
    # model-axis ARs vs the tp term. Observed ~+17%: XLA's hybrid rewrite
    # moves one out-a2a per self-attention into this category (bytes it
    # saves from a2a_seq); bounded so a real TP accounting bug (e.g. a
    # PARAM_RULES change silently replicating the o projections -> ratio
    # 0, or double-sharding -> ratio 2) still fails loudly.
    assert 0.90 < res["ratio_ar_vs_tp"] < 1.30, res


def test_unmodeled_resharding_is_bounded(hlo_result):
    res, _ = hlo_result
    # all-gathers/permutes the analytic model ignores: must stay a bounded
    # fraction so "no-overlap on the modeled set" remains a defensible
    # conservative story (and the measured fraction feeds the v5p-16
    # worst-case bracket)
    assert res["unmodeled_fraction_of_modeled"] < 0.5, res


def test_tp_all_reduces_exist_and_a2a_exist(hlo_result):
    res, ops = hlo_result
    kinds = {(o["kind"], o["axis"]) for o in ops}
    assert ("all-reduce", "model") in kinds     # megatron row-parallel ARs
    assert ("all-to-all", "seq") in kinds       # explicit ulysses path
    assert res["observed"]["ar_model"] > 0
    assert res["observed"]["a2a_seq"] > 0
