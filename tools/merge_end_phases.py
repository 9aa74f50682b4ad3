"""Merge the child-process composed-clip + HBM-ladder results into the
r5 bench artifacts (BENCH_DETAILS.json + BENCH_SNAPSHOT_r5.json).

The of-record safe phases were captured by a full bench run; the OOM-prone
end phases run in fresh child processes (bench.py --composed /
--ladder-depth, see bench.run_subphase) whose one-line JSON results this
script folds into the same points tree the parent would have written --
using the SAME fit (extrapolate over the snapshot's own int8 family
points) for the ladder's predicted_s values.

Usage: python tools/merge_end_phases.py \
           --composed /tmp/composed16b.out 16 \
           --ladder 20:/tmp/ladder20.out 24:/tmp/ladder24.out ...
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), ".."))
import bench  # noqa: E402


def load_result(path):
    for line in reversed(open(path).read().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise SystemExit(f"no JSON line in {path}")


def main(argv):
    composed_path = composed_nl = None
    ladder_results = []                      # (nl, result_dict)
    i = 0
    while i < len(argv):
        if argv[i] == "--composed":
            composed_path, composed_nl = argv[i + 1], int(argv[i + 2])
            i += 3
        elif argv[i] == "--ladder":
            for spec in argv[i + 1:]:
                if spec.startswith("--"):
                    break
                nl, path = spec.split(":", 1)
                ladder_results.append((int(nl), load_result(path)))
                i += 1
            i += 1
        else:
            raise SystemExit(f"unknown arg {argv[i]}")

    for fname in ("BENCH_DETAILS.json", "BENCH_SNAPSHOT_r5.json"):
        fpath = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "..", fname)
        d = json.load(open(fpath))
        p = d["points"]
        p.pop("ladder_composed_note", None)

        # rebuild the int8 fit from this artifact's own family points
        measured_q = [(si, nlp - si, p[f"int8_{name}_s"])
                      for name, nlp, si in bench.POINTS
                      if f"int8_{name}_s" in p]
        _, _, predict_q = bench.extrapolate(measured_q)

        if composed_path:
            res = load_result(composed_path)
            assert res.get("ok"), res
            parts = res["parts"]
            composed_s = float(res["composed_s"])
            sum_parts = (50.0 * parts["step_s"] + parts["vae_s"]
                         + parts["heads_s"])
            base_key = {16: "deep_holdout_16", 12: "deep_holdout"}.get(
                composed_nl)
            p["composed_clip"] = {
                "blocks": composed_nl, "precision": "int8",
                "composed_s": round(composed_s, 1),
                "sum_of_parts_s": round(sum_parts, 1),
                "delta_pct": round((composed_s - sum_parts) / sum_parts
                                   * 100.0, 2),
                "vae_tiles": "(16,26)/(8,13)",
                "note": "fresh-process lifetime; production (30,52) VAE "
                        "tile program's workspace cannot co-reside with "
                        "any tower on the 16 GB v5e (measured)",
            }
            xp = (p.get(base_key) or {}).get("measured_s")
            if xp:
                p["composed_clip"]["cross_process_step_s"] = xp
            p["composed_clip_detail"] = {k: round(v, 4)
                                         for k, v in parts.items()}

        if ladder_results:
            si_of = {20: 8, 24: 10, 28: 11, 32: 13, 36: 15, 40: 16}
            ladder = []
            for nl, si in ((40, 16), (36, 15), (32, 13), (28, 11),
                           (24, 10), (20, 8)):
                cfg_l = bench.make_config(nl, si)
                ladder.append({
                    "blocks": nl, "pcb": si,
                    "int8_weights_gb": round(bench.tree_gbytes(
                        bench.abstract_tower(cfg_l, True)), 2),
                    "bf16_weights_gb": round(bench.tree_gbytes(
                        bench.abstract_tower(cfg_l, False)), 2),
                    "attempted": False, "result": "not attempted"})
            deepest = wall = None
            for nl, res in sorted(ladder_results):
                entry = next(x for x in ladder if x["blocks"] == nl)
                entry["attempted"] = True
                si = si_of[nl]
                if res.get("ok"):
                    t_d = float(res["measured_s"])
                    pred = float(predict_q(si, nl - si))
                    entry.update(result="ok (fresh process)",
                                 measured_s=round(t_d, 4),
                                 predicted_s=round(pred, 4),
                                 residual_pct=round(
                                     abs(pred - t_d) / t_d * 100.0, 2))
                    deepest = entry
                else:
                    entry["result"] = ("fresh-process failure: "
                                       + res.get("error", "")[:200])
                    wall = entry
            p["int8_hbm_ladder"] = ladder
            full40 = {"blocks": 40, "precision": "int8",
                      "int8_weights_gb": ladder[0]["int8_weights_gb"]}
            if wall is not None:
                full40["oom"] = True
                full40["measured_wall_blocks"] = wall["blocks"]
                full40["wall_error"] = str(wall.get("result", ""))[:160]
            if deepest:
                full40.update(
                    deepest_measured_blocks=deepest["blocks"],
                    measured_s=deepest.get("measured_s"),
                    predicted_s=deepest.get("predicted_s"),
                    residual_pct=deepest.get("residual_pct"))
            p["int8_full40"] = full40

        json.dump(d, open(fpath, "w"), indent=1)
        print(f"merged into {fname}:")
        print(" composed_clip:", json.dumps(p.get("composed_clip")))
        print(" int8_full40:", json.dumps(p.get("int8_full40")))


if __name__ == "__main__":
    main(sys.argv[1:])
