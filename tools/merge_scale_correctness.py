#!/usr/bin/env python3
"""Merge the per-scale parallel-gate outputs into the round's
correctness_scale.json artifact (verdict r18 #1): the full DuckDB-oracle
replay at sf0.1 and at the /tmp/scale grown copy (events x10,
docs/emb/facts x4), beside the driver's own sf0.01 gate."""
import json, sys

out = {}
for label, path in [("sf0.01", "/tmp/correctness_sf001.json"),
                    ("sf0.1", "/tmp/correctness_sf01.json"),
                    ("scale_x10_x4", "/tmp/correctness_scale_tmp.json")]:
    with open(path) as f:
        d = json.load(f)
    fails = {k: v["detail"] for k, v in d["queries"].items()
             if v["status"] != "pass"}
    out[label] = {"sf_dir": d["sf_dir"], "n_pass": d["n_pass"],
                  "n_fail": d["n_fail"], "failures": fails}
    # full per-query record only for failures; passes are summarized
    # (the per-scale inputs under /tmp carry the full detail)

with open("correctness_scale.json", "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps({k: (v["n_pass"], v["n_fail"]) for k, v in out.items()}))
sys.exit(1 if any(v["n_fail"] for v in out.values()) else 0)
