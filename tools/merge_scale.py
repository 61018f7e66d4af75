#!/usr/bin/env python3
"""Merge a targeted ScaleBench run (BENCH_SCALE_PARTIAL.json, written by
SPARK_GRAFT_SCALE_ONLY=...) into the full BENCH_SCALE.json artifact:
the partial run's per-query rows replace/extend the main file's
"queries" map; every other section of the main file is untouched.

Usage: python3 tools/merge_scale.py [partial] [main]
"""
import json
import sys

partial_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_SCALE_PARTIAL.json"
main_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH_SCALE.json"

with open(partial_path) as f:
    partial = json.load(f)
with open(main_path) as f:
    main = json.load(f)

# rows measured against a different base dataset (scale-factor dir) must
# never merge silently — the ratios would mix SFs
assert partial.get("base") == main.get("base"), (
    f"base mismatch: partial={partial.get('base')} main={main.get('base')}")

if partial.get("metric") == "scale_components_partial":
    # deep-blow-up component rows (SPARK_GRAFT_SCALE_COMPONENTS_ONLY):
    # merged into the components section; copies there is the CC depth
    assert partial.get("copies") == main.get("components", {}).get("copies"), (
        "component-depth copies mismatch")
    assert partial.get("components"), "partial run measured nothing"
    updated = sorted(partial["components"].keys())
    main["components"].update(partial["components"])
else:
    assert partial.get("metric") == "scale_ratio_partial", partial.get("metric")
    assert partial.get("copies") == main.get("copies"), "copies mismatch"
    assert partial.get("queries"), "partial run measured nothing"
    updated = sorted(partial["queries"].keys())
    main["queries"].update(partial["queries"])

with open(main_path, "w") as f:
    json.dump(main, f, separators=(",", ":"))
    f.write("\n")
print(f"merged {len(updated)} rows into {main_path}: {', '.join(updated)}")
