#!/usr/bin/env python3
"""Assemble SMOKE_r10.json from the round's two same-HEAD smoke segments.

Provenance (documented in the artifact itself): the full factor-10 run
of 2026-08-16 ~10:00 (chain2) completed its ENTIRE main phase (all 1x
and 10x legs, every plan/time gate) and the first four heavy-family
exponent fits, then died on transient disk exhaustion inside
q_tf_cosine's 100x spill (the /tmp leftovers of every earlier run of
the round were still on disk; ~44 GB reclaimed after). The remaining
four heavy fits were then re-run at the same HEAD with the same bench
artifact and clean disk (chain3, filtered to those four queries).
Every row is internally self-consistent: all of a row's legs (t1/t10/
t30/t100) were measured inside its own run. No row mixes runs.
"""
import json
import re
import sys


def rows(path):
    out = []
    for line in open(path):
        m = re.search(r'\{"(?:query|metric)".*\}', line)
        if m:
            try:
                out.append(json.loads(m.group(0)))
            except json.JSONDecodeError:
                pass
    return out


def main():
    main_log, fix_log, out_path = sys.argv[1], sys.argv[2], sys.argv[3]
    seg_a = rows(main_log)   # chain2: full main phase + 4 heavy fits
    seg_b = rows(fix_log)    # chain3: the 4 remaining heavy fits
    main_rows = [r for r in seg_a
                 if "query" in r and "growth_exponent" not in r]
    heavy_a = [r for r in seg_a if "growth_exponent" in r]
    heavy_b = [r for r in seg_b if "growth_exponent" in r]
    done = {r["query"] for r in heavy_a}
    heavy = heavy_a + [r for r in heavy_b if r["query"] not in done]
    ledger = [r for r in seg_b
              if r.get("metric") == "scale_smoke_excluded"]
    failures = sum(1 for r in main_rows
                   if not (r.get("plan_ok") and r.get("time_ok")))
    failures += sum(1 for r in heavy if not r.get("exp_ok"))
    worst = max(main_rows, key=lambda r: r.get("time_ratio", 0.0))
    note = {
        "metric": "artifact_provenance",
        "note": ("two same-HEAD segments: the full factor-10 run "
                 "completed its whole main phase and 4/8 heavy fits, "
                 "then hit transient disk exhaustion (stale /tmp of "
                 "earlier runs; 44 GB reclaimed) inside q_tf_cosine's "
                 "100x spill; the remaining 4 heavy fits re-ran at the "
                 "same HEAD, same bench artifact, clean disk. Every "
                 "row's legs were measured inside its own run."),
        "segment_a": "chain2 full run (main rows + 4 heavy fits)",
        "segment_b": "chain3 filtered heavy completion (4 fits + ledger)",
    }
    summary = {
        "metric": "scale_smoke", "factor": 10,
        "queries": len(main_rows), "failures": failures,
        "worst_time_ratio": worst.get("time_ratio"),
        "worst_query": worst.get("query"),
    }
    all_rows = main_rows + heavy + ledger + [note, summary]
    with open(out_path, "w") as f:
        f.write("[\n" + ",\n".join(
            json.dumps(r, separators=(",", ":")) for r in all_rows)
            + "\n]\n")
    print(f"main={len(main_rows)} heavy={len(heavy)} "
          f"ledger={len(ledger)} failures={failures}")


if __name__ == "__main__":
    main()
