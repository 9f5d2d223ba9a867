#!/usr/bin/env python3
"""Cross-round bench comparison: r19 local record vs r18 records.

Compares per-query MINS on the common query set, against BOTH r18 bases:
the official BENCH_r18_local.json and (context) BENCH_r18_trial.json /
BENCH_r18.json driver record. Prints total ratio, median per-query
ratio, and the worst movers, excluding queries either record's harness
disowned (suspect) unless they were retimed.
"""
import json, statistics, sys

def load(path):
    with open(path) as f:
        d = json.load(f)
    return d

def compare(new, old, label):
    qn, qo = new["queries"], old["queries"]
    common = sorted(set(qn) & set(qo))
    ratios = {k: qn[k] / qo[k] for k in common if qo[k] > 0}
    tn = sum(qn[k] for k in common)
    to = sum(qo[k] for k in common)
    med = statistics.median(ratios.values())
    worst = sorted(ratios.items(), key=lambda kv: -kv[1])[:5]
    best = sorted(ratios.items(), key=lambda kv: kv[1])[:3]
    print(f"== vs {label}: {len(common)} common queries")
    print(f"   total {tn:.3f}s vs {to:.3f}s = {tn/to:.3f}x ; median per-query {med:.3f}x")
    print(f"   new-record suspect={new.get('suspect', [])} retimed={new.get('retimed', 'n/a')}")
    print(f"   old-record suspect={old.get('suspect', [])}")
    print("   worst:", ", ".join(f"{k} {v:.2f}x" for k, v in worst))
    print("   best :", ", ".join(f"{k} {v:.2f}x" for k, v in best))

if __name__ == "__main__":
    new = load(sys.argv[1] if len(sys.argv) > 1 else "BENCH_r19_local.json")
    for path, label in [("BENCH_r18_local.json", "r18 local (min-of-3, freeze commit)"),
                        ("BENCH_r18.json", "r18 official driver record"),
                        ("BENCH_r18_trial.json", "r18 same-code trial control")]:
        try:
            compare(new, load(path), label)
        except FileNotFoundError:
            print(f"== {label}: file not found, skipped")
        except KeyError as e:
            print(f"== {label}: missing key {e}, skipped")
