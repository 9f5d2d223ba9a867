#!/usr/bin/env python3
"""Cross-round bench comparison on per-query MINS over the common query set.

Usage: bench_compare.py [NEW.json] [OLD.json ...]
Defaults: NEW=BENCH_r20_local.json, OLD=BENCH_r19_local.json (the committed
clean-window r19 basis; see COMPARE_r19.txt).

Queries either record's harness disowned — flagged `suspect` and NOT
retimed — are EXCLUDED from the totals/medians (their mins may be
inflated by a host window covering every repeat); they are listed so the
exclusion is visible. Prints total ratio, median per-query ratio, and
the worst/best movers.
"""
import json, statistics, sys

def load(path):
    with open(path) as f:
        return json.load(f)

def disowned(rec):
    # suspect-and-not-retimed: the harness never got a second window for
    # these mins, so they are not a usable cross-round basis
    return set(rec.get("suspect", [])) - set(rec.get("retimed", []))

def compare(new, old, label):
    qn, qo = new["queries"], old["queries"]
    excluded = (disowned(new) | disowned(old)) & set(qn) & set(qo)
    common = sorted((set(qn) & set(qo)) - excluded)
    # zero-min queries can't form a ratio; exclude them from the totals
    # too so total and median describe the same query set (r20 ADVICE)
    zero = [k for k in common if qo[k] <= 0]
    common = [k for k in common if qo[k] > 0]
    if zero:
        print(f"== vs {label}: skipped zero-min queries: {sorted(zero)}")
    if not common:
        print(f"== vs {label}: no common nonzero queries — comparison skipped")
        return
    ratios = {k: qn[k] / qo[k] for k in common}
    tn = sum(qn[k] for k in common)
    to = sum(qo[k] for k in common)
    med = statistics.median(ratios.values())
    worst = sorted(ratios.items(), key=lambda kv: -kv[1])[:5]
    best = sorted(ratios.items(), key=lambda kv: kv[1])[:3]
    print(f"== vs {label}: {len(common)} common queries"
          + (f" ({len(excluded)} excluded as disowned: {sorted(excluded)})" if excluded else ""))
    print(f"   total {tn:.3f}s vs {to:.3f}s = {tn/to:.3f}x ; median per-query {med:.3f}x")
    print(f"   new-record suspect={new.get('suspect', [])} retimed={new.get('retimed', 'n/a')}")
    print(f"   old-record suspect={old.get('suspect', [])} retimed={old.get('retimed', 'n/a')}")
    print("   worst:", ", ".join(f"{k} {v:.2f}x" for k, v in worst))
    print("   best :", ", ".join(f"{k} {v:.2f}x" for k, v in best))

if __name__ == "__main__":
    new = load(sys.argv[1] if len(sys.argv) > 1 else "BENCH_r20_local.json")
    olds = sys.argv[2:] if len(sys.argv) > 2 else ["BENCH_r19_local.json"]
    for path in olds:
        try:
            compare(new, load(path), path)
        except FileNotFoundError:
            print(f"== {path}: file not found, skipped")
        except KeyError as e:
            print(f"== {path}: missing key {e}, skipped")
