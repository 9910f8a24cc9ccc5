"""Probe-aware round-over-round bench comparison (r11 VERDICT
next-round #7): mechanical drift attribution instead of hand forensics.

    python cli/bench_compare.py OLD NEW

OLD/NEW each accept either a complete bench line (bench_last.json /
BENCH_LOCAL_rN.json — written by bench.py since r12) or a driver
BENCH_rN.json wrapper whose "tail" preserves only a truncated suffix of
the line (the pre-r12 situation that forced common-subset geomeans by
hand). Prints one JSON line:

  - per-file (avg_query_sec, drift_probe_sec) pairs — the headline
    numbers must always be read as a pair on this noisy-neighbor box;
  - the probe ratio (new probe / old probe, machine-speed drift) and
    the probe-normalized avg ratio;
  - the COMMON-QUERY GEOMEAN of per-query new/old ratios — the most
    trustworthy cross-round signal (composition-change-proof), over
    however many queries both files preserve;
  - the 5 biggest per-query regressions and wins.

The probe is a coarse filter, not a precise correction (it is pure-CPU
and cannot see IO contention or JVM/GC variance — r11 VERDICT "What's
wrong #2"); the geomean is the number to trust.
"""

from __future__ import annotations

import json
import math
import re
import sys


def load_bench(path: str) -> dict:
    """Parse a complete bench JSON line, or salvage what a driver
    BENCH_rN.json tail preserves: per-query timings via regex over the
    truncated fragment plus the summary fields (the tail always carries
    them — bench.py orders the line so totals come last)."""
    with open(path) as fh:
        raw = fh.read()
    try:
        doc = json.loads(raw)
    except json.JSONDecodeError:
        doc = None
    if isinstance(doc, dict) and "queries" in doc:
        return {
            "queries": doc["queries"],
            "avg_query_sec": doc.get("avg_query_sec"),
            "drift_probe_sec": doc.get("drift_probe_sec"),
            "n_queries": doc.get("n_queries"),
            "value": doc.get("value"),
            "complete": True,
        }
    tail = doc.get("tail", raw) if isinstance(doc, dict) else raw
    # the tail is an escaped JSON fragment: "name": 1.234 pairs. Split
    # off the substrates/summary section so substrate builds and summary
    # scalars don't pollute the per-query map; substrate keys carry ':'
    # so they never collide with query names anyway.
    frag = tail.split('"substrates"')[0]
    queries = {
        m.group(1): float(m.group(2))
        for m in re.finditer(
            r'\\?"([a-z][a-z0-9_]+)\\?":\s*([0-9.]+)', frag
        )
        if ":" not in m.group(1)
    }

    def scalar(name: str) -> float | None:
        m = re.search(rf'\\?"{name}\\?":\s*([0-9.]+)', tail)
        return float(m.group(1)) if m else None

    return {
        "queries": queries,
        "avg_query_sec": scalar("avg_query_sec"),
        "drift_probe_sec": scalar("drift_probe_sec"),
        "n_queries": scalar("n_queries"),
        "value": scalar("value"),
        "complete": False,
    }


def compare(old: dict, new: dict) -> dict:
    common = sorted(set(old["queries"]) & set(new["queries"]))
    ratios = {
        q: new["queries"][q] / old["queries"][q]
        for q in common
        if old["queries"][q] > 0
    }
    geomean = (
        math.exp(sum(math.log(r) for r in ratios.values()) / len(ratios))
        if ratios
        else None
    )
    probe_ratio = (
        new["drift_probe_sec"] / old["drift_probe_sec"]
        if new.get("drift_probe_sec") and old.get("drift_probe_sec")
        else None
    )
    avg_ratio = (
        new["avg_query_sec"] / old["avg_query_sec"]
        if new.get("avg_query_sec") and old.get("avg_query_sec")
        else None
    )
    # r12 VERDICT "What's wrong #5": avg_query_sec is flattered when
    # work relocates into substrate builds — "value" (consume + builds)
    # is the cross-round headline. Normalize per query so registry
    # growth doesn't read as a slowdown.
    value_per_q_ratio = (
        (new["value"] / new["n_queries"]) / (old["value"] / old["n_queries"])
        if new.get("value")
        and old.get("value")
        and new.get("n_queries")
        and old.get("n_queries")
        else None
    )
    ranked = sorted(ratios.items(), key=lambda kv: kv[1])
    return {
        "old_pair": [old.get("avg_query_sec"), old.get("drift_probe_sec")],
        "new_pair": [new.get("avg_query_sec"), new.get("drift_probe_sec")],
        "value_per_query_ratio": (
            round(value_per_q_ratio, 3) if value_per_q_ratio else None
        ),
        "avg_ratio": round(avg_ratio, 3) if avg_ratio else None,
        "probe_ratio": round(probe_ratio, 3) if probe_ratio else None,
        "avg_ratio_probe_normalized": (
            round(avg_ratio / probe_ratio, 3)
            if avg_ratio and probe_ratio
            else None
        ),
        "value_per_query_ratio_probe_normalized": (
            round(value_per_q_ratio / probe_ratio, 3)
            if value_per_q_ratio and probe_ratio
            else None
        ),
        "n_common_queries": len(ratios),
        "common_query_geomean": round(geomean, 3) if geomean else None,
        "worst5": [[q, round(r, 2)] for q, r in ranked[-5:][::-1]],
        "best5": [[q, round(r, 2)] for q, r in ranked[:5]],
    }


def main() -> None:
    if len(sys.argv) != 3:
        sys.exit("usage: bench_compare.py OLD_BENCH_JSON NEW_BENCH_JSON")
    print(json.dumps(compare(load_bench(sys.argv[1]), load_bench(sys.argv[2]))))


if __name__ == "__main__":
    main()
