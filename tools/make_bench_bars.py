"""Generate tools/bench_bars.json — the per-entry performance bar the
bench tripwire compares against (r09 verdict item 4).

The round-over-round tripwire (``shared_sum_vs_prev`` in bench.py)
catches sudden regressions but is blind to SLOW creep: an entry that
drifts +20% per round never trips a previous-run comparison, yet ends up
2.5x its first-recorded number (agg_hist_quantiles 0.60 -> 1.51 s over
r07..r09 was exactly this). The fix is a per-entry bar anchored to the
FIRST-RECORDED committed bench number — or, where a round adjudicated a
noisy in-bench number with an n>=5 solo median (the agg_cube protocol,
BASELINE.md), to that pinned median.

Bar definition per entry, in priority order:
  1. an adjudicated solo-median pin (SOLO_PINS below, each with its
     BASELINE.md provenance) — solo medians are measured under bench
     hygiene on a settled machine, so they are the honest baseline when
     the in-run number was run-order noise;
  2. the first non-negative value recorded for the entry in any
     committed BENCH_local.json at sf0.1, walking git history
     oldest-first (the "first-recorded" convention BASELINE.md and the
     verdicts already use).

Run after adding bench entries or adjudicating a pin:

    python tools/make_bench_bars.py   # rewrites tools/bench_bars.json

and commit the result — bench.py reads the committed file, so the bar
set is stable within a round and reviewed like any other change.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

#: adjudicated n>=3 solo medians (the agg_cube protocol) — these
#: OVERRIDE first-recorded numbers; each carries its BASELINE.md round.
SOLO_PINS: dict[str, tuple[float, str]] = {
    "agg_cube": (0.821, "solo-pin r07 n=5 (BASELINE.md)"),
    "streaming_curate": (0.748, "solo-pin r08 n=5 (BASELINE.md)"),
    "kg_service_federation": (4.21, "solo-pin r09 n=6 (BASELINE.md)"),
    "kg_select": (3.32, "solo-adjudication r09 (BASELINE.md)"),
    "dedup_lsh_eval": (10.07, "solo-adjudication r09 (BASELINE.md)"),
    "doc_minhash_cluster_dedup": (15.21, "solo-adjudication r09 (BASELINE.md)"),
    # r10 pins (r09 verdict item 3): n=5 solo, cold-first series in
    # BASELINE.md r10 section; all three landed at/below their records,
    # adjudicating the 2.5x in-bench breaches as run-order noise
    "agg_hist_quantiles": (0.57, "solo-pin r10 n=5 (BASELINE.md)"),
    "data_ppl_buckets": (0.78, "solo-pin r10 n=5 (BASELINE.md)"),
    "text_winnow_fp": (1.40, "solo-pin r10 n=5 (BASELINE.md)"),
    # r10 re-anchors after the DAG-parallel jobs=8 rewrite (BASELINE.md
    # r10 jobs section): the old bars (58.4 / 140.1 / 38.1) would let a
    # full regression to the sequential path pass un-tripped, so the
    # bars move DOWN to the new n=5 solo medians on final r10 code
    "kg_pipeline_full": (20.21, "solo-pin r10 n=5 after jobs=8 (BASELINE.md)"),
    "kg_pipeline_volume": (39.07, "solo-pin r10 n=5 after jobs=8 (BASELINE.md)"),
    "kg_pipeline_incremental": (35.32, "solo-pin r10 n=5 after jobs=8 (BASELINE.md)"),
}


def first_recorded() -> dict[str, tuple[float, str]]:
    """Walk every committed BENCH_local.json oldest-first; keep each
    query's first non-negative sf0.1 timing."""
    commits = subprocess.run(
        ["git", "log", "--format=%H", "--reverse", "--", "BENCH_local.json"],
        cwd=REPO,
        capture_output=True,
        text=True,
        check=True,
    ).stdout.split()
    bars: dict[str, tuple[float, str]] = {}
    for c in commits:
        blob = subprocess.run(
            ["git", "show", f"{c}:BENCH_local.json"],
            cwd=REPO,
            capture_output=True,
            text=True,
        )
        if blob.returncode != 0:
            continue
        try:
            payload = json.loads(blob.stdout)
        except ValueError:
            continue
        if payload.get("sf") != 0.1:
            continue
        for q, t in payload.get("queries", {}).items():
            if q not in bars and isinstance(t, (int, float)) and t >= 0:
                bars[q] = (float(t), f"first-recorded {c[:7]}")
    return bars


def main() -> int:
    bars = first_recorded()
    bars.update(SOLO_PINS)
    out = {
        q: {"bar": round(v, 3), "source": src}
        for q, (v, src) in sorted(bars.items())
    }
    path = os.path.join(HERE, "bench_bars.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")
    print(f"wrote {path}: {len(out)} bars")
    return 0


if __name__ == "__main__":
    sys.exit(main())
