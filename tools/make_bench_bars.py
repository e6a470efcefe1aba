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
  1. an adjudicated solo-median pin (tools/solo_pins.json, each with its
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

#: adjudicated n>=3 solo medians (the agg_cube protocol) — these OVERRIDE
#: first-recorded numbers; each carries its BASELINE.md round. Since r11
#: the pin set lives in tools/solo_pins.json (name -> [median, source])
#: so tools/adjudicate.py can append pins programmatically with the same
#: provenance discipline; history of the r07-r10 hand-run pins is in the
#: BASELINE.md sections the sources cite.
def solo_pins() -> dict[str, tuple[float, str]]:
    with open(os.path.join(HERE, "solo_pins.json")) as fh:
        return {q: (float(v), str(src)) for q, (v, src) in json.load(fh).items()}


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
    bars.update(solo_pins())
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
