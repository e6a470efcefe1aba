"""Rewrite the queries() registry dict in __spark_entry__.py to the
round's rotation order (the driver's ~50-entry correctness window walks
the dict front-first, so ordering IS the rotation policy — see the
queries() docstring).

Order emitted:
  1. STALE_FRONT — this round's must-check block (entries whose latest
     driver-green row is oldest; per-round list from the verdict);
  2. CHANGED — entries whose code changed this round (new operators or
     behavior-relevant edits), minus any already in STALE_FRONT;
  3. everything else, sorted by (latest driver-green round ascending,
     current registry position) — so the next-oldest blocks queue up
     and the block checked last round rotates to the back.

The script regenerates the dict body (keys + the callables they map to
are preserved verbatim; section comments are regenerated). Run, then
`git diff __spark_entry__.py` to review:

    python tools/rotate_registry.py
"""

from __future__ import annotations

import glob
import json
import os
import re

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
ENTRY = os.path.join(REPO, "__spark_entry__.py")

#: r13 front: the 38 entries whose latest driver row is r08 (r12
#: verdict, What's missing #1). The two r03-stale x64 variants are NOT
#: here: they moved to bench_only_queries() after r03 (no xxhash64 in
#: DuckDB), so the driver window can't reach them by design.
STALE_FRONT = [
    "agg_incremental_merge",
    "ann_cosine_topk",
    "ann_embedding_neardup",
    "ann_ivf_query",
    "ann_ivf_topk",
    "ann_lsh_topk",
    "ann_neardup_lsh",
    "ann_range_search",
    "data_split_shard",
    "decontaminate",
    "dedup_exact",
    "dedup_incremental",
    "dedup_lines",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_resolve_clusters",
    "dedup_simhash",
    "doc_cdc_chunks",
    "dsir_importance",
    "graph_ktruss",
    "graph_linkpred",
    "json_extract_events",
    "kg_pattern_scan",
    "multimodal_binary_meta",
    "multimodal_features",
    "multimodal_frame_sample",
    "pii_redact",
    "quality_classifier",
    "skew_distinct_users",
    "skew_salted_join",
    "source_reputation",
    "text_features",
    "text_fingerprint",
    "text_langid",
    "text_repetition",
    "text_winnow_fp",
    "window_running_total",
    "window_topk_per_user",
]

#: entries added or behavior-touched this round (r13): the ADVICE fixes
#: that changed query/oracle semantics (negated re-added ids; url_features
#: scheme class + empty-param counting), plus the round's new operators
#: (brand-new entries auto-front after CHANGED).
CHANGED = [
    "dedup_cross_snapshot",
    "corpus_snapshot_diff",
    "contamination_drift",
    "text_url_features",
]

ROUND = "r13"


def latest_driver_round() -> dict[str, int]:
    latest: dict[str, int] = {}
    files = sorted(
        glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")),
        key=lambda f: int(re.search(r"r(\d+)", os.path.basename(f)).group(1)),
    )
    for f in files:
        rnd = int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        with open(f) as fh:
            for k, v in json.load(fh).items():
                if isinstance(v, dict):
                    latest[k] = rnd
    return latest


def main() -> int:
    src = open(ENTRY).read()
    m = re.search(r"(def queries\(\).*?return \{\n)(.*?)(\n    \}\n)", src, re.S)
    if not m:
        raise SystemExit("queries() dict not found")
    body = m.group(2)
    pairs = re.findall(r'^\s+"([\w]+)": ([\w.]+),\s*$', body, re.M)
    mapping = dict(pairs)
    order = [k for k, _ in pairs]
    if len(mapping) != len(order):
        raise SystemExit("duplicate keys?")

    latest = latest_driver_round()
    front = [k for k in STALE_FRONT if k in mapping]
    changed = [k for k in CHANGED if k in mapping and k not in front]
    # new entries (no driver row yet) that aren't explicitly listed go
    # right after CHANGED so they enter the window immediately
    seen = set(front) | set(changed)
    brand_new = [k for k in order if k not in seen and k not in latest]
    seen |= set(brand_new)
    rest = sorted(
        (k for k in order if k not in seen),
        key=lambda k: (latest.get(k, 0), order.index(k)),
    )

    lines = []
    lines.append(
        f"        # --- {ROUND} front: oldest-driver-row block "
        "(r12 verdict, What's missing #1, + the two r03 x64 variants) ---"
    )
    for k in front:
        lines.append(f'        "{k}": {mapping[k]},')
    lines.append(
        f"        # --- {ROUND} changed/added "
        "(advice semantics fixes + new operators) ---"
    )
    for k in changed + brand_new:
        lines.append(f'        "{k}": {mapping[k]},')
    cur = None
    for k in rest:
        r = latest.get(k, 0)
        if r != cur:
            cur = r
            lines.append(
                f"        # --- latest driver row r{r:02d} "
                "(oldest-first; last-checked rotates to the back) ---"
            )
        lines.append(f'        "{k}": {mapping[k]},')

    new_src = src[: m.start(2)] + "\n".join(lines) + src[m.end(2):]
    with open(ENTRY, "w") as fh:
        fh.write(new_src)
    print(
        f"rotated: {len(front)} front + {len(changed)} changed + "
        f"{len(brand_new)} new + {len(rest)} rest = "
        f"{len(front)+len(changed)+len(brand_new)+len(rest)}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
