"""Generate the OPTIMIZATION_r14.md per-entry checklist table: every
bench entry with its round-open and round-close seconds and this round's
disposition. Usage: python tools/r14_checklist.py <open_rev> [close_file]"""
import json
import subprocess
import sys

open_rev = sys.argv[1] if len(sys.argv) > 1 else "1108ebd"
close_file = sys.argv[2] if len(sys.argv) > 2 else "BENCH_local.json"

prev = json.loads(
    subprocess.run(
        ["git", "show", f"{open_rev}:BENCH_local.json"],
        capture_output=True,
        text=True,
    ).stdout
)["queries"]
cur = json.load(open(close_file))["queries"]

CHANGED = {
    "kg_pipeline_volume": "**changed**: star split (`ac9c0d4`) — plan_updates 26.5→14.5 s warm; phase-profiled",
    "kg_pipeline_incremental": "**changed**: star split + delta-scope AQE-off + batched scratch loads + clustered ledger write (`5ce5546`) + fused apply_delta (`a069120`) — warm 33→18.3 s",
    "kg_pipeline_full": "**changed**: star split (shared compile path)",
    "kg_volume_read": "reads the shared volume store; store build untimed (setup); unchanged",
    "dedup_resolve_clusters": "**changed**: pairs_canonical edge-dedup skip (`dee0818`) — solo 13→12.1 warm",
    "doc_minhash_cluster_dedup": "**changed**: pairs_canonical via corpus_dedup — solo 10.9 warm (open in-bench 13.0)",
    "curation_pipeline_v2": "**changed** (indirect): corpus_dedup pairs_canonical; cost = corpus_dedup by design",
    "graph_wcc": "**changed**: entry edge-list checkpoint + pairs_canonical (`77bd78d`) — solo 3.9→2.3",
    "graph_communities": "**changed**: entry edge-list checkpoint — solo 8.2→6.6; prep subtree 16 scans→0 (plans/r14)",
    "graph_pagerank": "**changed**: entry edge-list checkpoint — solo 5.2→4.2",
    "graph_ppr": "**changed**: entry edge-list checkpoint — flat (chain graph is 3 cheap scans); kept for consistency",
    "dedup_edit1_pairs": "examined — NO skew (max variant fan 46); filter-before-distinct A/B 7.5-8.1 vs 6.0-6.7 s — declined; at floor (262.5k output pairs)",
    "dedup_minhash_lsh": "examined — sig-carry inline-estimate A/B 39-45 vs 10 s (join-condition interpreted zip_with) — declined, shape kept",
    "dedup_minhash_lsh_x64": "examined — same machinery at xxhash64; shares the declined-alternative audit",
    "kg_path_query": "examined — profiled: 4.0 s warm = 3 closure rounds + 480k output rows; exec after build 0.06 s; at floor",
    "dedup_lsh_eval": "examined — B3 single-pass full-outer shape re-read; pair-volume-bound",
    "dedup_incremental": "examined — batch-probe shape re-read: corpus side reduces to prebuilt index; pair-volume-bound",
    "er_record_linkage": "examined — r13 lazy-w_t posture pinned; broadcast-threshold scope added to the pin (ADVICE)",
    "graph_triangles": "examined — r13 checkpoint kept; its canon/oriented shape is the precedent this round generalized",
    "graph_kcore": "examined — bipartite edge list is ONE parquet scan; an input checkpoint would cost what the one extra scan costs",
    "graph_ktruss": "examined — same single-scan-input reasoning as kcore",
    "graph_betweenness": "examined — same single-scan-input reasoning as kcore",
    "graph_closeness": "examined — same single-scan-input reasoning as kcore",
    "kg_star_chain7": "examined — mid-round +0.9 s adjudicated: solo median 2.75 ≤ 3.20 bar, matches r13 driver 2.71 (round-open run was fast)",
    "kg_sparql_update": "examined — mid-round +1.3 s adjudicated: solo median 3.64 ≤ 4.74 bar, matches r13 driver 4.15",
}

FAMILY = [
    ("kg_", "kg family: compile path touched by the star split (`ac9c0d4`) — same-predicate multi-valued star demotion; oracle 254/254 both sweeps"),
    ("ann_", "ANN family: r12/r13-audited (Arrow GEMM, bounded broadcasts) — re-read r14, unchanged"),
    ("embed_", "embedding family: Arrow GEMM + bounded collects (r13 audit) — unchanged"),
    ("graph_", "graph family: examined r14 (edge-plan consumer count audited per operator)"),
    ("dedup_", "dedup family: r13 repeated-subtree audit + r14 minhash re-profile — unchanged"),
    ("eval_", "eval-set-sized inputs; single-agg shapes — unchanged"),
    ("events_", "window/agg shapes, map-side combinable; plan-pinned earlier rounds — unchanged"),
    ("data_", "deterministic split/pack/budget shapes — unchanged"),
    ("search_", "search family: B3 checkpoint shapes re-read — unchanged"),
    ("text_", "text ops: built-in-function pipelines (no Python row path) — unchanged"),
    ("streaming_", "streaming ops: shared signature/band tables (B3) — unchanged"),
    ("multimodal_", "multimodal: single-decode window shape (B3) — unchanged"),
    ("curation_", "curation: B3 checkpoint shapes — unchanged"),
]
DEFAULT = (
    "relational/analytic SQL shape: AQE-broadcast joins at sf0.1, pushdown "
    "+ broadcast posture pinned by the r11 sweep — unchanged"
)


def dispo(name: str) -> str:
    if name in CHANGED:
        return CHANGED[name]
    for pfx, txt in FAMILY:
        if name.startswith(pfx):
            return txt
    return DEFAULT


print("| entry | open s | close s | r14 disposition |")
print("|---|---|---|---|")
for name in sorted(cur):
    p = prev.get(name)
    ps = f"{p:.2f}" if p is not None else "—"
    sub = " (sub-second session floor)" if cur[name] < 1.0 else ""
    print(f"| {name} | {ps} | {cur[name]:.2f} | {dispo(name)}{sub} |")
