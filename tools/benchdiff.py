#!/usr/bin/env python3
"""Round-over-round bench adjudicator (VERDICT r14 #4): diff a new
bench artifact's masses block + per-query walls against the previous
committed one, and DECIDE box-vs-plan-vs-data per flagged query instead
of leaving the call to eyeball (the q152 +1.6 s question this tool
exists to close).

    python3 tools/benchdiff.py BENCH_r14_perquery.json /tmp/graft_bench.json

Decision procedure per the round-14 GraphDecomp findings:
  - masses moved >2x        -> the DATA moved; name the mass and the
                               stage/queries it drives (regenerated
                               corpus, re-measure constants).
  - masses flat + wall moved, and the query is in the job-overhead-
    bound family           -> scale the old wall by the artifacts'
                               job_overhead_us ratio; a delta within
                               the scaled band is the BOX, beyond it
                               is a PLAN change (a regression or an
                               intended rework — git log decides which).
  - masses flat + wall moved, not overhead-bound -> flag for a plan
                               read (explain/GraphDecomp).
Only per-query deltas >0.5 s are signal at all (the box swings 26-48 s
at sf0.1 on identical code — CLAUDE.md's measured band).
"""
import json
import sys

WALL_FLAG_SEC = 0.5
MASS_FLAG_RATIO = 2.0

# masses key -> (stage name, the bench lines that mass drives)
MASS_STAGES = {
    "n_vec": ("corpus", ["(every embedding query)"]),
    "edge_cells": ("full_substrate", ["graph_memo_build", "q143", "q152"]),
    "edge_occ_max": ("full_substrate", ["graph_memo_build", "q143", "q152"]),
    "edge_pair_mass": ("full_substrate", ["edge_memo_build", "graph_memo_build", "q126", "q135", "q143", "q152"]),
    "cell_pairs": ("full_substrate", ["edge_memo_build", "q126", "q135", "q143", "q152"]),
    "div_edges": ("full_substrate", ["graph_memo_build", "q143", "q152"]),
    "old_edge_cells": ("old_substrate", ["graph_memo_build_old", "q151", "q154"]),
    "old_edge_occ_max": ("old_substrate", ["graph_memo_build_old", "q151", "q154"]),
    "old_edge_pair_mass": ("old_substrate", ["graph_memo_build_old", "q151", "q154"]),
    "old_cell_pairs": ("old_substrate", ["graph_memo_build_old", "q151", "q154"]),
    "old_div_edges": ("old_substrate", ["graph_memo_build_old", "q151", "q154"]),
    "dup_pairs": ("near_dup_cc", ["cc_memo_build", "q56", "q79", "q108", "q114", "q146", "q148", "q149"]),
    "minhash_cands": ("minhash_bands", ["cand_memo_build", "q31", "q96", "q121", "q122", "q131"]),
    "band_occ_max": ("simhash_bands", ["q51", "q157", "q164"]),
    "band_over_cap": ("simhash_bands", ["q51 (cap BINDS if >0 — re-measure BandOccCap)"]),
    # update-wave masses (round-16, VERDICT r15 #1c) — recorded through
    # the same factored stages q157 runs (TextQueries.updWaveProbe)
    "upd_slice": ("update_wave", ["q157 (retract + relabel input)"]),
    "upd_slice_bands": ("update_wave", ["q157 (probe build side)"]),
    "upd_probe_cands": ("update_wave", ["q157 (candidate mass, the probe join's output)"]),
    "upd_new_pairs": ("update_wave", ["q157 (merge input)"]),
}

# bench lines whose wall is per-job-overhead bound at test SFs
# (GraphDecomp r14: job counts code-fixed, jobs x overhead reconstructs
# the r12/r13/r14 readings) — for these, the old wall scaled by the
# job_overhead_us ratio is the box-expected wall
OVERHEAD_BOUND = {
    "q135", "q143", "q148", "q149", "q151", "q152", "q154",
    "graph_memo_build", "graph_memo_build_old", "q91", "q92", "q144",
    # q171 rides the same memoized IVFADC tower as q91 — its timed run
    # is anti-joins + shortlist + audit, job-count dominated at test SFs
    "q171",
}


def load(path):
    with open(path) as f:
        return json.load(f)


def qname(k):
    # bench keys look like q152_graph_delete; OVERHEAD_BOUND uses the prefix
    return k.split("_")[0] if k.startswith("q") else k


def main():
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    old, new = load(sys.argv[1]), load(sys.argv[2])
    om, nm = old.get("masses", {}), new.get("masses", {})
    oq, nq = old.get("queries", {}), new.get("queries", {})
    print(f"old: {sys.argv[1]}  total={old.get('value', 0):.1f}s  loadavg={old.get('loadavg', '?')}")
    print(f"new: {sys.argv[2]}  total={new.get('value', 0):.1f}s  loadavg={new.get('loadavg', '?')}")

    # ---- masses ----
    moved = []
    for k in sorted(set(om) | set(nm)):
        if k == "job_overhead_us":
            continue
        a, b = om.get(k), nm.get(k)
        if a is None or b is None:
            print(f"MASS   {k}: only in {'old' if b is None else 'new'} ({a if b is None else b})")
            continue
        hi, lo = max(a, b), max(min(a, b), 1)
        if a == 0 and b == 0:
            continue
        if hi / lo > MASS_FLAG_RATIO or (a == 0) != (b == 0):
            stage, lines = MASS_STAGES.get(k, ("?", []))
            moved.append(k)
            print(f"MASS   {k}: {a} -> {b}  [DATA moved; stage={stage}; drives {', '.join(lines)}]")
    if not moved:
        print("masses: FLAT (no mass moved >2x) — wall deltas are box or plan, not data")

    # ---- per-job overhead ----
    oo, no_ = om.get("job_overhead_us"), nm.get("job_overhead_us")
    ratio = (no_ / oo) if (oo and no_) else None
    if ratio:
        print(f"job_overhead_us: {oo} -> {no_}  (box ratio {ratio:.2f}x for overhead-bound lines)")

    # ---- per-query walls ----
    flags = 0
    for k in sorted(set(oq) | set(nq), key=lambda k: -(nq.get(k, 0) - oq.get(k, 0))):
        a, b = oq.get(k), nq.get(k)
        if a is None or b is None:
            print(f"LINE   {k}: only in {'old' if b is None else 'new'} ({a if b is None else b:.1f}s)")
            continue
        d = b - a
        if abs(d) <= WALL_FLAG_SEC:
            continue
        flags += 1
        verdict = "plan-read needed (not overhead-bound; check masses above / explain)"
        if qname(k) in OVERHEAD_BOUND:
            if ratio:
                exp = a * ratio
                band = max(WALL_FLAG_SEC, 0.25 * exp)
                if abs(b - exp) <= band:
                    verdict = f"BOX (expected {exp:.1f}s at this overhead ratio; within band)"
                else:
                    verdict = f"PLAN or data (expected {exp:.1f}s at this overhead ratio; outside band)"
            else:
                verdict = ("overhead-bound family but job_overhead_us missing from one "
                           "artifact — run GraphDecomp on both sides to decide")
        mass_note = " + data moved" if moved else ""
        print(f"WALL   {k}: {a:.2f}s -> {b:.2f}s ({d:+.2f})  [{verdict}{mass_note}]")
    if flags == 0:
        print("walls: no per-query delta >0.5s — level round")


if __name__ == "__main__":
    main()
