#!/usr/bin/env python
"""Compare two TREC-format run files for top-k parity (docs/msmarco_runbook.md §4).

Usage: python tools/compare_runs.py oracle.run candidate.run --k 100

Reports per-query top-k doc-set overlap (order-insensitive), rank-aware
(Kendall-style pair agreement over the intersection), and score-delta stats
for docs present in both runs. Lists queries whose differences are NOT
explained by score ties — i.e. a doc appears in only one run although its
score there differs from every score at the boundary (a genuine ranking
divergence, not a tie permutation).

TREC run line: qid Q0 docid rank score tag
"""

from __future__ import annotations

import argparse
import json
import sys
from collections import defaultdict


def load(path: str, k: int):
    runs: dict[str, list[tuple[str, float]]] = defaultdict(list)
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) < 6:
                continue
            qid, _q0, docid, _rank, score = parts[:5]
            if len(runs[qid]) < k:
                runs[qid].append((docid, float(score)))
    return runs


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("oracle")
    ap.add_argument("candidate")
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--tie-eps", type=float, default=1e-4,
                    help="relative score distance treated as a tie")
    args = ap.parse_args()

    a = load(args.oracle, args.k)
    b = load(args.candidate, args.k)
    qids = sorted(set(a) & set(b))
    if not qids:
        print(json.dumps({"error": "no shared qids"}))
        return 1

    overlaps, pair_agree, deltas = [], [], []
    unexplained: list[str] = []
    for qid in qids:
        ra, rb = a[qid], b[qid]
        sa = {d: s for d, s in ra}
        sb = {d: s for d, s in rb}
        inter = set(sa) & set(sb)
        denom = max(min(len(ra), len(rb)), 1)
        ov = len(inter) / denom
        overlaps.append(ov)
        for d in inter:
            deltas.append(abs(sa[d] - sb[d]) / max(abs(sa[d]), 1e-9))
        # rank-aware: fraction of intersection pairs ordered identically
        pos_a = {d: i for i, (d, _s) in enumerate(ra) if d in inter}
        pos_b = {d: i for i, (d, _s) in enumerate(rb) if d in inter}
        docs = sorted(inter, key=lambda d: pos_a[d])
        agree = tot = 0
        for i in range(len(docs)):
            for j in range(i + 1, len(docs)):
                tot += 1
                if pos_b[docs[i]] < pos_b[docs[j]]:
                    agree += 1
        if tot:
            pair_agree.append(agree / tot)
        if ov < 1.0:
            # a miss is tie-explained when the missing doc's oracle score
            # is within tie-eps of the candidate's boundary (k-th) score
            boundary = min(s for _d, s in rb) if rb else 0.0
            for d in set(sa) - set(sb):
                if abs(sa[d] - boundary) > args.tie_eps * max(
                    abs(boundary), 1e-9
                ):
                    unexplained.append(
                        f"{qid}: oracle has {d} @ {sa[d]:.6f}, candidate "
                        f"boundary {boundary:.6f}"
                    )
                    break

    n = len(qids)
    overlaps.sort()
    out = {
        "queries": n,
        "mean_overlap": round(sum(overlaps) / n, 6),
        "min_overlap": round(overlaps[0], 6),
        "p01_overlap": round(overlaps[max(0, n // 100 - 1)], 6),
        "mean_pair_agreement": round(
            sum(pair_agree) / max(len(pair_agree), 1), 6
        ),
        "score_delta_mean": round(sum(deltas) / max(len(deltas), 1), 9),
        "score_delta_max": round(max(deltas), 9) if deltas else 0.0,
        "unexplained_divergences": len(unexplained),
    }
    print(json.dumps(out))
    for line in unexplained[:20]:
        print("  DIVERGENT", line, file=sys.stderr)
    return 0 if not unexplained else 2


if __name__ == "__main__":
    sys.exit(main())
