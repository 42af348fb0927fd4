"""Capture `.explain("formatted")` for the flagship query paths into
PLANS.md — the plan-quality audit trail (PushedFilters / PartitionFilters
/ BroadcastHashJoin / WholeStageCodegen spans, and the ABSENCE of
CartesianProduct / BroadcastNestedLoopJoin / per-row Python).

Run: ``python tools/plan_audit.py [sf_dir]`` (default sf0.001 — plan
SHAPE is scale-invariant; sizes aren't the point here).
"""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout

sys.path.insert(0, ".")

MAX_LINES = 70


def _formatted(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    lines = buf.getvalue().rstrip().splitlines()
    if len(lines) > MAX_LINES:
        lines = lines[:MAX_LINES] + [f"... ({len(lines) - MAX_LINES} more lines)"]
    return "\n".join(lines)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from information_retrieval_system_spark import entry_queries as EQ
    from information_retrieval_system_spark.session import get_spark

    spark = get_spark("plan-audit", parallelism=8, shuffle_partitions=8)

    targets = {
        "bm25_topk (in-memory index)": (
            "Broadcast the query terms and matched term-stats; two shuffles "
            "(per-doc agg + TakeOrderedAndProject). No Python anywhere."),
        "bm25_served (persisted bucket-pruned layout)": (
            "Same logical query served from parquet: the postings scan must "
            "show PartitionFilters on `bucket` (the query terms' hash "
            "buckets) and PushedFilters on term."),
        "wand_served (compressed block layout)": (
            "Blocks scan PartitionFilters on `tbucket`; dl side either "
            "semi-join-pruned (selective query) or full (head-heavy, by the "
            "Σdf bound); one cogroup into the Arrow kernel."),
        "batch_bm25 (whole query set, one plan)": (
            "qid carried through every join; one postings pass regardless "
            "of query count; per-qid window top-k."),
        "revenue_by_nation (4-table star join)": (
            "Fact-side shuffle joins on the fact keys; the nation dim is a "
            "BroadcastHashJoin; partial aggregation before the final "
            "group-by shuffle."),
        "asof_status (as-of join as union+window)": (
            "NO join operator at all: union of tagged inputs, one window "
            "shuffle per key, last(ignorenulls) carry-forward."),
        "ivf_topk (persisted probe)": (
            "Vectors scan restricted by PartitionFilters on `cell` (the "
            "probed cells); brute-force cosine only within them."),
        "minhash_signatures (one-shuffle sketch)": (
            "Explode -> ONE partial+final aggregation (min() is "
            "duplicate-insensitive, so no distinct shuffle): exactly one "
            "Exchange in the plan."),
        "s2_bm25f (field-weighted BM25)": (
            "One tokenize pass per field, union -> single weighted-tf "
            "aggregation, broadcast stats joins, TakeOrderedAndProject — "
            "the bm25_search plan with a second field folded in."),
        "prefix_suggest (vocabulary auto-complete)": (
            "Per-prefix StartsWith filter (pushes into a sorted vocabulary "
            "scan at scale) + TakeOrderedAndProject; NO "
            "BroadcastNestedLoopJoin — a prefix-table non-equi join is "
            "deliberately avoided."),
        "routed_batch_fusion (routed query set + fusion)": (
            "At most two scoring plans for the whole query set (batched "
            "WAND cogroup + exhaustive batch join) unioned into the "
            "in-plan per-qid fusion normalizer — no per-query driver "
            "round-trips."),
        "s2_bm25f_served (persisted fielded layout)": (
            "No tokenization anywhere: the fielded postings scan shows "
            "PartitionFilters on `bucket` (the query terms' hash buckets); "
            "broadcast df/query joins, one per-doc agg, "
            "TakeOrderedAndProject."),
        "corrected_routed_fusion (correction -> routing -> fusion)": (
            "The corrector is joins (deletion-variant equi-join + window "
            "top-1) feeding the routed batch plans; no vocabulary scan per "
            "query term, no BroadcastNestedLoopJoin, suggestion set never "
            "leaves the plan except the one routing collect."),
        "termdict_bm25 (id-keyed serving path)": (
            "Postings scanned WITHOUT the string term column (ReadSchema "
            "carries term_id, not term); the query side resolves strings "
            "to ids through the broadcast vocabulary — strings never "
            "shuffle."),
        "training_mix (composed curation funnel)": (
            "Quality gate -> LSH near-dedup keep -> stratified sample -> "
            "split as ONE lazily-planned flow: a single tokenize pass "
            "feeds the quality columns, the dedup keep is left-anti "
            "against the bounded LSH pair set, the sample and split are "
            "pure column filters on top — no intermediate "
            "materialization."),
        "source_cap (skew-safe per-domain cap)": (
            "Two WindowGroupLimit(Partial->Final) phases: the salted "
            "(source, salt) pre-rank bounds any task to buckets*K rows "
            "per group before the per-source re-rank — no hot-domain "
            "straggler; map-side group-limit prunes before BOTH "
            "exchanges."),
        "trigram_search (substring via gram-bucketed layout)": (
            "Postings scan shows PartitionFilters on `gbucket` (the "
            "needle grams' buckets) and PushedFilters gram IN (...); "
            "candidate agg HAVING count == n_grams; contains() verify "
            "runs only on the semi-joined candidate docs."),
        "repo_topk (per-repo rollup over uncut scores)": (
            "The bm25_scores plan (no doc-level limit) feeding one "
            "extra partial-aggregable shuffle on repo; "
            "TakeOrderedAndProject only at the repo level."),
        "symbol_search (bucketed symbol layout)": (
            "One-partition PartitionFilters on `sbucket` plus "
            "PushedFilters symbol = '...' into the parquet scan; no "
            "extraction at query time."),
    }

    q = EQ.QUERIES
    frames = {
        "bm25_topk (in-memory index)": q["bm25_topk"],
        "bm25_served (persisted bucket-pruned layout)": q["bm25_served"],
        "wand_served (compressed block layout)": q["wand_served"],
        "batch_bm25 (whole query set, one plan)": q["batch_bm25"],
        "revenue_by_nation (4-table star join)": q["revenue_by_nation"],
        "asof_status (as-of join as union+window)": q["asof_status"],
        "ivf_topk (persisted probe)": q["ivf_topk"],
        "minhash_signatures (one-shuffle sketch)": q["minhash_signatures"],
        "s2_bm25f (field-weighted BM25)": q["s2_bm25f"],
        "prefix_suggest (vocabulary auto-complete)": q["prefix_suggest"],
        "routed_batch_fusion (routed query set + fusion)": q["routed_batch_fusion"],
        "s2_bm25f_served (persisted fielded layout)": q["s2_bm25f_served"],
        "corrected_routed_fusion (correction -> routing -> fusion)": q["corrected_routed_fusion"],
        "termdict_bm25 (id-keyed serving path)": q["termdict_bm25"],
        "training_mix (composed curation funnel)": q["training_mix"],
        "source_cap (skew-safe per-domain cap)": q["source_cap"],
        "trigram_search (substring via gram-bucketed layout)": q["trigram_search"],
        "repo_topk (per-repo rollup over uncut scores)": q["repo_topk"],
        "symbol_search (bucketed symbol layout)": q["symbol_search"],
    }

    out = [
        "# PLANS — formatted physical plans of the flagship paths",
        "",
        f"Generated by `python tools/plan_audit.py {sf_dir}`.  Plan shape is",
        "what's audited (scan pruning, join strategies, codegen spans);",
        "regenerate after any plan-affecting change.",
        "",
    ]
    for name, fn in frames.items():
        df = fn(spark, sf_dir)
        out += [f"## {name}", "", targets[name], "", "```", _formatted(df), "```", ""]

    with open("PLANS.md", "w") as f:
        f.write("\n".join(out))
    print(f"PLANS.md written ({len(frames)} plans)")


if __name__ == "__main__":
    main()
