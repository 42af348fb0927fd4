"""Dump `.explain("formatted")` for the round-7 touched registry queries
into plans/r07/<query>_<tag>.txt.

Usage: python tools/dump_plans_r07.py <tag> [query ...]
(tag = "before" or "after"; default query list below)
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT = [
    "bm25_topk", "vsm_topk", "termdict_bm25", "batch_bm25", "term_df",
    "near_dedup_keep", "training_mix", "dedup_components",
    "unigram_logprob", "trigram_search", "batch_trigram_search",
    "appended_trigram_search", "minhash_signatures", "stopword_stats",
]


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

    from information_retrieval_system_spark import entry_queries as EQ
    from information_retrieval_system_spark.session import get_spark

    spark = get_spark("plan-dump-r07", parallelism=8, shuffle_partitions=8)
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r07")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        fn = EQ.QUERIES[name]
        try:
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            txt = buf.getvalue()
        except Exception as e:  # pragma: no cover
            txt = f"ERROR building plan: {e}"
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(txt)
        print(f"wrote {name}_{tag}.txt ({len(txt.splitlines())} lines)")


if __name__ == "__main__":
    main()
