"""Trigram substring/regex search (index/trigram.py).

The prefilter is only an optimization: every test asserts the trigram
path returns EXACTLY the full-scan ground truth, including the cases
engineered to stress it (shared trigrams without the substring, rarest-
gram subsetting, short-needle fallback, no-literal regex fallback)."""

from __future__ import annotations

import pytest

from information_retrieval_system_spark.index.trigram import (
    _needle_grams,
    regex_required_literals,
    regex_search,
    substring_search,
    trigram_df_stats,
    trigram_postings,
)

DOCS = [
    (0, "spark join merge window"),
    (1, "join spark batch"),          # has all of "spark"/"join" grams but
                                      # not the substring "spark join"
    (2, "sparse joint sparkling"),    # shares spa/par/ark/joi/oin grams
    (3, "spark join"),
    (4, "xy"),                        # below trigram length
    (5, "merge spark join merge"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


@pytest.fixture(scope="module")
def posts(spark, docs):
    return trigram_postings(docs, "text", "doc_id").cache()


def _truth_contains(needle):
    return {i for i, t in DOCS if needle in t}


def test_postings_are_distinct_per_doc(posts):
    # doc 5 repeats "merge" — gram "mer" must appear once for it
    rows = posts.filter("gram = 'mer'").collect()
    assert sorted(r.doc_id for r in rows) == [0, 5]


def test_substring_matches_ground_truth(posts, docs):
    for needle in ["spark join", "merge", "joint", "park"]:
        got = {r.doc_id for r in
               substring_search(posts, docs, needle, "text", "doc_id").collect()}
        assert got == _truth_contains(needle), needle


def test_substring_candidate_not_match_is_filtered(posts, docs):
    # doc 1 contains every trigram of "spark join" except the bridge
    # grams ("k j", "rk ", " jo"...)?  Build a needle whose grams doc 2
    # ALL has but not contiguously: "spar" + verify stage must drop it
    got = {r.doc_id for r in
           substring_search(posts, docs, "spark jo", "text", "doc_id").collect()}
    assert got == _truth_contains("spark jo")


def test_short_needle_full_scan_fallback(posts, docs):
    got = {r.doc_id for r in
           substring_search(posts, docs, "xy", "text", "doc_id").collect()}
    assert got == {4}


def test_rarest_gram_subset_stays_exact(posts, docs):
    got = {r.doc_id for r in
           substring_search(posts, docs, "spark join", "text", "doc_id",
                            max_grams=2).collect()}
    assert got == _truth_contains("spark join")


def test_absent_gram_empties_candidates(posts, docs):
    got = substring_search(posts, docs, "zzz never", "text", "doc_id").collect()
    assert got == []


def test_regex_literal_extraction():
    cases = {
        "spark [a-z]+ join": ["spark ", " join"],
        "merge.batch": ["merge", "batch"],
        "colou?r": ["colo", "r"],
        "a+bc": ["a", "bc"],
        "foo(bar)?": [],       # groups -> no safe prefilter
        "foo|bar": [],         # alternation -> no safe prefilter
        "\\d+ items": [" items"],
        "file\\.py": ["file.py"],
        "x{2,3}y": ["y"],      # conservative: brace-quantified atom dropped
        "[abc]def": ["def"],
        "wild.*card": ["wild", "card"],
    }
    for pat, exp in cases.items():
        assert regex_required_literals(pat) == exp, pat


def test_regex_search_matches_rlike(posts, docs):
    import re

    for pat in ["spark [a-z]+ merge", "jo(in|int)", "sparkl?ing"]:
        got = {r.doc_id for r in
               regex_search(posts, docs, pat, "text", "doc_id").collect()}
        truth = {i for i, t in DOCS if re.search(pat, t)}
        assert got == truth, pat


def test_df_stats_counts_docs_once(posts):
    stats = {r.gram: r.df for r in trigram_df_stats(posts, top_n=10_000).collect()}
    truth: dict[str, int] = {}
    for _, t in DOCS:
        for g in {t[i:i + 3] for i in range(len(t) - 2)}:
            truth[g] = truth.get(g, 0) + 1
    assert stats == truth


def test_bucketed_roundtrip_prunes_partitions(spark, docs, tmp_path):
    from information_retrieval_system_spark.index.trigram import (
        read_trigram_index,
        write_trigram_index,
    )

    out = str(tmp_path / "tri")
    write_trigram_index(trigram_postings(docs, "text", "doc_id"), out,
                        gram_buckets=4)
    served = read_trigram_index(spark, out)
    got = {r.doc_id for r in
           substring_search(served, docs, "spark join", "text", "doc_id",
                            gram_buckets=4).collect()}
    assert got == _truth_contains("spark join")
    # the candidate scan must carry a PartitionFilters entry on gbucket
    cand = served.filter(served.gbucket.isin([0, 1]))
    plan = cand._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert "PartitionFilters" in plan


def test_glob_search_matches_fnmatch_substring(posts, docs):
    import re

    from information_retrieval_system_spark.index.trigram import (
        glob_search,
        glob_to_regex,
    )

    # escaped-literal round trip: regex metachars in the glob are literal
    assert glob_to_regex("a.b*c?d") == "a\\.b.*c.d"
    for pat in ["spark*join", "merge?window", "spa*ing"]:
        got = {r.doc_id for r in
               glob_search(posts, docs, pat, "text", "doc_id").collect()}
        truth = {i for i, t in DOCS if re.search(glob_to_regex(pat), t)}
        assert got == truth, pat


def test_batch_substring_matches_per_needle(posts, docs):
    from information_retrieval_system_spark.index.trigram import (
        batch_substring_search,
    )

    needles = {1: "spark join", 2: "merge", 3: "zzz never", 4: "xy"}
    got = {(r.qid, r.doc_id) for r in
           batch_substring_search(posts, docs, needles, "text",
                                  "doc_id").collect()}
    truth = {(q, i) for q, n in needles.items()
             for i, t in DOCS if n in t}
    assert got == truth
    assert not any(q == 3 for q, _ in got)    # no-hit needle stays empty
    assert (4, 4) in got                      # short needle via full-scan branch


def test_grep_lines_numbers_and_restriction(spark, posts):
    from information_retrieval_system_spark.index.trigram import grep_lines

    rows = [(1, "alpha\nspark join here\nomega\nspark join again"),
            (2, "no match\nat all"),
            (3, "spark join")]
    mdocs = spark.createDataFrame(rows, "doc_id long, text string")
    from information_retrieval_system_spark.index.trigram import trigram_postings
    mposts = trigram_postings(mdocs, "text", "doc_id")
    got = {(r.doc_id, r.line_no, r.line) for r in
           grep_lines(mposts, mdocs, "spark join", "text", "doc_id").collect()}
    assert got == {(1, 1, "spark join here"), (1, 3, "spark join again"),
                   (3, 0, "spark join")}


def test_regex_literal_extraction_fuzz_required_property():
    """THE correctness property of the conservative Cox extraction:
    for any pattern P and any string S matched by P, every literal in
    regex_required_literals(P) must appear verbatim in S.  Fuzzed over
    a deterministic grammar of atoms x quantifiers (pure Python, no
    Spark)."""
    import itertools
    import random
    import re

    rng = random.Random(60)
    atoms = ["abc", "de", "f", "[xy]", "\\d", ".", "gh\\.i", "jk"]
    quants = ["", "", "", "?", "*", "+", "{1,2}", "{0,2}"]
    # string alphabet biased toward the literals so matches happen
    fill = ["abc", "de", "f", "x", "y", "7", ".", "gh.i", "jk", "q", " "]

    checked = 0
    for trial in range(300):
        pat = "".join(rng.choice(atoms) + rng.choice(quants)
                      for _ in range(rng.randint(1, 4)))
        try:
            cre = re.compile(pat)
        except re.error:
            continue
        lits = regex_required_literals(pat)
        for _ in range(20):
            s = "".join(rng.choice(fill) for _ in range(rng.randint(0, 12)))
            if cre.search(s):
                checked += 1
                for lit in lits:
                    assert lit in s, (pat, lits, s)
    assert checked > 200  # the fuzz actually exercised matches


def test_append_delta_equals_full_build(spark, tmp_path):
    from information_retrieval_system_spark.index.trigram import (
        append_trigram_delta,
        read_gram_df,
        read_trigram_index,
        substring_search,
        trigram_postings,
        write_trigram_index,
    )

    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    first = docs.filter("doc_id < 3")
    rest = docs.filter("doc_id >= 3")
    out = str(tmp_path / "tri")
    write_trigram_index(trigram_postings(first, "text", "doc_id"), out,
                        gram_buckets=4)
    append_trigram_delta(rest, out, "text", "doc_id", gram_buckets=4)
    posts = read_trigram_index(spark, out)
    gdf = read_gram_df(spark, out)
    got = {r.doc_id for r in
           substring_search(posts, docs, "spark join", "text", "doc_id",
                            gram_buckets=4, gram_df=gdf).collect()}
    assert got == _truth_contains("spark join")
    # gramdf must reflect old + new (doc 5 arrived in the delta)
    dfs = {r.gram: r.df for r in gdf.filter("gram = 'mer'").collect()}
    assert dfs == {"mer": 2}


def test_fold_case_substring(spark):
    from information_retrieval_system_spark.index.trigram import (
        substring_search,
        trigram_postings,
    )

    rows = [(1, "SPARK Join merge"), (2, "spark join"), (3, "no match")]
    mdocs = spark.createDataFrame(rows, "doc_id long, text string")
    ci_posts = trigram_postings(mdocs, "text", "doc_id", fold_case=True)
    got = {r.doc_id for r in
           substring_search(ci_posts, mdocs, "Spark JOIN", "text", "doc_id",
                            fold_case=True).collect()}
    assert got == {1, 2}
    cs_posts = trigram_postings(mdocs, "text", "doc_id")
    got_cs = {r.doc_id for r in
              substring_search(cs_posts, mdocs, "spark join", "text",
                               "doc_id").collect()}
    assert got_cs == {2}
