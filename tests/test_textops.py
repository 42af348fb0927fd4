"""Training-data pipeline operators: dedup / similarity / quality."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from information_retrieval_system_spark.textops import dedup, quality, similarity


@pytest.fixture(scope="module")
def toy_docs(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = "the quick brown fox jumps over the lazy dog again and again tonight"
    rows = [
        (1, base),
        (2, base),                       # exact dup of 1
        (3, near),                       # near dup of 1
        (4, "completely different text about spark shuffle partitions merge"),
        (5, "another unrelated document mentioning joins and aggregations"),
        (6, "the quick brown fox! jumps over... the lazy dog, again and again today"),  # same tokens as 1
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_duplicates(toy_docs):
    groups = dedup.exact_duplicates(toy_docs, "text", "doc_id").collect()
    assert len(groups) == 1
    assert groups[0].n_docs == 2 and groups[0].canonical_id == 1


def test_ngram_jaccard_finds_near_dup(toy_docs):
    pairs = {(r.id_a, r.id_b): r.jaccard for r in
             dedup.ngram_jaccard_pairs(toy_docs, "text", "doc_id", n=3, threshold=0.5).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0
    assert (1, 6) in pairs and pairs[(1, 6)] == 1.0  # punctuation-invariant
    assert (1, 3) in pairs and 0.5 <= pairs[(1, 3)] < 1.0
    assert (1, 4) not in pairs


def test_minhash_lsh_pipeline(toy_docs):
    out = {(r.id_a, r.id_b) for r in
           dedup.minhash_lsh_dedup(toy_docs, "text", "doc_id", n=3, num_hashes=16,
                                   bands=4, threshold=0.5).collect()}
    assert (1, 2) in out
    assert (1, 6) in out
    assert (1, 4) not in out


def test_lsh_bucket_cap_drops_degenerate_bucket(toy_docs):
    sigs = dedup.minhash_signatures(toy_docs, "text", "doc_id", n=3, num_hashes=16)
    capped = dedup.lsh_candidate_pairs(sigs, bands=4, rows_per_band=4, max_bucket_size=1)
    # every bucket with >1 member (i.e. every pair-producing bucket) is dropped
    assert capped.count() == 0
    uncapped = dedup.lsh_candidate_pairs(sigs, bands=4, rows_per_band=4, max_bucket_size=None)
    assert uncapped.count() > 0
    over = dedup.oversized_buckets(sigs, bands=4, rows_per_band=4, max_bucket_size=1)
    assert over.count() > 0


def test_jaccard_for_candidate_pairs_matches_full(toy_docs, spark):
    """Candidate-restricted Jaccard == full-pair Jaccard on the candidates."""
    full = {(r.id_a, r.id_b): r.jaccard for r in dedup.ngram_jaccard_pairs(
        toy_docs, "text", "doc_id", n=3, threshold=0.0).collect()}
    cand = spark.createDataFrame([(1, 2), (1, 3), (1, 4)], "id_a long, id_b long")
    sh = dedup.shingle_table(toy_docs, "text", "doc_id", 3)
    got = {(r.id_a, r.id_b): r.jaccard for r in dedup.jaccard_for_candidate_pairs(
        cand, sh, threshold=0.0).collect()}
    assert set(got) <= {(1, 2), (1, 3), (1, 4)}
    for pair, j in got.items():
        assert abs(j - full[pair]) < 1e-12


def test_shingle_df_cap_and_drop_audit(toy_docs):
    sh = dedup.shingle_table(toy_docs, "text", "doc_id", 3)
    # docs 1,2,3,6 share most shingles -> df cap 3 drops the ones in all four
    dropped = dedup.dropped_shingles(sh, max_shingle_df=3)
    assert dropped.count() > 0
    capped = {(r.id_a, r.id_b): r.jaccard for r in dedup.ngram_jaccard_pairs(
        toy_docs, "text", "doc_id", n=3, threshold=0.0, max_shingle_df=3).collect()}
    full = {(r.id_a, r.id_b): r.jaccard for r in dedup.ngram_jaccard_pairs(
        toy_docs, "text", "doc_id", n=3, threshold=0.0, max_shingle_df=None).collect()}
    # capped intersections are lower bounds of the true jaccard
    for pair, j in capped.items():
        assert j <= full[pair] + 1e-12


def test_simhash_bits_bounds(toy_docs):
    with pytest.raises(ValueError):
        dedup.simhash(toy_docs, "text", "doc_id", bits=61)
    # default (60) must not overflow LongType
    assert dedup.simhash(toy_docs, "text", "doc_id").count() == 6


def test_simhash_identical_token_streams_collide(toy_docs):
    sh = {r.id: r.simhash for r in dedup.simhash(toy_docs, "text", "doc_id", bits=32).collect()}
    assert sh[1] == sh[2] == sh[6]
    assert sh[1] != sh[4]


def test_fingerprint_order_sensitive(spark):
    rows = [(1, "alpha beta gamma"), (2, "alpha beta gamma"), (3, "gamma beta alpha"),
            (4, "alpha, beta. gamma!")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fp = {r.id: r.fp for r in quality.fingerprint(df, "text", "doc_id").collect()}
    assert fp[1] == fp[2] == fp[4]   # layout-invariant
    assert fp[1] != fp[3]            # order-sensitive


def test_cosine_topk_exact_vs_lsh(spark):
    import math
    rows = []
    for i in range(50):
        v = [math.sin(i * 13 + j) for j in range(8)]
        rows.append((i, v))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = rows[7][1]
    exact = [r.vec_id for r in similarity.cosine_topk(emb, q, k=5).collect()]
    assert exact[0] == 7  # self is nearest
    approx = [r.vec_id for r in similarity.lsh_cosine_topk(emb, q, k=5, bits=2).collect()]
    assert approx[0] == 7  # query's own bucket contains itself


def test_embedding_near_dup_lsh_blocked_no_crossjoin(spark):
    import math
    rows = [(i, [math.sin(i * 13 + j) for j in range(8)]) for i in range(40)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = similarity.embedding_near_dup_pairs(emb, threshold=0.99, lsh_bits=2, dim=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    # blocked pairs are a subset of the label-free exact pairs and respect id_a < id_b
    for r in out.collect():
        assert r.id_a < r.id_b and r.cosine >= 0.99


def test_quality_and_language(spark):
    rows = [(1, "the of and in to this is a document with many english words present"),
            (2, "zzz qqq xxx yyy www")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    lid = {r.id: r.lang_pred for r in quality.language_id(df, "text", "doc_id").collect()}
    assert lid[1] == "en" and lid[2] == "unknown"
    qs = {r.id: r for r in quality.quality_score(df, "text", "doc_id").collect()}
    assert qs[1].score > qs[2].score


def test_ivf_served_split_matches_oneshot_and_prunes(spark, tmp_path):
    """IVF build/probe split: the persisted probe must (a) equal the
    one-shot path's results and (b) read only the probed cell partitions
    (a cell PartitionFilter in the scan), never re-assign the corpus."""
    import math

    rows = [(i, [math.sin(i * 13 + j) for j in range(8)]) for i in range(60)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cids = [1, 2, 3, 4]
    out_dir = str(tmp_path / "ivf")
    similarity.write_ivf_index(emb, cids, out_dir)
    q = rows[9][1]
    served = similarity.ivf_topk_served(spark, out_dir, q, k=5, n_probe=2)
    plan = served._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan
    oneshot = similarity.ivf_cosine_topk(emb, q, cids, k=5, n_probe=2)
    assert [(r.vec_id, round(r.cosine, 9)) for r in served.collect()] == \
           [(r.vec_id, round(r.cosine, 9)) for r in oneshot.collect()]


def test_lsh_multiprobe_superset(spark):
    """Multi-probe candidates are a superset of single-probe: recall can
    only rise with n_probe; probe set = bucket + Hamming-1 neighbors."""
    import math

    assert similarity.multiprobe_buckets(0b0110, bits=4, n_probe=3) == [6, 7, 4]
    rows = [(i, [math.sin(i * 13 + j) for j in range(8)]) for i in range(80)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = rows[7][1]
    single = {r.vec_id for r in similarity.lsh_cosine_topk(emb, q, k=50, bits=3).collect()}
    multi = {r.vec_id for r in
             similarity.lsh_cosine_topk(emb, q, k=50, bits=3, n_probe=3).collect()}
    assert single <= multi and 7 in multi


def test_hash_split_deterministic_and_proportional(spark):
    from information_retrieval_system_spark.textops import stats

    ids = spark.range(0, 5000).withColumnRenamed("id", "doc_id")
    a = {r.doc_id: r.split for r in stats.hash_split(ids, "doc_id").collect()}
    b = {r.doc_id: r.split for r in stats.hash_split(ids, "doc_id").collect()}
    assert a == b  # pure function of the key
    from collections import Counter
    c = Counter(a.values())
    assert abs(c["train"] / 5000 - 0.8) < 0.03
    assert abs(c["val"] / 5000 - 0.1) < 0.02
    assert abs(c["test"] / 5000 - 0.1) < 0.02


def test_kmv_distinct_estimate_accuracy(spark):
    from information_retrieval_system_spark.textops import stats

    # group 'big': 3000 distinct keys; group 'small': 10 (exact path)
    big = spark.range(0, 3000).selectExpr("'big' AS g", "id AS k")
    small = spark.range(0, 10).selectExpr("'small' AS g", "id + 900000 AS k")
    out = {r.g: (r.n_seen_capped, r.kmv_estimate)
           for r in stats.kmv_distinct(big.union(small), "k", ["g"], k=64).collect()}
    assert out["small"] == (10, 10.0)
    n, est = out["big"]
    assert n == 64 and abs(est - 3000) / 3000 < 0.3  # KMV ~1/sqrt(k-2) error


def test_simhash_near_dup_banded_equals_bruteforce(spark, toy_docs):
    """Pigeonhole banding must find EXACTLY the pairs brute-force
    Hamming comparison finds (blocking is lossless for d <= max_hamming)."""
    for d in (1, 2):
        banded = {(r.id_a, r.id_b, r.hamming) for r in dedup.simhash_near_dup_pairs(
            toy_docs, "text", "doc_id", bits=12, max_hamming=d).collect()}
        fps = {r.id: r.simhash for r in
               dedup.simhash(toy_docs, "text", "doc_id", bits=12).collect()}
        ids = sorted(fps)
        brute = {(a, b, bin(fps[a] ^ fps[b]).count("1"))
                 for i, a in enumerate(ids) for b in ids[i + 1:]
                 if bin(fps[a] ^ fps[b]).count("1") <= d}
        assert banded == brute
    # docs 1 and 6 carry identical token multisets -> distance 0 pair
    assert any(p[:2] == (1, 6) for p in banded)


def test_dedup_keep_canonical_null_text(spark):
    """NULL texts form one keep-one group (sha of NULL is NULL; a
    non-null-safe join would silently drop every null-text row)."""
    rows = [(1, "a"), (2, "a"), (3, None), (4, None), (5, "b")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kept = sorted(r.doc_id for r in
                  dedup.drop_duplicates_keep_canonical(df, "text", "doc_id").collect())
    assert kept == [1, 3, 5]


def test_embedding_near_dup_derived_bits_bound_buckets(spark):
    """The DEFAULT blocking must stay scale-safe: at N=50k the derived
    bit count keeps every LSH bucket within a small multiple of the
    target population (fixed bits would put N/2^bits=3125 rows in each
    bucket at 4 bits and grow linearly from there)."""
    import numpy as np
    from pyspark.sql import functions as F

    from information_retrieval_system_spark.textops.similarity import (
        DEFAULT_TARGET_BUCKET_ROWS, derived_lsh_bits, hyperplanes,
        lsh_bucket_expr, oversized_lsh_buckets)

    n, dim = 50_000, 8
    rng = np.random.RandomState(0)
    vecs = rng.randn(n, dim).astype(float)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    ).repartition(8)

    bits = derived_lsh_bits(n)
    assert bits == 6  # ceil(log2(50000/1024))
    planes = hyperplanes(dim, bits, 7919)
    sizes = (
        emb.select(lsh_bucket_expr(F.col("embedding"), planes).alias("_blk"))
        .groupBy("_blk").agg(F.count("*").alias("bsz"))
    ).collect()
    assert len(sizes) == 2 ** bits  # all buckets populated
    biggest = max(r.bsz for r in sizes)
    # centered data: sign-bit buckets are near-uniform; 4x target is a
    # loose bound that still catches a collapsed (fixed-bits) layout
    assert biggest <= 4 * DEFAULT_TARGET_BUCKET_ROWS
    # audit frame agrees with the raw group-by
    assert oversized_lsh_buckets(emb, planes, biggest).count() == 0
    assert oversized_lsh_buckets(emb, planes, biggest - 1).count() >= 1


def test_embedding_near_dup_bucket_cap_drops_cluster(spark):
    """max_bucket_size excludes a degenerate all-identical cluster from
    pairing while normal buckets still pair."""
    import numpy as np

    from information_retrieval_system_spark.textops.similarity import (
        embedding_near_dup_pairs)

    rng = np.random.RandomState(1)
    rows = [(i, [float(x) for x in rng.randn(4)]) for i in range(50)]
    rows += [(1000 + i, [1.0, 0.0, 0.0, 0.0]) for i in range(30)]  # heavy cluster
    rows += [(2000, [0.0, 1.0, 0.0, 0.0]), (2001, [0.0, 1.0, 0.0, 0.0])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    uncapped = embedding_near_dup_pairs(emb, threshold=0.999, lsh_bits=2)
    capped = embedding_near_dup_pairs(emb, threshold=0.999, lsh_bits=2,
                                      max_bucket_size=20)
    ids_capped = {(r.id_a, r.id_b) for r in capped.collect()}
    ids_uncapped = {(r.id_a, r.id_b) for r in uncapped.collect()}
    # the 30-strong cluster pairs only without the cap
    assert any(a >= 1000 and b < 2000 for a, b in ids_uncapped)
    assert not any(a >= 1000 and b < 2000 for a, b in ids_capped)
    assert ids_capped <= ids_uncapped


def test_connected_components_planted_clusters(spark):
    """Chain, triangle, isolated pair -> three components labeled by
    their minimum ids; fixpoint reached regardless of edge direction."""
    from information_retrieval_system_spark.textops.dedup import (
        connected_components)

    pairs = spark.createDataFrame(
        # chain 1-2-3-4 (mixed direction), triangle 10-11-12, pair 20-21
        [(2, 1), (2, 3), (4, 3), (10, 11), (11, 12), (10, 12), (21, 20)],
        "id_a long, id_b long",
    )
    got = {(r.id, r.component)
           for r in connected_components(pairs).collect()}
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1),
                   (10, 10), (11, 10), (12, 10), (20, 20), (21, 20)}


def test_batch_conjunctive_matches_per_query(spark, sf_small):
    """The in-plan batch strict-AND equals the per-query driver-checked
    conjunctive_search for every qid, including the absent-term query."""
    from information_retrieval_system_spark import entry_queries as EQ
    from information_retrieval_system_spark.query.scoring import (
        batch_conjunctive_search, conjunctive_search)

    ix = EQ.get_index(spark, sf_small)
    queries = {1: ["spark", "join"], 2: ["zzznotfound"],
               3: ["table", "hash", "merge"]}
    qt = spark.createDataFrame(
        [(q, t, 1.0) for q, ts in queries.items() for t in ts],
        "qid long, term string, qtf double")
    batch = batch_conjunctive_search(ix, qt, k=1000)
    got = {q: sorted(r.doc_id for r in rows) for q, rows in
           __import__("itertools").groupby(
               sorted(batch.collect(), key=lambda r: (r.qid, r.doc_id)),
               key=lambda r: r.qid)}
    for q, ts in queries.items():
        one = spark.createDataFrame([(t, 1.0) for t in ts],
                                    "term string, qtf double")
        ref = sorted(r.doc_id for r in
                     conjunctive_search(ix, one, k=1000).collect())
        assert got.get(q, []) == ref


def test_connected_components_long_chain_pointer_jumping(spark):
    """A 60-node chain converges well inside max_iters thanks to the
    path-halving step (plain min-propagation would need 59 rounds)."""
    from information_retrieval_system_spark.textops.dedup import (
        connected_components)

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 60)], "id_a long, id_b long")
    out = connected_components(pairs, max_iters=10)
    got = {(r.id, r.component) for r in out.collect()}
    assert got == {(i, 1) for i in range(1, 61)}


def test_near_dedup_keep_consistent_on_chain(spark):
    """Keep-one-per-cluster keeps exactly the component minima: on a
    synthetic chain A~B~C, pairwise keep-canonical would keep {A, C}
    (C is canonical of pair (B,C)) but the transitive filter keeps
    only A."""
    from pyspark.sql import functions as F

    from information_retrieval_system_spark.textops.dedup import (
        connected_components)

    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    comp = connected_components(pairs)
    losers = comp.filter(F.col("id") != F.col("component"))
    assert {r.id for r in losers.collect()} == {2, 3}


def test_prefix_suggest_plan_and_values(spark, sf_small):
    """Suggestions are df-ordered under each prefix; the plan contains
    no nested-loop join (each prefix is its own pushed-down scan)."""
    from information_retrieval_system_spark import entry_queries as EQ
    from information_retrieval_system_spark.query.suggest import (
        suggest_prefixes)

    ix = EQ.get_index(spark, sf_small)
    out = suggest_prefixes(ix.terms.select("term", "df"), ["s", "zz"], k=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    rows = [r for r in out.collect() if r.prefix == "s"]
    assert all(t.term.startswith("s") for t in rows)
    dfs = [r.df for r in sorted(rows, key=lambda r: r.rank)]
    assert dfs == sorted(dfs, reverse=True) and 1 <= len(rows) <= 3
    assert not [r for r in out.collect() if r.prefix == "zz"]


def test_embedding_near_dup_empty_input(spark):
    """Empty frame with derived lsh_bits: short-circuits to an empty
    pair set instead of TypeError-ing on dim=None (round-4 ADVICE)."""
    from information_retrieval_system_spark.textops.similarity import (
        embedding_near_dup_pairs)

    emb = spark.createDataFrame([], "vec_id long, embedding array<float>")
    out = embedding_near_dup_pairs(emb, threshold=0.9)
    assert out.columns == ["id_a", "id_b", "cosine"]
    assert out.count() == 0
    assert out.schema["id_a"].dataType.simpleString() == "bigint"


def test_quality_stratified_sample_deterministic(spark, sf_small):
    """The sample is a pure function of (id, score): invariant under
    repartitioning and re-execution, honors rate ordering (higher band
    keeps proportionally more), and rate-1.0 band keeps everything."""
    from pyspark.sql import functions as F

    from information_retrieval_system_spark.entry_textops import SAMPLE_RATES
    from information_retrieval_system_spark.textops.quality import quality_score
    from information_retrieval_system_spark.textops.stats import (
        quality_stratified_sample)

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    scored = quality_score(docs, "text", "doc_id").select("id", "score")
    a = sorted(r.id for r in quality_stratified_sample(scored, SAMPLE_RATES).collect())
    b = sorted(r.id for r in quality_stratified_sample(
        scored.repartition(13), SAMPLE_RATES).collect())
    assert a == b and len(a) > 0
    # a band with rate 1.0 keeps every member
    full_band = scored.filter(F.round(F.col("score") * 4) == 4)
    kept = quality_stratified_sample(full_band, SAMPLE_RATES)
    assert kept.count() == full_band.count()
    # a different salt draws a different (but same-law) sample
    c = sorted(r.id for r in quality_stratified_sample(
        scored, SAMPLE_RATES, salt="other").collect())
    assert c != a


def test_kmeans_trained_ivf_recall_and_determinism(spark, tmp_path):
    """Distributed Lloyd trainer (r5 verdict #3): on a corpus with 4
    well-separated synthetic clusters, 2 iterations from hash seeds must
    (a) be deterministic across runs, (b) give the trained-IVF probe
    recall@5 >= 0.8 vs exact cosine top-k, and (c) serve through the
    written cell-partitioned layout identically to the in-memory path."""
    import math

    # 4 separated clusters on distinct axes + small deterministic jitter
    def vec(i):
        c = i % 4
        base = [0.0] * 8
        base[c * 2] = 1.0
        return [b + 0.05 * math.sin(i * 7 + j) for j, b in enumerate(base)]

    rows = [(i, vec(i)) for i in range(80)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = similarity.kmeans_train(emb, k=4, iters=2)
    assert similarity.kmeans_train(emb, k=4, iters=2) == cents  # deterministic
    assert len(cents) == 4 and all(len(cv) == 8 for _, cv in cents)

    q = rows[13][1]
    exact = [r.vec_id for r in similarity.cosine_topk(emb, q, k=5).collect()]
    approx = [r.vec_id
              for r in similarity.ivf_trained_topk(emb, cents, q, k=5, n_probe=2).collect()]
    assert len(set(exact) & set(approx)) >= 4  # recall@5 >= 0.8

    out_dir = str(tmp_path / "ivf_trained")
    similarity.write_ivf_index_trained(emb, cents, out_dir)
    served = similarity.ivf_topk_served(spark, out_dir, q, k=5, n_probe=2)
    assert [(r.vec_id, round(r.cosine, 9)) for r in served.collect()] == \
        [(r.vec_id, round(r.cosine, 9))
         for r in similarity.ivf_trained_topk(emb, cents, q, k=5, n_probe=2).collect()]


def test_kmeans_empty_cell_keeps_centroid(spark):
    """A centroid that attracts no members keeps its previous vector
    instead of crashing or going to NaN."""
    rows = [(i, [1.0 + 0.01 * i, 0.0]) for i in range(10)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = similarity.kmeans_train(emb, k=3, iters=2)
    assert len(cents) == 3
    for _, cv in cents:
        assert all(not math.isnan(x) for x in cv)


def test_decontaminate_planted_overlap(spark):
    """A train doc sharing an 8-gram with the eval set is flagged with
    the exact overlap count/fraction; clean docs don't appear."""
    from information_retrieval_system_spark.textops.dedup import decontaminate

    eval_rows = [(100, "the quick brown fox jumps over the lazy dog tonight")]
    train_rows = [
        # shares the full 8-gram window with the eval doc
        (1, "prefix words the quick brown fox jumps over the lazy dog"),
        (2, "completely different content with no overlapping ngrams here at all ok"),
        (3, "the quick brown fox jumps over the lazy dog tonight"),  # verbatim
    ]
    ev = spark.createDataFrame(eval_rows, "doc_id long, text string")
    tr = spark.createDataFrame(train_rows, "doc_id long, text string")
    out = {r.id: r for r in decontaminate(tr, ev, n=8).collect()}
    assert set(out) == {1, 3}
    # doc 1: tokens=11 -> 4 shingles of 8; the last 2 lie inside the eval text
    assert (out[1].n_overlap, out[1].n_shingles) == (2, 4)
    # doc 3 is verbatim: every one of its shingles is contaminated
    assert out[3].n_overlap == out[3].n_shingles
    assert out[3].overlap_frac == 1.0


def test_decontaminate_no_overlap_empty(spark):
    from information_retrieval_system_spark.textops.dedup import decontaminate

    ev = spark.createDataFrame([(1, "alpha beta gamma delta")], "doc_id long, text string")
    tr = spark.createDataFrame([(2, "zeta eta theta iota")], "doc_id long, text string")
    assert decontaminate(tr, ev, n=3).count() == 0


def test_mix_report_rollup_totals(spark):
    from information_retrieval_system_spark.textops.stats import mix_report

    rows = [
        ("web", "en", "one two three"),
        ("web", "en", "four five"),
        ("web", "de", "sechs sieben"),
        ("book", "en", "eight"),
    ]
    df = spark.createDataFrame(rows, "source string, lang string, text string")
    out = {(r.source, r.lang): r for r in mix_report(df, ["source", "lang"]).collect()}
    assert out[("web", "en")].n_docs == 2 and out[("web", "en")].n_tokens == 5
    assert out[("web", "<all>")].n_docs == 3 and out[("web", "<all>")].n_tokens == 7
    assert out[("<all>", "<all>")].n_docs == 4 and out[("<all>", "<all>")].n_tokens == 8
    assert out[("book", "en")].n_chars == len("eight")
    assert len(out) == 3 + 2 + 1  # leaf groups + per-source + grand total


def test_redact_pii_counts_and_idempotence(spark):
    rows = [
        (1, "reach me at bob.smith+x@corp.example.com or 192.168.1.10 tel 415-555-1234"),
        (2, "no pii here just words"),
        (3, "two mails a@b.io c@d.org one ip 10.0.0.1"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.id: r for r in quality.redact_pii(df, "text", "doc_id").collect()}
    assert (out[1].n_email, out[1].n_ip, out[1].n_phone) == (1, 1, 1)
    assert out[1].redacted == "reach me at <EMAIL> or <IP> tel <PHONE>"
    assert (out[2].n_email, out[2].n_ip, out[2].n_phone) == (0, 0, 0)
    assert out[2].redacted == "no pii here just words"
    assert (out[3].n_email, out[3].n_ip) == (2, 1)
    # idempotent: placeholders contain nothing any pattern matches
    red = spark.createDataFrame([(1, out[1].redacted)], "doc_id long, text string")
    again = quality.redact_pii(red, "text", "doc_id").collect()[0]
    assert again.redacted == out[1].redacted
    assert (again.n_email, again.n_ip, again.n_phone) == (0, 0, 0)


def test_cap_per_group_matches_naive_window_on_skew(spark):
    from pyspark.sql import Window
    from information_retrieval_system_spark.textops.stats import cap_per_group

    # one hot group (80 rows), two small ones (3 rows each, < k)
    rows = [(i, "hot", (i * 37) % 100) for i in range(80)]
    rows += [(100 + i, "small_a", i) for i in range(3)]
    rows += [(200 + i, "small_b", 5) for i in range(3)]  # full tie: id breaks
    df = spark.createDataFrame(rows, "id long, grp string, score long")
    order = [F.desc("score"), F.asc("id")]

    got = cap_per_group(df, "grp", order, k=7, id_col="id", salt_buckets=4)
    naive = (
        df.withColumn("rank", F.row_number().over(
            Window.partitionBy("grp").orderBy(*order)))
        .filter(F.col("rank") <= 7)
    )
    key = lambda r: (r.grp, r.rank)
    g = {key(r): r.id for r in got.collect()}
    n = {key(r): r.id for r in naive.collect()}
    assert g == n
    assert sum(1 for (grp, _) in g if grp == "hot") == 7
    assert sum(1 for (grp, _) in g if grp == "small_a") == 3


def test_pack_stream_matches_naive_cumsum(spark):
    from pyspark.sql import Window
    from information_retrieval_system_spark.textops.stats import pack_stream

    rows = [(i, (i * 13) % 97 + 1) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, n long").repartition(7)

    got = {r.id: (r.cum_excl, r.bin, r.bin_offset) for r in
           pack_stream(df, "n", "id", budget=64, num_ranges=5).collect()}
    w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, -1)
    naive = {r.id: (r.ce, r.ce // 64, r.ce % 64) for r in
             df.withColumn("ce", F.coalesce(F.sum("n").over(w), F.lit(0))).collect()}
    assert got == naive
    # stream is gapless: max cum + its tokens == total
    total = sum(n for _, n in rows)
    last = max(rows)[0]
    assert got[last][0] + dict(rows)[last] == total


def test_pack_stream_partitioning_invariance(spark):
    from information_retrieval_system_spark.textops.stats import pack_stream

    rows = [(i, (i * 7) % 31 + 1) for i in range(200)]
    a = spark.createDataFrame(rows, "id long, n long").repartition(3)
    b = spark.createDataFrame(list(reversed(rows)), "id long, n long").coalesce(1)
    ra = {r.id: r.cum_excl for r in pack_stream(a, "n", "id", 100, num_ranges=4).collect()}
    rb = {r.id: r.cum_excl for r in pack_stream(b, "n", "id", 100, num_ranges=9).collect()}
    assert ra == rb


def test_paragraph_dedup_marks_later_copies(spark):
    from information_retrieval_system_spark.textops.dedup import (
        paragraph_dedup, paragraph_dedup_stats)

    rows = [
        (1, 0, "alpha beta"), (1, 1, "boiler"),
        (2, 0, "boiler"), (2, 1, "gamma delta"), (2, 2, "boiler"),
        (3, 0, "unique text"),
    ]
    paras = spark.createDataFrame(
        rows, "doc_id long, para_idx long, para_text string")
    marked = {(r.doc_id, r.para_idx): r.is_dup
              for r in paragraph_dedup(paras).collect()}
    # first occurrence of "boiler" is (1,1); (2,0) and (2,2) are dups
    assert marked == {(1, 0): False, (1, 1): False,
                      (2, 0): True, (2, 1): False, (2, 2): True,
                      (3, 0): False}
    stats = {r.doc_id: (r.n_paras, r.n_dup_paras, r.dup_ratio)
             for r in paragraph_dedup_stats(paras).collect()}
    assert stats[1] == (2, 0, 0.0)
    assert stats[2] == (3, 2, 0.6667)
    assert stats[3] == (1, 0, 0.0)


def test_paragraph_dedup_within_doc_order(spark):
    from information_retrieval_system_spark.textops.dedup import paragraph_dedup

    # same doc, repeated paragraph: the SMALLER para_idx is canonical
    paras = spark.createDataFrame(
        [(5, 0, "x"), (5, 1, "x"), (5, 2, "x")],
        "doc_id long, para_idx long, para_text string")
    marked = {r.para_idx: r.is_dup for r in paragraph_dedup(paras).collect()}
    assert marked == {0: False, 1: True, 2: True}


def test_lsh_dedup_plan_stays_bounded(spark):
    """Regression guard for the round-6 plan blow-up: the LSH band loop
    and Jaccard verify reference their upstream DataFrames repeatedly,
    and before the localCheckpoint barriers every reference inlined the
    whole corpus-scan subtree (measured ~450 scan copies in the funnel
    plan at 600k docs).  With the barriers the physical plan must stay
    O(stages): assert a hard cap far below the blow-up regime."""
    import re

    from information_retrieval_system_spark.textops.dedup import minhash_lsh_dedup

    rows = [(i, f"tok{i % 7} tok{(i + 1) % 5} tok{(i + 2) % 3} tok{i % 2} tok4")
            for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = minhash_lsh_dedup(docs, "text", "doc_id", n=3, num_hashes=8,
                              bands=4, threshold=0.1, max_shingle_df=100,
                              max_bucket_size=50)
    plan = pairs._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    n_exchange = len(re.findall(r"\bExchange\b", plan))
    n_scan = plan.count("Scan ExistingRDD") + plan.count("LocalTableScan")
    # healthy plan measures exactly 40 Exchanges at these band/hash
    # params; the blow-up regime is hundreds — cap with small headroom
    assert n_exchange <= 48, f"plan blow-up: {n_exchange} Exchange nodes"
    # the corpus subtree must appear as checkpointed leaf scans, not as
    # repeated in-line scans of the source
    assert plan.count("parallelize") + plan.count("Range") < 10


def test_unigram_logprob_matches_handcomputed(spark):
    import math

    from information_retrieval_system_spark.textops.quality import unigram_logprob

    rows = [(1, "aa aa bb"), (2, "bb cc"), (3, "aa")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.id: (r.n_tokens, r.mean_logprob)
           for r in unigram_logprob(docs, "text", "doc_id").collect()}
    # corpus: aa x3, bb x2, cc x1, total 6
    p = {"aa": 3 / 6, "bb": 2 / 6, "cc": 1 / 6}
    exp = {
        1: (3, round((2 * math.log(p["aa"]) + math.log(p["bb"])) / 3, 4)),
        2: (2, round((math.log(p["bb"]) + math.log(p["cc"])) / 2, 4)),
        3: (1, round(math.log(p["aa"]), 4)),
    }
    assert got == exp


def test_code_quality_rules(spark):
    """Each published Stack rule drops independently; a clean multi-line
    file keeps."""
    from information_retrieval_system_spark.textops.quality import code_quality

    clean = "short line\n" * 3
    rows = [
        (1, clean.rstrip()),
        (2, clean + "x" * 1200),                  # max_line_len > 1000
        (3, clean + "y" * 999),                   # avg pushed over 100, max ok
        (4, clean + (";;;;;;;;; \n" * 180)),      # alnum_frac < 0.25
        (5, clean + "DO NOT EDIT"),               # autogen marker
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.id: r for r in code_quality(docs, "text", "doc_id").collect()}
    assert got[1].keep and not got[1].autogen
    assert not got[2].keep and got[2].max_line_len == 1200
    assert not got[3].keep and got[3].max_line_len == 999 \
        and got[3].avg_line_len > 100
    assert not got[4].keep and got[4].alnum_frac < 0.25
    assert not got[5].keep and got[5].autogen
