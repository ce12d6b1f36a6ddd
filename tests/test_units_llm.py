"""Golden and cross-formulation tests for the LLM-pipeline operators."""

from __future__ import annotations

import pyspark.sql.functions as F

from pg_telemetry_spark.operators.minhash import (
    lsh_candidate_pairs,
    minhash_signatures,
    near_duplicates,
    with_shingle_hashes,
    with_shingles,
)
from pg_telemetry_spark.queries.llm import _DUP_OFFSET, _near_dup_corpus


def test_near_dup_recovers_injected_pairs(spark, sf_dir):
    """Every injected (doc, mutated-doc) pair must be found, and every
    reported pair must clear the Jaccard threshold."""
    corpus = _near_dup_corpus(spark, sf_dir)
    found = near_duplicates(corpus, threshold=0.5)
    pairs = {(r.id1, r.id2) for r in found.collect()}
    injected = {
        (r.doc_id, r.doc_id + _DUP_OFFSET)
        for r in corpus.filter(F.col("doc_id") < _DUP_OFFSET)
        .filter(F.col("doc_id") % 7 == 0)
        .collect()
    }
    missing = injected - pairs
    assert not missing, f"LSH missed {len(missing)} injected near-dup pairs: {sorted(missing)[:5]}"
    # sanity: thresholds respected
    assert found.filter(F.col("jaccard") < 0.5).count() == 0


def test_near_dup_deterministic(spark, sf_dir):
    corpus = _near_dup_corpus(spark, sf_dir)
    a = sorted((r.id1, r.id2, r.jaccard) for r in near_duplicates(corpus).collect())
    b = sorted((r.id1, r.id2, r.jaccard) for r in near_duplicates(corpus).collect())
    assert a == b


def test_builtin_shingles_agree_with_pandas_variant(spark, sf_dir):
    """operators/minhash.with_shingles (JVM) vs udf_map_batches
    (mapInPandas) must produce identical shingle sets."""
    from pg_telemetry_spark.queries.udfs import udf_map_batches
    from pg_telemetry_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    jvm = {
        (r.doc_id, s)
        for r in with_shingles(docs).select("doc_id", "shingles").collect()
        for s in r.shingles
    }
    py = {
        (r.doc_id, r.shingle)
        for r in udf_map_batches(spark, sf_dir).filter(F.col("doc_id") < 50).collect()
    }
    assert jvm == py


def test_lsh_candidates_superset_of_exact_dupes(spark, sf_dir):
    """Exact duplicates (Jaccard 1.0) must always be LSH candidates."""
    from pg_telemetry_spark.queries.llm import _dup_corpus

    corpus = _dup_corpus(spark, sf_dir)
    sig = minhash_signatures(with_shingle_hashes(corpus))
    cands = {(r.id1, r.id2) for r in lsh_candidate_pairs(sig).collect()}
    injected = {
        (r.doc_id, r.doc_id + _DUP_OFFSET)
        for r in corpus.filter((F.col("doc_id") % 7 == 0) & (F.col("doc_id") < _DUP_OFFSET)).collect()
    }
    assert injected <= cands


def test_hot_bucket_cap_bounds_candidates(spark):
    """Boilerplate skew: 30% of docs share one long identical prefix,
    so their minhash band slices collide and pile into the same LSH
    buckets.  Uncapped, that is O(k²) candidate pairs from the hot
    buckets; with the cap the bucket is dropped pre-join and the
    candidate count stays bounded.  (AQE splits the shuffle partitions
    of a hot bucket but NOT the pair count — only the cap does.)"""
    words = "alpha bravo charlie delta echo foxtrot golf hotel india juliet".split()
    prefix = " ".join(words * 12)  # ~700 chars, dwarfs any suffix
    rows = []
    for i in range(300):  # hot cohort: identical prefix, tiny unique tail
        rows.append((i, f"{prefix} tail{i}"))
    for i in range(300, 1000):  # background: unrelated texts
        rows.append((i, " ".join(f"w{i}x{j}" for j in range(40))))
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    sig = minhash_signatures(with_shingle_hashes(docs))

    uncapped = lsh_candidate_pairs(sig, max_bucket_size=None).count()
    capped = lsh_candidate_pairs(sig, max_bucket_size=20).count()
    # hot cohort alone contributes ~300*299/2 ≈ 45k uncapped pairs;
    # capped, each surviving bucket adds ≤ 20*19/2 pairs (measured
    # ~4.5k total: the cohort's tail-shingle sub-buckets)
    assert uncapped > 40_000, f"skew fixture not hot enough: {uncapped}"
    assert capped < 6_000, f"cap did not bound candidates: {capped}"
    assert capped < uncapped / 5


def test_incremental_dedup_equals_full_rebuild(spark, sf_dir):
    """Index the original docs once, then dedup the injected-copy delta
    incrementally: base pairs + delta pairs must equal a full rebuild
    over the whole corpus — the invariant that lets continuous ingest
    skip re-scanning history."""
    from pg_telemetry_spark.operators.minhash import (
        incremental_near_duplicates,
        lsh_index,
        near_duplicates,
    )

    corpus = _near_dup_corpus(spark, sf_dir)
    base = corpus.filter(F.col("doc_id") < _DUP_OFFSET)
    delta = corpus.filter(F.col("doc_id") >= _DUP_OFFSET)

    full = {
        (r.id1, r.id2, r.jaccard)
        for r in near_duplicates(corpus, threshold=0.5).collect()
    }
    base_pairs = {
        (r.id1, r.id2, r.jaccard)
        for r in near_duplicates(base, threshold=0.5).collect()
    }
    sh_idx, sg_idx, bk_idx, st_idx = lsh_index(base)
    inc_pairs, sh_d, sg_d, bk_d, st_d = incremental_near_duplicates(
        sh_idx, sg_idx, bk_idx, st_idx, delta, threshold=0.5
    )
    inc = {(r.id1, r.id2, r.jaccard) for r in inc_pairs.collect()}

    assert base_pairs | inc == full
    assert inc, "delta produced no pairs — probe path dead"
    # every incremental pair touches the delta
    assert all(i1 >= _DUP_OFFSET or i2 >= _DUP_OFFSET for i1, i2, _ in inc)
    # returned index delta rows cover exactly the delta docs
    n_delta = delta.count()
    assert sh_d.select("doc_id").distinct().count() == n_delta
    assert sg_d.select("doc_id").distinct().count() == n_delta
    assert bk_d.select("doc_id").distinct().count() == n_delta


def test_connected_components_match_union_find(spark, sf_dir):
    """Distributed min-label propagation == a local union-find over
    the same near-dup pairs, and exactly one kept doc per component."""
    from pg_telemetry_spark.operators.components import connected_components
    from pg_telemetry_spark.operators.minhash import near_duplicates

    pairs = near_duplicates(_near_dup_corpus(spark, sf_dir), threshold=0.5)
    edge_rows = [(r.id1, r.id2) for r in pairs.collect()]

    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edge_rows:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {x: find(x) for x in parent}
    # canonicalize to min member per component
    comp_min: dict = {}
    for x, r in expected.items():
        comp_min[r] = min(comp_min.get(r, x), x)
    expected = {x: comp_min[r] for x, r in expected.items()}

    got = {r.id: r.comp for r in connected_components(pairs).collect()}
    assert got == expected
    kept = [x for x, c in got.items() if x == c]
    assert len(kept) == len(set(got.values()))

    # the star variant must produce the identical labeling
    from pg_telemetry_spark.operators.components import connected_components_star

    got_star = {r.id: r.comp for r in connected_components_star(pairs).collect()}
    assert got_star == expected


def test_star_components_on_adversarial_chain(spark):
    """A 400-node path is the adversarial input for min-label
    propagation (needs diameter≈400 rounds; the plain variant caps at
    20 and raises).  Large-star/small-star must label the whole chain
    with its minimum in O(log n) alternating rounds."""
    from pg_telemetry_spark.operators.components import connected_components_star

    n = 400
    chain = [(i, i + 1) for i in range(n - 1)]
    extra = [(1000 + i, 1000 + i + 7) for i in range(0, 70, 7)]  # 2nd component
    edges = spark.createDataFrame(chain + extra, "id1 bigint, id2 bigint")
    got = {r.id: r.comp for r in connected_components_star(edges).collect()}
    assert {x for x in got if x < 1000} == set(range(n))
    assert all(c == 0 for x, c in got.items() if x < 1000)
    assert all(c == 1000 for x, c in got.items() if x >= 1000)


def test_operators_handle_empty_and_singleton_inputs(spark):
    """Degenerate inputs must produce empty (not crashing) results:
    the first micro-batch of a new corpus, a one-doc corpus, and an
    empty edge list are all day-one production states."""
    from pg_telemetry_spark.operators.components import (
        connected_components,
        connected_components_star,
    )
    from pg_telemetry_spark.operators.similarity import sim_join_blockwise

    empty_docs = spark.createDataFrame([], "doc_id bigint, text string")
    one_doc = spark.createDataFrame([(1, "hello world example")], "doc_id bigint, text string")
    assert near_duplicates(empty_docs).count() == 0
    assert near_duplicates(one_doc).count() == 0

    empty_edges = spark.createDataFrame([], "id1 bigint, id2 bigint")
    assert connected_components(empty_edges).count() == 0
    assert connected_components_star(empty_edges).count() == 0

    empty_vecs = spark.createDataFrame([], "vec_id bigint, embedding array<double>")
    one_vec = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id bigint, embedding array<double>"
    )
    assert sim_join_blockwise(empty_vecs, threshold=0.1).count() == 0
    assert sim_join_blockwise(one_vec, threshold=0.1).count() == 0


def test_lsh_verify_exhibit_matches_production_verify(spark, sf_dir):
    """llm_lsh_verify (tier A, raw char-5-gram Jaccard) and the
    production near-dup pipeline (hashed shingles) must agree on the
    planted true pairs: every (orig, orig+OFFSET) pair the tier-A
    exhibit marks is_dup=1 must be recovered by the full
    shingle->minhash->LSH->verify pipeline at the same threshold —
    the equivalence that makes the exhibit representative of the
    production verify stage."""
    from pg_telemetry_spark.queries.llm import _near_dup_pairs
    from pg_telemetry_spark.registry import all_queries

    exhibit = all_queries()["llm_lsh_verify"].fn(spark, sf_dir).collect()
    true_dups = {
        (r.id1, r.id2) for r in exhibit if r.is_dup == 1 and r.id2 - 1_000_000 == r.id1
    }
    assert true_dups, "exhibit found no planted true pairs"
    decoys_rejected = [
        r for r in exhibit if r.id2 - 1_000_000 != r.id1 and r.is_dup == 0
    ]
    assert decoys_rejected, "every decoy passed — the verify filters nothing"
    production = {
        (r.id1, r.id2) for r in _near_dup_pairs(spark, sf_dir).collect()
    }
    missing = true_dups - production
    assert not missing, f"production pipeline missed planted pairs: {sorted(missing)[:5]}"
