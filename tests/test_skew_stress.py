"""Skew-stress for the dedup family on a corpus with REAL duplicate
mass (VERDICT r6 #7): the driver fixtures are near-duplicate-free, so
the LSH hot-bucket cap and the connected-components round bound had
never been exercised against planted clusters.  The scale-ladder
generator (`tools/gen_scale.py`) plants a 10%-duplicate tail (half
exact copies, half 2-word truncations of head-1% templates); this
test regenerates that corpus at test scale and pins:

- the LSH candidate-pair count stays ~quadratic-in-cluster, not
  quadratic-in-corpus (bounded by planted mass, orders of magnitude
  under n^2/2);
- recall: every planted exact-copy pair survives banding + the
  signature prefilter + exact verify (identical text => identical
  signature => guaranteed band collision);
- connected components over the verified dup edges reaches its
  fixpoint in a few rounds (near-clique clusters converge fast under
  the 1-hop-min seeding) and reconstructs the planted clusters.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pyspark.sql.functions as F
import pytest

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

from pg_telemetry_spark.operators.components import (  # noqa: E402
    connected_components,
    connected_components_star,
)
from pg_telemetry_spark.operators.minhash import (  # noqa: E402
    lsh_candidate_pairs,
    minhash_signatures,
    near_duplicates,
    with_shingle_hashes,
)
from tools.gen_scale import gen_documents  # noqa: E402

N_DOCS = 3000  # 2700 base + 300 planted duplicates over ~27 templates


@pytest.fixture(scope="module")
def skew_docs(spark, tmp_path_factory):
    out = tmp_path_factory.mktemp("skew")
    gen_documents(str(out), N_DOCS, dup_frac=0.10)
    docs = spark.read.parquet(str(out / "documents.parquet"))
    docs = docs.repartition(8).persist()
    docs.count()
    yield docs
    docs.unpersist()


@pytest.fixture(scope="module")
def planted_exact_pairs(skew_docs):
    """Ground truth: all (id1 < id2) pairs with byte-identical text."""
    grouped = (
        skew_docs.groupBy("text")
        .agg(F.collect_list("doc_id").alias("ids"))
        .filter(F.size("ids") > 1)
    )
    pairs = (
        grouped.select(F.explode("ids").alias("id1"), "ids")
        .select("id1", F.explode("ids").alias("id2"))
        .filter(F.col("id1") < F.col("id2"))
    )
    return {(r.id1, r.id2) for r in pairs.collect()}


def test_candidate_count_bounded_by_planted_mass(skew_docs):
    """LSH candidates on a 10%-dup corpus stay orders of magnitude
    under all-pairs — the banding is doing the blocking even when the
    corpus has genuine duplicate clusters (the r6 concern was bucket
    blowup on a duplicative corpus)."""
    sh = with_shingle_hashes(skew_docs)
    sig = minhash_signatures(sh)
    n_cands = lsh_candidate_pairs(sig).count()
    all_pairs = N_DOCS * (N_DOCS - 1) // 2  # 4_498_500
    # Planted mass: 300 dups over ~27 templates -> clusters of ~12
    # members (template + ~11 copies) -> ~27 * C(12,2) ~ 1800 true
    # cluster pairs.  Band collisions add vocabulary-noise pairs on a
    # 31-word vocab, but the count must stay in the planted-mass
    # regime, not the corpus-quadratic regime.
    assert n_cands < all_pairs * 0.01, (
        f"{n_cands} candidates ~ corpus-quadratic ({all_pairs} all-pairs)"
    )
    assert n_cands > 0


def test_exact_copy_recall_through_full_pipeline(skew_docs, planted_exact_pairs):
    """Every planted exact-copy pair must survive banding, the
    signature prefilter, and the exact verify at threshold 0.9:
    identical text gives identical signatures, so a band collision is
    guaranteed and jaccard = 1.0 exactly."""
    assert len(planted_exact_pairs) >= 100  # the plant actually planted
    found = near_duplicates(skew_docs, threshold=0.9)
    found_pairs = {(r.id1, r.id2) for r in found.select("id1", "id2").collect()}
    missing = planted_exact_pairs - found_pairs
    assert not missing, f"{len(missing)} planted exact pairs missed: {sorted(missing)[:5]}"


def test_truncated_copy_recall(skew_docs):
    """The odd-index plants drop the last 2 words of a 10-100-word
    template: shingle Jaccard stays >= ~0.8 for all but the shortest
    docs, far above the 0.6 default threshold.  Demand >= 90% of the
    planted near (non-exact) mass is recovered — LSH at 64 perm / 16
    bands has >99.9% collision probability at J >= 0.8."""
    n_base = N_DOCS - N_DOCS // 10
    found = near_duplicates(skew_docs, threshold=0.6)
    # near-pairs that touch the planted tail and verified below 1.0
    # (exact copies verify at exactly 1.0)
    near_found = found.filter(
        (F.col("jaccard") < 1.0) & (F.col("id2") >= n_base)
    ).count()
    n_truncated = (N_DOCS // 10) // 2  # odd plant indices
    assert near_found >= int(n_truncated * 0.9), (
        f"only {near_found} of ~{n_truncated} truncated plants recovered"
    )


def test_components_converge_fast_on_planted_clusters(skew_docs):
    """Dup clusters are near-cliques (every copy pairs with its
    template and with each other), so min-label propagation with
    1-hop-min seeding must converge in <= 4 rounds — a round-count
    blowup here would mean the edge set degenerated.  Both CC
    implementations must agree on the partition."""
    edges = near_duplicates(skew_docs, threshold=0.6).select("id1", "id2").persist()
    try:
        labels = connected_components(edges, max_iter=4)  # raises if > 4 rounds
        comps = (
            labels.groupBy("comp").agg(F.count("*").alias("n")).persist()
        )
        n_comps = comps.count()
        max_size = comps.agg(F.max("n")).collect()[0][0]
        comps.unpersist()
        # ~27 templates -> at most ~27 clusters (some templates are
        # drawn more than once -> fewer, bigger); sizes ~ 12 +/- draw
        # variance, never corpus-scale chaining
        assert 5 <= n_comps <= 40, n_comps
        assert max_size <= 60, f"cluster of {max_size} — chaining blowup"
        star = connected_components_star(edges)
        # same partition: (id -> comp) maps must be identical (both
        # label by component-minimum)
        diff = labels.join(star, "id").filter(
            labels.comp != star.comp
        ).count()
        assert diff == 0
    finally:
        edges.unpersist()


def test_hot_bucket_star_degrade_bounds_pairs_and_keeps_connectivity(spark):
    """A k-member hot cluster (identical text, k far over the width
    bound) must yield O(k) candidates — not k^2/2 — and connected
    components over the verified pairs must still reassemble the WHOLE
    cluster through the star representative.  This is the round-7
    semantics change: over-width buckets degrade to stars instead of
    being dropped (which lost the cluster entirely) or pairing
    quadratically (which filled the disk on the sf10 ladder)."""
    k, n_noise = 400, 200  # width bound is 256
    rows = [(i, "hot boilerplate text shared by every member row") for i in range(k)]
    # noise docs with per-doc-unique vocabulary (no shared shingles,
    # so they cannot legitimately pair with anything)
    rows += [
        (k + i, " ".join(f"x{i}q{j}z{i}" for j in range(8)))
        for i in range(n_noise)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sh = with_shingle_hashes(docs)
    sig = minhash_signatures(sh)
    cands = lsh_candidate_pairs(sig)  # default max_bucket_size=256
    n_cands = cands.count()
    # O(k): one star per band (identical docs share every bucket), so
    # <= bands * (k-1) pairs; the quadratic count would be 79.8k
    assert n_cands <= 16 * (k - 1), n_cands
    assert n_cands >= k - 1
    verified = near_duplicates(docs, threshold=0.5)
    labels = connected_components(verified)
    hot = labels.filter(F.col("id") < k)
    # every hot member is in ONE component (connectivity preserved)
    assert hot.count() == k
    assert hot.select("comp").distinct().count() == 1


def test_simhash_recall_floor_at_shipped_bound(spark):
    """Pin the measured recall floors behind simhash's shipped
    hot-bucket bound (256, chosen by tools/measure_simhash_recall.py:
    copy-copy direct 0.761 / connectivity 0.9998 vs 201 s at sf10 for
    the 1024 bound).  A smaller planted corpus with the same three
    width regimes: narrow clusters (width 10, all-vs-all), contested
    clusters (width 400 > 256, star-degraded at the default), and the
    floor assertions on each ground-truth set."""
    import numpy as np

    from pg_telemetry_spark.operators.components import connected_components
    from pg_telemetry_spark.operators.simhash import (
        hamming,
        simhash,
        simhash_chunk_candidates,
    )

    rng = np.random.default_rng(5)
    vocab = np.array([f"w{i}" for i in range(3000)])
    rows, pc, cc = [], [], []
    did = 0
    for t, width in [(0, 10)] * 20 + [(0, 400)] * 3:
        toks = vocab[rng.integers(0, len(vocab), 40)]
        pid = did
        rows.append((did, " ".join(toks)))
        did += 1
        members = []
        for _ in range(width):
            cp = toks.copy()
            for pos in rng.choice(40, rng.integers(1, 3), replace=False):
                cp[pos] = vocab[rng.integers(0, len(vocab))]
            rows.append((did, " ".join(cp)))
            pc.append((pid, did))
            members.append(did)
            did += 1
        m = np.array(members)
        k = min(2000, len(m) * 5)
        a, b = m[rng.integers(0, len(m), k)], m[rng.integers(0, len(m), k)]
        cc += [(int(min(x, y)), int(max(x, y))) for x, y in zip(a, b) if x != y]

    d = spark.createDataFrame(rows, "doc_id long, text string")
    fp = simhash(d).persist()
    f1 = fp.select(F.col("doc_id").alias("pid"), F.col("simhash").alias("s1"))
    f2 = fp.select(F.col("doc_id").alias("cid"), F.col("simhash").alias("s2"))

    def truth(pairs):
        g = spark.createDataFrame(sorted(set(pairs)), "pid long, cid long")
        return (
            g.join(f1, "pid").join(f2, "cid")
            .filter(hamming(F.col("s1"), F.col("s2")) <= 3)
            .select("pid", "cid")
            .collect()
        )

    gt_pc, gt_cc = truth(pc), truth(cc)
    assert len(gt_pc) > 250 and len(gt_cc) > 150  # the plant planted

    cand = simhash_chunk_candidates(fp).filter(F.col("hamming") <= 3).persist()
    direct = {
        (min(r["id1"], r["id2"]), max(r["id1"], r["id2"])) for r in cand.collect()
    }
    comp = {r["id"]: r["comp"] for r in connected_components(cand).collect()}

    # parent-copy: the representative path keeps every pair connected
    pc_conn = sum(comp.get(r["pid"]) == comp.get(r["cid"]) for r in gt_pc) / len(gt_pc)
    assert pc_conn >= 0.999, pc_conn
    # copy-copy floors at the shipped default (measured 0.761 / 0.9998
    # on the 16.3k corpus; floors leave margin for corpus draw)
    cc_direct = sum(
        (min(r["pid"], r["cid"]), max(r["pid"], r["cid"])) in direct for r in gt_cc
    ) / len(gt_cc)
    cc_conn = sum(comp.get(r["pid"]) == comp.get(r["cid"]) for r in gt_cc) / len(gt_cc)
    assert cc_direct >= 0.70, cc_direct
    assert cc_conn >= 0.995, cc_conn
    fp.unpersist()
    cand.unpersist()
