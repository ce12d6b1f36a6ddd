"""MinHash + banded LSH near-duplicate detection, pure DataFrame ops.

Pipeline (all JVM-side — no Python UDFs anywhere):

1. shingle: char n-grams via ``transform(sequence(...), i ->
   substring(text, i, n))`` + ``array_distinct``.
2. minhash: explode shingles to rows and take ``min(xxhash64(shingle,
   seed_s))`` for each of ``num_perm`` fixed seeds in ONE two-phase
   hash aggregate — 64 mins computed in a single pass over the
   exploded rows, with map-side partial aggregation so the shuffle
   carries one signature row per document.  (A nested
   ``transform(sequence(0,63), s -> array_min(transform(shingles,...)))``
   formulation is ~100× slower: it re-traverses the shingle array per
   permutation inside a single monster expression — measured 226 s vs
   ~2 s at sf0.1.)
3. LSH banding: hash each ``rows``-wide slice of the signature (+ band
   index) to a bucket key; explode to (doc, band, bucket) rows.
4. candidates: self-join on (band, bucket) with id< to halve, then
   ``dropDuplicates`` (a pair can collide in several bands).
5. verify: exact Jaccard on the shingle sets via
   ``array_intersect``/``array_union`` sizes; keep pairs ≥ threshold.

Determinism: permutation seeds are the literal integers 0..num_perm-1
fed to xxhash64 — no RNG anywhere, so signatures are reproducible
across runs and cluster sizes.

Scale: every step is either a narrow map or an equi-shuffle on a
uniform key (doc_id, bucket).  The candidate self-join costs
O(collisions), never O(n²).  At 100 TB the bucket key is the natural
partition key for incremental dedup (new docs only probe their own
buckets).  Pathologically hot buckets (boilerplate / low-entropy text
shared by thousands of docs) degrade to STAR pairing past
``max_bucket_size`` members (default 256): each member pairs with the
bucket's min id only, so a k-member hot bucket contributes O(k)
candidates instead of O(k²) while staying CONNECTED for the verify
and connected-components passes.  AQE skew splitting spreads the
shuffle but not the quadratic pair count inside a bucket — the width
bound is what actually bounds candidate volume, and the round-7 sf10
ladder measured the failure mode the old drop-at-1000 cap missed:
hundreds of near-cap buckets × 500k pairs each × two 64-long
signature arrays attached per pair = a spill measured in hundreds of
GB.  With star degrade, dense near-dup clusters surface through
their representative (and a direct pair can still appear via any
narrower bucket in the other bands), which is exactly what the
downstream CC clustering consumes.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from pg_telemetry_spark.cache import pin

DEFAULT_NUM_PERM = 64
DEFAULT_BANDS = 16
DEFAULT_SHINGLE = 5
#: Max members per (band, bucket) that still pair ALL-vs-ALL.  Wider
#: buckets degrade to STAR pairing (every member vs the bucket's min
#: id): O(k) candidates instead of O(k²), while keeping the bucket
#: CONNECTED for the verify + connected-components pass.  256 bounds
#: any bucket's quadratic pair count at ~32k; the round-7 sf10 ladder
#: showed why a drop-style cap at 1000 is not enough: a low-entropy
#: corpus (tiny vocabulary = near-total shingle overlap between long
#: docs) drives HUNDREDS of buckets to the cap, and 500k pairs per
#: bucket × the signature-prefilter join's two 64-long arrays per
#: pair = a spill measured in hundreds of GB.
DEFAULT_MAX_BUCKET = 256


def _bucket_pairs(banded: DataFrame, max_bucket_size: int | None) -> DataFrame:
    """(id1 < id2) candidate pairs per (band, bucket).

    Buckets up to ``max_bucket_size`` members pair quadratically (the
    exact LSH candidate semantics).  Wider buckets emit each member
    against the bucket's min id only — a star that preserves cluster
    connectivity with O(k) volume; its pairs still flow through the
    exact-Jaccard verify, so nothing unverified is ever reported.  A
    doc's DIRECT pair with a specific near-copy can still surface via
    any of its other bands' (narrower) buckets.  ``None`` disables
    the width check (pure quadratic semantics).

    One window over the same (band, bucket) key the self-join
    shuffles on — the partitioning is computed once and reused.
    """
    id_col = banded.columns[0]
    if max_bucket_size is None:
        left = banded.select(F.col(id_col).alias("id1"), "band", "bucket")
        right = banded.select(F.col(id_col).alias("id2"), "band", "bucket")
        return (
            left.join(right, ["band", "bucket"])
            .filter(F.col("id1") < F.col("id2"))
            .select("id1", "id2")
        )
    w = Window.partitionBy("band", "bucket")
    sized = banded.select(
        F.col(id_col),
        "band",
        "bucket",
        F.count("*").over(w).alias("_bsize"),
        F.min(id_col).over(w).alias("_bmin"),
    )
    small = sized.filter(F.col("_bsize") <= max_bucket_size)
    left = small.select(F.col(id_col).alias("id1"), "band", "bucket")
    right = small.select(F.col(id_col).alias("id2"), "band", "bucket")
    quad = left.join(right, ["band", "bucket"]).filter(F.col("id1") < F.col("id2"))
    star = (
        sized.filter(
            (F.col("_bsize") > max_bucket_size) & (F.col(id_col) != F.col("_bmin"))
        )
        .select(F.col("_bmin").alias("id1"), F.col(id_col).alias("id2"))
    )
    return quad.select("id1", "id2").unionByName(star)


def with_shingles(docs: DataFrame, n: int = DEFAULT_SHINGLE, text_col: str = "text") -> DataFrame:
    """Add a ``shingles`` column: distinct char n-grams of ``text_col``."""
    length = F.length(text_col)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(length - (n - 1), F.lit(1))),
        lambda i: F.substring(F.col(text_col), i, n),
    )
    return docs.withColumn("shingles", F.array_distinct(grams))


def with_shingle_hashes(
    docs: DataFrame, n: int = DEFAULT_SHINGLE, text_col: str = "text"
) -> DataFrame:
    """Add a ``shingle_hashes`` column: distinct xxhash64 of each char
    n-gram.  Every downstream step (minhash, Jaccard verify) works on
    longs — each shingle string is hashed exactly once, and set
    operations on longs are several times cheaper than on strings.
    Jaccard over 64-bit hashes equals Jaccard over the strings up to
    negligible collision probability."""
    sh = with_shingles(docs, n, text_col)
    return sh.withColumn(
        "shingle_hashes",
        F.array_distinct(F.transform("shingles", lambda s: F.xxhash64(s))),
    ).drop("shingles")


def minhash_signatures(
    docs_with_shingles: DataFrame,
    id_col: str = "doc_id",
    num_perm: int = DEFAULT_NUM_PERM,
) -> DataFrame:
    """(id, mh0..mh{num_perm-1}) signature table via explode + multi-min
    aggregate (one pass, map-side combined).  Input rows carry
    ``shingle_hashes`` (longs), so each permutation hash is a
    fixed-cost long+seed xxhash64, not a string re-hash."""
    exploded = docs_with_shingles.select(id_col, F.explode("shingle_hashes").alias("sh"))
    # F.expr strings instead of nested Column calls (optimization r17,
    # guide §5 — the driver is part of the system): each of the 64
    # aggregates was ~4 py4j round-trips of Column construction,
    # measured at ~0.55 s of pure driver latency per probe build.
    # The parsed expression is IDENTICAL (xxhash64 of the bigint
    # shingle hash and an int literal seed) — same plan, same bits.
    aggs = [F.expr(f"min(xxhash64(sh, {s})) AS mh{s}") for s in range(num_perm)]
    return exploded.groupBy(id_col).agg(*aggs)


def _band_array(num_perm: int, bands: int) -> F.Column:
    """``array(xxhash64(mh0..mh{r-1}, 0), ...)`` — the per-band bucket
    keys, built as ONE parsed expression instead of ~6 py4j calls per
    band (optimization r17, guide §5; identical expression tree)."""
    rows = num_perm // bands
    parts = ", ".join(
        "xxhash64("
        + ", ".join(f"mh{b * rows + i}" for i in range(rows))
        + f", {b})"
        for b in range(bands)
    )
    return F.expr(f"array({parts})")


def _mh_array(num_perm: int) -> F.Column:
    """``array(mh0..mh{n-1})`` as one parsed expression (same
    rationale as :func:`_band_array`)."""
    return F.expr("array(" + ", ".join(f"mh{s}" for s in range(num_perm)) + ")")


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    num_perm: int = DEFAULT_NUM_PERM,
    bands: int = DEFAULT_BANDS,
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """Candidate (id1, id2) pairs sharing ≥1 LSH band bucket.

    ``signatures`` is the output of :func:`minhash_signatures`.
    Buckets wider than ``max_bucket_size`` degrade to star pairing
    (see :func:`_bucket_pairs`; ``None`` disables the width check).
    """
    banded = signatures.select(
        F.col(id_col),
        F.posexplode(_band_array(num_perm, bands)).alias("band", "bucket"),
    )
    return _bucket_pairs(banded, max_bucket_size).dropDuplicates(["id1", "id2"])


def near_duplicates(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.6,
    num_perm: int = DEFAULT_NUM_PERM,
    bands: int = DEFAULT_BANDS,
    shingle: int = DEFAULT_SHINGLE,
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """Full near-dup pipeline: (id1, id2, jaccard) with exact-verified
    shingle Jaccard ≥ threshold over LSH candidates."""
    # The shingle table feeds three consumers (signatures + both sides
    # of the verify join) and the signature table two (banding + the
    # estimate prefilter) — persist both so each is computed once.  At
    # warehouse scale these become materialized tables (signatures are
    # tiny: num_perm longs per doc); in-process, MEMORY_AND_DISK with
    # LRU eviction is the same decision.
    sh = pin(with_shingle_hashes(docs, shingle, text_col))
    sig = pin(minhash_signatures(sh, id_col, num_perm))
    cands = lsh_candidate_pairs(sig, id_col, num_perm, bands, max_bucket_size)

    # Cheap prefilter: the minhash signature itself estimates Jaccard
    # (fraction of agreeing components, unbiased).  Candidate sets are
    # dominated by low-J vocabulary-overlap noise (measured: ~99% of
    # pairs at J<0.4 on the fixtures); comparing 64 longs is ~8x
    # cheaper than the exact 500-element set ops, and a 0.15 margin
    # under the threshold makes a false drop of a true pair
    # vanishingly unlikely (binomial tail ~5e-6 at J=threshold+0.2).
    est_threshold = max(threshold - 0.15, 0.0)
    mh_array = _mh_array(num_perm)
    m1 = sig.select(F.col(id_col).alias("id1"), mh_array.alias("mh1"))
    m2 = sig.select(F.col(id_col).alias("id2"), mh_array.alias("mh2"))
    est = F.size(
        F.filter(F.zip_with("mh1", "mh2", lambda a, b: a == b), lambda x: x)
    ) / F.lit(num_perm)
    # BROADCAST the signature side of both prefilter joins (round 11):
    # with shuffle joins the second join re-exchanges the candidate
    # stream WITH the first side's 64-long array attached — at the
    # sf10 decade that is 139M candidate pairs x ~530 B = a ~73 GB
    # exchange carrying data the est-filter immediately discards
    # (measured: the prefilter stage alone took ~50 s quiet, and the
    # op ~305 s cold).  Broadcasting the compact signature table
    # (num_perm longs/doc — ~300 MB at 571k docs) lets the candidate
    # stream flow through BOTH joins with no exchange at all.  At
    # true warehouse scale the signature table outgrows broadcast;
    # there the corpus is indexed once (lsh_index) and deltas take
    # incremental_near_duplicates, whose probe prunes signatures to
    # candidate ids before this same broadcast.
    prefiltered = (
        cands.join(F.broadcast(m1), "id1")
        .join(F.broadcast(m2), "id2")
        .filter(est >= est_threshold)
        .select("id1", "id2")
    )

    s1 = sh.select(F.col(id_col).alias("id1"), F.col("shingle_hashes").alias("sh1"))
    s2 = sh.select(F.col(id_col).alias("id2"), F.col("shingle_hashes").alias("sh2"))
    inter = F.size(F.array_intersect("sh1", "sh2"))
    union = F.size(F.array_union("sh1", "sh2"))
    return (
        prefiltered.join(s1, "id1")
        .join(s2, "id2")
        .withColumn("jaccard", F.round(inter / union, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id1", "id2", "jaccard")
    )


def bucket_stats(buckets: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """``(band, bucket, size, min_id)`` summary of a bucket table.

    One row per distinct (band, bucket) — 3 longs beside the key, so
    the table is a small fraction of the bucket index itself.  It is
    the state that lets an incremental probe apply the hot-bucket
    star degrade WITHOUT re-scanning or re-windowing the full bucket
    index: sizes and min ids are read here, maintained incrementally
    via :func:`merge_bucket_stats`.
    """
    return buckets.groupBy("band", "bucket").agg(
        F.count("*").alias("size"), F.min(id_col).alias("min_id")
    )


def merge_bucket_stats(base_stats: DataFrame, delta_stats: DataFrame) -> DataFrame:
    """Fold a delta's bucket stats into the base stats table.

    This is the index-MAINTENANCE write path (the analogue of the
    caller unioning the shingle/signature/bucket delta rows into their
    tables): a union + re-aggregate that shuffles only the compact
    stats rows (key + 2 longs per distinct bucket), never the bucket
    index.  At warehouse scale this is a storage-side ``MERGE INTO``
    on the (band, bucket) key, touching only the delta's partitions.
    """
    u = base_stats.select("band", "bucket", "size", "min_id").unionByName(
        delta_stats.select("band", "bucket", "size", "min_id")
    )
    return u.groupBy("band", "bucket").agg(
        F.sum("size").alias("size"), F.min("min_id").alias("min_id")
    )


def lsh_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = DEFAULT_NUM_PERM,
    bands: int = DEFAULT_BANDS,
    shingle: int = DEFAULT_SHINGLE,
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """Materializable LSH index for a corpus:
    ``(shingles, signatures, buckets, stats)``.

    ``shingles``   = (id, shingle_hashes)    — the exact-verify side;
    ``signatures`` = (id, mh: array<bigint>) — the estimate prefilter;
    ``buckets``    = (id, band, bucket)      — the probe side;
    ``stats``      = (band, bucket, size, min_id) — hot-bucket guard
    state (:func:`bucket_stats`), so the probe never re-derives bucket
    widths from the full index.

    At warehouse scale all four are tables partitioned/bucketed on
    their join keys (bucket for probes/stats, id for the others),
    written once per ingest batch; they are exactly the state an
    incremental dedup needs, so a 100 TB corpus is indexed once and
    each daily delta only probes, never re-scans history.  Signatures
    cost num_perm longs per doc — negligible beside the shingle sets.
    """
    sh = with_shingle_hashes(docs, shingle, text_col).select(id_col, "shingle_hashes")
    sig = minhash_signatures(sh, id_col, num_perm)
    buckets = sig.select(
        F.col(id_col), F.posexplode(_band_array(num_perm, bands)).alias("band", "bucket")
    )
    sigs = sig.select(F.col(id_col), _mh_array(num_perm).alias("mh"))
    return sh, sigs, buckets, bucket_stats(buckets, id_col)


def incremental_near_duplicates(
    index_shingles: DataFrame,
    index_signatures: DataFrame,
    index_buckets: DataFrame,
    index_bucket_stats: DataFrame,
    new_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.6,
    num_perm: int = DEFAULT_NUM_PERM,
    bands: int = DEFAULT_BANDS,
    shingle: int = DEFAULT_SHINGLE,
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET,
    persist_intermediates: bool = True,
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame, DataFrame]:
    """Dedup a delta against an existing corpus index.

    Returns ``(pairs, shingles_delta, signatures_delta, buckets_delta,
    stats_delta)``: every verified near-dup pair that involves at
    least one new doc (new-vs-old and new-vs-new), plus the index rows
    for the new docs so the caller can append them (union / INSERT
    INTO), and the delta's bucket stats to fold into the stats table
    with :func:`merge_bucket_stats`, for the next delta.

    Only the delta is shingled and hashed, and — the property that
    keeps continuous ingest viable at 100 TB — **no shuffle in this
    plan ever carries more than O(delta + collisions) rows**.  The
    four history tables are touched exclusively on the streamed side
    of broadcast joins (probe, hot-bucket admission, semi-join
    pruning), so the full bucket/signature/shingle indexes are
    scanned but never exchanged; at warehouse scale those scans are
    additionally partition-pruned by the storage layout (buckets
    partitioned on the bucket key, shingles/signatures on id).  The
    hot-bucket star degrade reads widths from ``index_bucket_stats``
    (maintained incrementally, see :func:`bucket_stats`) merged with
    the delta's own stats — it does NOT re-window the bucket index.

    Broadcast sizing: the broadcast payloads are the delta's bucket
    keys/rows (O(|delta| x bands)) and the candidate pair ids
    (O(collisions)) — for a daily-delta ingest both are orders of
    magnitude below the corpus; a delta so large that they exceed
    broadcast limits should be indexed with a fresh ``lsh_index`` +
    batch :func:`near_duplicates` run instead.

    Hot buckets keep THREE representatives joinable: the global min,
    the min *base-side* member, and (via the probe side being
    unfiltered) every delta doc — so a delta doc landing in a hot
    bucket always links to the indexed cluster's representative even
    when the delta now holds the bucket's global min id.
    """
    sh_new, sg_new, bk_new, st_new = lsh_index(
        new_docs, id_col, text_col, num_perm, bands, shingle
    )
    if persist_intermediates:
        # multi-consumer delta frames (plan-shape tests pass False so
        # the raw plan stays auditable, no InMemoryRelation boundaries)
        sh_new = pin(sh_new)
        sg_new = pin(sg_new)
        bk_new = pin(bk_new)
        st_new = pin(st_new)
    _p = pin if persist_intermediates else (lambda df: df)

    if max_bucket_size is not None:
        # Base stats for ONLY the buckets the delta touches: left-semi
        # against a broadcast of the delta's bucket keys streams the
        # stats table without an exchange and yields an O(delta)-keyed
        # frame; merging with the delta stats is then a small groupBy.
        touched_base = index_bucket_stats.join(
            F.broadcast(st_new.select("band", "bucket")),
            ["band", "bucket"],
            "left_semi",
        )
        merged = (
            touched_base.withColumn("_is_base", F.lit(True))
            .unionByName(st_new.withColumn("_is_base", F.lit(False)))
            .groupBy("band", "bucket")
            .agg(
                F.sum("size").alias("_bsize"),
                F.min("min_id").alias("_bmin"),
                F.min(F.when(F.col("_is_base"), F.col("min_id"))).alias(
                    "_bmin_base"
                ),
            )
        )
        adm = F.broadcast(merged)
        # Admission mirrors _bucket_pairs' star degrade, except a hot
        # bucket keeps BOTH the global min and the min base member:
        # if the delta supplies the new global min, base members would
        # otherwise all be dropped and new docs could never link to
        # the already-indexed cluster through this bucket.
        base_adm = (
            index_buckets.join(adm, ["band", "bucket"])
            .filter(
                (F.col("_bsize") <= max_bucket_size)
                | (F.col(id_col) == F.col("_bmin"))
                | (F.col(id_col) == F.col("_bmin_base"))
            )
            .select(id_col, "band", "bucket")
        )
        delta_adm = (
            bk_new.join(adm, ["band", "bucket"])
            .filter(
                (F.col("_bsize") <= max_bucket_size)
                | (F.col(id_col) == F.col("_bmin"))
            )
            .select(id_col, "band", "bucket")
        )
        other = base_adm.unionByName(delta_adm)
    else:
        other = index_buckets.select(id_col, "band", "bucket").unionByName(
            bk_new.select(id_col, "band", "bucket")
        )

    # Probe join: broadcast the DELTA side so the (possibly pruned)
    # history buckets stream through a BroadcastHashJoin — no exchange
    # over the index.  Probe side stays unfiltered: every new doc
    # probes, hot or not.
    probe = F.broadcast(bk_new.select(F.col(id_col).alias("id_n"), "band", "bucket"))
    cands = (
        other.select(F.col(id_col).alias("id_o"), "band", "bucket")
        .join(probe, ["band", "bucket"])
        .filter(F.col("id_n") != F.col("id_o"))
        .select(
            F.least("id_n", "id_o").alias("id1"),
            F.greatest("id_n", "id_o").alias("id2"),
        )
        .dropDuplicates(["id1", "id2"])
    )
    cands = _p(cands)
    pair_ids = (
        cands.select(F.col("id1").alias(id_col))
        .unionByName(cands.select(F.col("id2").alias(id_col)))
        .distinct()
    )
    bids = F.broadcast(pair_ids)

    # TWO-PHASE verify (round 11).  Round 9 fused the signature
    # prefilter and the exact-Jaccard verify into one join pass so
    # every candidate row carried BOTH the 64-long signature and the
    # ~1000-long shingle array of each side; at the sf10 decade that
    # shipped the fat shingle arrays for the ~99% of candidates the
    # est-prefilter exists to discard (measured: warm probe 284 s on a
    # quiet box, 26x over sf1 — pure array-shipping volume, since the
    # candidate count itself grows with bucket occupancy).  The split
    # shape joins candidates to the PRUNED signature table first
    # (64 longs/side), drops low-J noise, and only then joins the
    # shingle arrays for the est-survivors — O(true pairs), not
    # O(collisions), rows carry the fat arrays.
    est_threshold = max(threshold - 0.15, 0.0)
    all_sigs = index_signatures.unionByName(sg_new)
    sig_pruned = _p(all_sigs.join(bids, id_col, "left_semi"))
    est = F.size(
        F.filter(F.zip_with("mh1", "mh2", lambda a, b: a == b), lambda x: x)
    ) / F.lit(num_perm)
    # Broadcast the (candidate-id-pruned) signature table on both
    # joins: the candidate stream then meets the 64-long arrays in two
    # back-to-back BroadcastHashJoins with no exchange carrying the
    # arrays (same rationale and measurement as near_duplicates).
    survivors = (
        cands.join(
            F.broadcast(
                sig_pruned.select(
                    F.col(id_col).alias("id1"), F.col("mh").alias("mh1")
                )
            ),
            "id1",
        )
        .join(
            F.broadcast(
                sig_pruned.select(
                    F.col(id_col).alias("id2"), F.col("mh").alias("mh2")
                )
            ),
            "id2",
        )
        .filter(est >= est_threshold)
        .select("id1", "id2")
    )
    # Prune the fat shingle tables with the ALREADY-BROADCAST candidate
    # id set (bids): reusing it costs nothing extra and keeps the
    # shingle prune independent of the survivor computation (a
    # survivor-id prune would be tighter but adds a blocking broadcast
    # subjob + a survivors persist — measured ~3 s of pure barrier
    # latency per probe at sf0.1 for a second-order byte saving).
    all_shingles = index_shingles.unionByName(sh_new)
    sh_pruned = _p(all_shingles.join(bids, id_col, "left_semi"))
    inter = F.size(F.array_intersect("sh1", "sh2"))
    union = F.size(F.array_union("sh1", "sh2"))
    pairs = (
        survivors.join(
            sh_pruned.select(
                F.col(id_col).alias("id1"), F.col("shingle_hashes").alias("sh1")
            ),
            "id1",
        )
        .join(
            sh_pruned.select(
                F.col(id_col).alias("id2"), F.col("shingle_hashes").alias("sh2")
            ),
            "id2",
        )
        .withColumn("jaccard", F.round(inter / union, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id1", "id2", "jaccard")
    )
    return pairs, sh_new, sg_new, bk_new, st_new
