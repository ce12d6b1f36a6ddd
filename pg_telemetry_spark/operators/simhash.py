"""SimHash document fingerprinting, pure DataFrame ops.

64-bit SimHash: hash every token to 64 bits; for each bit position,
sum +1/-1 across the document's tokens (term-frequency weighted by
construction — repeated tokens vote repeatedly); the fingerprint sets
bit i where the sum is positive.  Near-duplicate documents differ in
few tokens, so their fingerprints differ in few bits — candidate
pairs are those with small Hamming distance (``bit_count(a XOR b)``).

Implementation mirrors minhash.py's scalable shape: explode tokens to
rows, compute the 64 per-bit vote sums in ONE two-phase hash
aggregate (64 conditional-sum columns, map-side combined — the
shuffle carries one row per document), then assemble the long via
non-overlapping shifted bit adds.

Scale: at 100 TB the fingerprint is 8 bytes/doc; Hamming-ball lookup
is served by pivoting on 4 x 16-bit fingerprint chunks (any pair
within distance 3 shares at least one exact chunk — the standard
multi-index trick), which turns near-dup search into 4 equi-joins.

Recall caveat: the shared-chunk guarantee holds EXACTLY only while
every chunk bucket pairs all-vs-all.  Past ``max_bucket_size`` a hot
bucket degrades to star pairing, so two non-min members of that
bucket lose their direct pair and must surface through one of the
other chunks — with only ``chunks``-fold redundancy (4 here, vs 16
LSH bands in minhash.py), candidate recall on hot buckets is
therefore APPROXIMATE, not guaranteed.

The default bound is 256, chosen by MEASUREMENT, not guesswork
(tools/measure_simhash_recall.py, planted 16.3k-doc corpus with
clusters at widths 20 / 600 / 5000 — the 600s sit inside the
contested (256, 1024] band where the two bounds actually differ):

  bound   copy-copy direct  cluster connectivity   sf10 cost (r8)
  256     0.761             0.9998                 10-16 s
  1024    0.828             1.0000                 201 s
  None    1.000             1.0000                 quadratic (883 s r7)

Cluster connectivity — the property the downstream CC/dedup pass
consumes (star pairing keeps every member linked through the
representative; parent-copy recall is 1.0 at every bound) — is
within 2e-4 of perfect at BOTH bounds, so round 8's 256 -> 1024
raise bought +6.7pp of direct-pair margin for ~15x the sf10 cost.
The floors are pinned by tests/test_skew_stress.py; raise the knob
per-call when a radius-join consumer needs direct pairs inside hot
buckets more than it needs the throughput.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from pg_telemetry_spark.cache import pin

SIMHASH_BITS = 64


def simhash(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, simhash) — 64-bit SimHash over whitespace tokens."""
    toks = docs.select(id_col, F.explode(F.split(text_col, " ")).alias("tok"))
    h = F.xxhash64("tok")
    # Branch-free vote sums (optimization r16): with s_i = number of
    # tokens whose bit i is set and n = token count, the +1/-1 vote
    # sum is exactly v_i = 2*s_i - n, so "v_i > 0" is "2*s_i > n" —
    # the per-row work drops from shift+mask+compare+branch+sum to
    # shift+mask+sum over the ~500x-exploded token stream, integer-
    # exact (bit-identical fingerprints; goldens unchanged).
    votes = [
        F.sum(F.shiftright(h, i).bitwiseAND(F.lit(1))).alias(f"s{i}")
        for i in range(SIMHASH_BITS)
    ]
    voted = toks.groupBy(id_col).agg(*votes, F.count("*").alias("n"))
    fingerprint = sum(
        [
            F.shiftleft(
                F.when(2 * F.col(f"s{i}") > F.col("n"), F.lit(1))
                .otherwise(F.lit(0))
                .cast("long"),
                i,
            )
            for i in range(SIMHASH_BITS)
        ],
        F.lit(0).cast("long"),
    )
    return voted.select(F.col(id_col), fingerprint.alias("simhash"))


def hamming(a, b):
    """Hamming distance between two simhash columns."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_chunk_candidates(
    fingerprints: DataFrame,
    id_col: str = "doc_id",
    chunks: int = 4,
    max_bucket_size: int | None = 256,
) -> DataFrame:
    """Candidate pairs sharing ≥1 exact 16-bit fingerprint chunk (the
    multi-index Hamming-ball trick: distance ≤ chunks-1 guarantees a
    shared chunk).  Returns (id1, id2, hamming).

    Chunk buckets wider than ``max_bucket_size`` degrade to STAR
    pairing against the bucket's min-id member — the same hot-bucket
    bound as the MinHash LSH join (operators/minhash.py): a
    low-entropy corpus drives thousands of near-identical fingerprints
    into the same 16-bit chunk, and the quadratic join inside such a
    bucket is what blew the round-7 sf10 leg to 883 s.  Star pairs
    carry the true pairwise Hamming distance (computed against the
    representative's fingerprint), so downstream radius filters stay
    exact; dense clusters stay connected through the representative.
    """
    width = SIMHASH_BITS // chunks
    mask = (1 << width) - 1
    chunk_cols = F.array(
        *[
            F.shiftright(F.col("simhash"), i * width).bitwiseAND(F.lit(mask))
            for i in range(chunks)
        ]
    )
    # both sides of the self-join read this frame — persist so the
    # vote-sum aggregate upstream runs once
    exploded = fingerprints.select(
        F.col(id_col), F.col("simhash"), F.posexplode(chunk_cols).alias("chunk_idx", "chunk")
    )
    exploded = pin(exploded)
    if max_bucket_size is None:
        small = exploded
        star = None
    else:
        w = Window.partitionBy("chunk_idx", "chunk")
        sized = exploded.withColumn("_bsize", F.count("*").over(w)).withColumn(
            "_bmin",
            F.min(F.struct(F.col(id_col).alias("i"), F.col("simhash").alias("s"))).over(w),
        )
        small = sized.filter(F.col("_bsize") <= max_bucket_size).drop("_bsize", "_bmin")
        star = (
            sized.filter(
                (F.col("_bsize") > max_bucket_size)
                & (F.col(id_col) != F.col("_bmin")["i"])
            )
            .select(
                F.col("_bmin")["i"].alias("id1"),
                F.col(id_col).alias("id2"),
                hamming(F.col("_bmin")["s"], F.col("simhash")).alias("hamming"),
            )
        )
    left = small.select(
        F.col(id_col).alias("id1"), F.col("simhash").alias("sh1"), "chunk_idx", "chunk"
    )
    right = small.select(
        F.col(id_col).alias("id2"), F.col("simhash").alias("sh2"), "chunk_idx", "chunk"
    )
    quad = (
        left.join(right, ["chunk_idx", "chunk"])
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2", hamming(F.col("sh1"), F.col("sh2")).alias("hamming"))
    )
    pairs = quad if star is None else quad.unionByName(star)
    return pairs.dropDuplicates(["id1", "id2"])
