"""Training-mixture construction ops (round 9): curriculum ordering,
deterministic rare-domain oversampling, and a Kneser-Ney bigram LM.

These are the steps between "corpus is cleaned" and "corpus is a
training set": decide the ORDER examples are seen in (curriculum),
re-weight under-represented sources to a target mix (oversampling),
and score fluency with the smoothing that n-gram LM filtering
actually uses in practice (Kneser-Ney, not add-1).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from pg_telemetry_spark.registry import query
from pg_telemetry_spark.tables import load_table

_MD5B = (
    "((instr('0123456789abcdef', substring(md5(CAST(doc_id AS {str_t})), 1, 1)) - 1) * 256"
    " + (instr('0123456789abcdef', substring(md5(CAST(doc_id AS {str_t})), 2, 1)) - 1) * 16"
    " + (instr('0123456789abcdef', substring(md5(CAST(doc_id AS {str_t})), 3, 1)) - 1))"
)


@query(
    "llm_curriculum_order",
    group="mixture",
    oracle="""
WITH scored AS (
  SELECT doc_id,
         round(CAST(n_chars AS DOUBLE) / len(string_split(text, ' ')), 6)
           AS difficulty
  FROM documents
), staged AS (
  SELECT doc_id, difficulty,
         ntile(10) OVER (ORDER BY difficulty, doc_id) AS stage
  FROM scored
), sched AS (
  SELECT doc_id, difficulty, stage,
         (row_number() OVER (PARTITION BY stage ORDER BY difficulty, doc_id)
            - 1) * 10 + stage AS sched_rank
  FROM staged
)
SELECT doc_id, difficulty, stage, sched_rank
FROM sched ORDER BY sched_rank, doc_id LIMIT 50
""",
)
def llm_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum schedule: score each document's difficulty (mean
    token length — the cheap deterministic proxy; production swaps in
    a model score), split into 10 difficulty stages with ntile, then
    interleave the stages round-robin so every training window sees
    the full difficulty spectrum (sched_rank = within-stage rank * 10
    + stage).  Returns the first 50 schedule slots.

    Scale shape: the ntile/rank windows are global-ORDER-BY windows —
    fine at fixture scale, and the documented scale path is the same
    two-pass range partitioning a global sort uses (Spark plans
    exactly that under the hood: RangePartitioning on the order key);
    the schedule is consumed lazily (LIMIT pushes down through the
    final sort as TakeOrdered)."""
    d = load_table(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id",
        F.round(
            F.col("n_chars").cast("double") / F.size(F.split("text", " ")), 6
        ).alias("difficulty"),
    )
    w = Window.orderBy("difficulty", "doc_id")
    staged = scored.withColumn("stage", F.ntile(10).over(w))
    ws = Window.partitionBy("stage").orderBy("difficulty", "doc_id")
    sched = staged.withColumn(
        "sched_rank", (F.row_number().over(ws) - 1) * 10 + F.col("stage")
    )
    return sched.orderBy("sched_rank", "doc_id").limit(50)


@query(
    "llm_oversample_rare",
    group="mixture",
    oracle=f"""
WITH counts AS (
  SELECT source, count(*) AS n FROM documents GROUP BY source
), mx AS (
  SELECT max(n) AS mx FROM counts
), w AS (
  SELECT d.doc_id, d.source,
         CAST(mx.mx AS DOUBLE) / c.n AS wt,
         {_MD5B.format(str_t="VARCHAR")} AS b
  FROM documents d JOIN counts c USING (source) CROSS JOIN mx
), reps AS (
  SELECT doc_id, source, wt,
         CAST(floor(wt) AS BIGINT)
           + CASE WHEN b < floor((wt - floor(wt)) * 4096) THEN 1 ELSE 0 END
           AS n_rep
  FROM w
), emitted AS (
  SELECT r.source, r.wt, r.doc_id
  FROM reps r, unnest(range(1, CAST(r.n_rep AS INT) + 1)) u(i)
)
SELECT source,
       count(DISTINCT doc_id) AS n_docs,
       count(*) AS n_emitted,
       round(any_value(wt), 6) AS target_weight,
       round(CAST(count(*) AS DOUBLE) / count(DISTINCT doc_id), 6)
         AS achieved_weight
FROM emitted GROUP BY source
""",
)
def llm_oversample_rare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic rare-domain oversampling to a uniform source mix:
    every source is up-weighted to the size of the LARGEST source
    (weight = max_n / n), each document repeated floor(weight) times
    plus one stochastic-rounding extra decided by its md5 bucket —
    the engine-independent per-doc coin llm_split_hash uses, so the
    emitted multiset is bit-reproducible anywhere.  Reports per
    source: emitted count and achieved vs target weight.

    Scale shape: weights are a broadcast source-count table (sources
    are low-cardinality); the emit is explode(sequence(1, n_rep)) —
    output-proportional, no shuffle until the final small agg; the
    per-doc coin is a projection.  The same plan shape oversamples a
    100 TB corpus: the explode runs map-side in the write path."""
    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(F.count("*").alias("n"))
    mx = counts.agg(F.max("n").alias("mx"))
    hexd = "0123456789abcdef"
    b = (
        (F.expr(f"instr('{hexd}', substring(md5(CAST(doc_id AS STRING)), 1, 1))") - 1)
        * 256
        + (F.expr(f"instr('{hexd}', substring(md5(CAST(doc_id AS STRING)), 2, 1))") - 1)
        * 16
        + (F.expr(f"instr('{hexd}', substring(md5(CAST(doc_id AS STRING)), 3, 1))") - 1)
    )
    wt = F.col("mx").cast("double") / F.col("n")
    reps = (
        d.select("doc_id", "source")
        .join(F.broadcast(counts), "source")
        .crossJoin(F.broadcast(mx))
        .select(
            "doc_id",
            "source",
            wt.alias("wt"),
            (
                F.floor(wt).cast("bigint")
                + F.when(
                    b < F.floor((wt - F.floor(wt)) * 4096), F.lit(1)
                ).otherwise(F.lit(0))
            ).alias("n_rep"),
        )
    )
    emitted = reps.select(
        "source",
        "wt",
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.col("n_rep").cast("int"))).alias("i"),
    )
    return emitted.groupBy("source").agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.count("*").alias("n_emitted"),
        F.round(F.any_value("wt"), 6).alias("target_weight"),
        F.round(
            F.count("*").cast("double") / F.countDistinct("doc_id"), 6
        ).alias("achieved_weight"),
    )


@query(
    "llm_kn_bigram",
    group="mixture",
    oracle="""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), grams AS (
  SELECT t[i] AS w1, t[i + 1] AS w2
  FROM toks, unnest(range(1, len(t))) u(i)
  WHERE len(t) >= 2
), bi AS (
  SELECT w1, w2, count(*) AS b_n FROM grams GROUP BY w1, w2
), uni AS (
  SELECT w1, sum(b_n) AS u_n, count(*) AS fw FROM bi GROUP BY w1
), bw AS (
  SELECT w2, count(*) AS bw FROM bi GROUP BY w2
), tot AS (
  SELECT count(*) AS nb FROM bi
)
SELECT b.w1, b.w2, b.b_n,
       round(
         (b.b_n - 0.75) / u.u_n
         + (0.75 * u.fw / u.u_n) * (CAST(bw.bw AS DOUBLE) / tot.nb), 6
       ) AS p_kn
FROM bi b JOIN uni u ON b.w1 = u.w1 JOIN bw ON b.w2 = bw.w2 CROSS JOIN tot
ORDER BY b.b_n DESC, b.w1, b.w2 LIMIT 20
""",
)
def llm_kn_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram probabilities (Kneser & Ney
    1995; Chen & Goodman 1999's interpolated variant, discount
    d=0.75): P(w2|w1) = max(c(w1,w2)-d, 0)/c(w1) + d·N1+(w1,·)/c(w1)
    · N1+(·,w2)/N1+(·,·).  The continuation probability counts HOW
    MANY contexts a word follows, not how often — the property that
    makes KN the n-gram smoothing production LM filters use.  Top-20
    bigrams by count (every observed bigram has c >= 1 > d, so the
    max() is the identity on this output and omitted from both
    sides).

    Scale shape: everything derives from the bigram count table (one
    shuffle on the gram key); unigram totals, forward fan-out N1+(w1,·)
    and backward fan-in N1+(·,w2) are re-aggregations of that compact
    table, and the N1+(·,·) denominator is a broadcast 1-row scalar —
    the llm_tfidf no-collect pattern.  Final TakeOrdered(20)."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(F.split("text", " ").alias("t")).filter(F.size("t") >= 2)
    grams = toks.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("t") - 1),
                lambda i: F.struct(
                    F.element_at("t", i).alias("w1"),
                    F.element_at("t", i + F.lit(1)).alias("w2"),
                ),
            )
        ).alias("g")
    ).select("g.w1", "g.w2")
    bi = grams.groupBy("w1", "w2").agg(F.count("*").alias("b_n"))
    uni = bi.groupBy("w1").agg(
        F.sum("b_n").alias("u_n"), F.count("*").alias("fw")
    )
    bw = bi.groupBy("w2").agg(F.count("*").alias("bw"))
    tot = bi.agg(F.count("*").alias("nb"))
    p_kn = (F.col("b_n") - 0.75) / F.col("u_n") + (
        0.75 * F.col("fw") / F.col("u_n")
    ) * (F.col("bw").cast("double") / F.col("nb"))
    return (
        bi.join(uni, "w1")
        .join(bw, "w2")
        .crossJoin(F.broadcast(tot))
        .select("w1", "w2", "b_n", F.round(p_kn, 6).alias("p_kn"))
        .orderBy(F.desc("b_n"), "w1", "w2")
        .limit(20)
    )


@query(
    "llm_hash_features",
    group="mixture",
    oracle="""
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS tok FROM documents
), hashed AS (
  SELECT tok,
         ((instr('0123456789abcdef', substring(md5(tok), 1, 1)) - 1) * 16
          + (instr('0123456789abcdef', substring(md5(tok), 2, 1)) - 1)) % 64
           AS bucket
  FROM toks
)
SELECT bucket,
       count(*) AS n_tokens,
       count(DISTINCT tok) AS n_distinct,
       min(tok) AS sample_tok
FROM hashed GROUP BY bucket
""",
)
def llm_hash_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature hashing (the hashing trick, Weinberger et al. 2009):
    project an unbounded vocabulary into a fixed 64-bucket feature
    space via an engine-independent md5 bucket — the collision report
    per bucket (token mass, distinct tokens, deterministic sample) is
    what you inspect before committing to a hashed-feature width.

    Scale shape: explode + map-side bucket projection + one 64-key
    hash agg with map-side combine; the vocabulary never materializes
    anywhere (that's the point of the trick — memory is O(buckets)
    regardless of corpus)."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(F.explode(F.split("text", " ")).alias("tok"))
    hexd = "0123456789abcdef"
    bucket = (
        (F.expr(f"instr('{hexd}', substring(md5(tok), 1, 1))") - 1) * 16
        + (F.expr(f"instr('{hexd}', substring(md5(tok), 2, 1))") - 1)
    ) % 64
    return (
        toks.select("tok", bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_tokens"),
            F.countDistinct("tok").alias("n_distinct"),
            F.min("tok").alias("sample_tok"),
        )
    )


@query(
    "llm_temperature_mix",
    group="curation",
    oracle="""
WITH src AS (
  SELECT source, count(*) AS n_docs FROM documents GROUP BY source
), tot AS (
  SELECT sum(n_docs) AS n FROM src
), smooth AS (
  SELECT source, n_docs,
         round(CAST(n_docs AS DOUBLE) / n, 6) AS p_raw,
         CAST(round(sqrt(CAST(n_docs AS DOUBLE) / n), 12)
              AS DECIMAL(20,12)) AS s
  FROM src CROSS JOIN tot
), denom AS (
  SELECT sum(s) AS d FROM smooth
)
SELECT source, n_docs, p_raw,
       round(CAST(s AS DOUBLE) / CAST(d AS DOUBLE), 6) AS q_alpha,
       CAST(floor(CAST(s AS DOUBLE) / CAST(d AS DOUBLE) * 1000000.0)
            AS BIGINT) AS per_million
FROM smooth CROSS JOIN denom
ORDER BY source
""",
)
def llm_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based source re-weighting (the multilingual-LM
    sampling recipe of Conneau & Lample 2019 / mT5, alpha = 0.5):
    raw source shares p_i are flattened to q_i proportional to
    p_i^alpha, boosting low-resource sources without drowning
    high-resource ones; reports both distributions and the per-million
    sample allocation.

    Determinism at scale: the alpha power is one sqrt per SOURCE
    (correctly-rounded IEEE on both engines), each value is rounded to
    12 decimals and summed as EXACT DECIMALS (detsum discipline — the
    normalizing denominator is order-independent), and the final
    quotient divides identical doubles.  Scale shape: one count
    aggregate on source, then arithmetic over the (tiny) source
    dimension broadcast via two 1-row cross joins — the corpus is
    touched exactly once."""
    d = load_table(spark, sf_dir, "documents")
    src = d.groupBy("source").agg(F.count("*").alias("n_docs"))
    tot = src.agg(F.sum("n_docs").alias("n"))
    smooth = src.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        F.round(F.col("n_docs").cast("double") / F.col("n"), 6).alias("p_raw"),
        F.round(F.sqrt(F.col("n_docs").cast("double") / F.col("n")), 12)
        .cast("decimal(20,12)")
        .alias("s"),
    )
    denom = smooth.agg(F.sum("s").alias("d"))
    q = F.col("s").cast("double") / F.col("d").cast("double")
    return (
        smooth.crossJoin(F.broadcast(denom))
        .select(
            "source",
            "n_docs",
            "p_raw",
            F.round(q, 6).alias("q_alpha"),
            F.floor(q * 1000000.0).cast("bigint").alias("per_million"),
        )
        .orderBy("source")
    )
