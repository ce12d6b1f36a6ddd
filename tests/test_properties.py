"""Property-based invariants over random small event sets (SURVEY §5).

One shared SparkSession, small generated inputs, and invariants that
must hold for ANY input — the complement to the fixture-pinned oracle
tests.
"""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from pg_telemetry_spark.operators.minhash import near_duplicates
from pg_telemetry_spark.queries.timeseries import sessionize

_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("value", T.DoubleType()),
    ]
)

_events = st.lists(
    st.tuples(
        st.integers(0, 3),  # user_id
        st.integers(0, 86_400 * 3),  # seconds offset
        st.floats(0.5, 1000, allow_nan=False),
    ),
    min_size=1,
    max_size=40,
    unique_by=lambda t: (t[0], t[1]),
)

_slow = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _df(spark, rows):
    data = [
        (u, i, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s), round(v, 2))
        for i, (u, s, v) in enumerate(rows)
    ]
    return spark.createDataFrame(data, _SCHEMA)


@_slow
@given(_events)
def test_sessions_partition_events(spark, rows):
    """Session event counts sum to the input count; every session has
    ≥1 event and non-negative duration ≤ its event span."""
    df = _df(spark, rows)
    sess = sessionize(df, 1800).collect()
    assert sum(r.n_events for r in sess) == len(rows)
    for r in sess:
        assert r.n_events >= 1
        assert r.duration_seconds >= 0
        assert r.session_start <= r.session_end


@_slow
@given(_events)
def test_tumbling_buckets_partition_rows(spark, rows):
    df = _df(spark, rows)
    bucketed = df.groupBy(F.window("ts", "1 hour").start.alias("b")).agg(
        F.count("*").alias("n")
    )
    assert bucketed.agg(F.sum("n")).head()[0] == len(rows)


@_slow
@given(_events)
def test_counter_delta_reset_guard_nonnegative(spark, rows):
    from pyspark.sql import Window

    df = _df(spark, rows)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    delta = df.select(
        (F.col("value") - F.lag("value").over(w)).alias("d")
    ).filter(F.col("d").isNotNull())
    guarded = delta.select(F.greatest("d", F.lit(0.0)).alias("g"))
    assert guarded.filter(F.col("g") < 0).count() == 0


@_slow
@given(_events)
def test_dedup_idempotent(spark, rows):
    df = _df(spark, rows)
    doubled = df.unionByName(df)
    once = doubled.dropDuplicates(["event_id"])
    twice = once.dropDuplicates(["event_id"])
    assert once.count() == df.count() == twice.count()


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.lists(
        st.text(alphabet="abcdef ", min_size=12, max_size=60),
        min_size=2,
        max_size=12,
        unique=True,
    )
)
def test_near_dup_self_pairs_always_found(spark, texts):
    """A corpus containing each doc twice must report every (i, i+N)
    self-pair at Jaccard 1.0."""
    n = len(texts)
    rows = [(i, t) for i, t in enumerate(texts)] + [
        (i + n, t) for i, t in enumerate(texts)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    found = {
        (r.id1, r.id2): r.jaccard
        for r in near_duplicates(df, threshold=0.99).collect()
    }
    for i in range(n):
        assert found.get((i, i + n)) == 1.0, f"exact self-pair {i} missed"


_texts = st.lists(
    st.text(alphabet="ab cdef", min_size=1, max_size=200).map(
        lambda s: " ".join(s.split()) or "x"
    ),
    min_size=1,
    max_size=12,
)


@given(texts=_texts)
@_slow
def test_chunking_reconstructs_tokens(spark, texts):
    """llm_chunk_docs invariant: stitching each doc's chunks back
    together (drop the 10-token overlap from every chunk after the
    first) reproduces the original token sequence exactly — no token
    lost or duplicated for ANY text."""
    rows = [(i, t) for i, t in enumerate(texts)]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    toks = docs.select("doc_id", F.split("text", " ").alias("t"))
    n_chunks = F.floor((F.size("t") - 1) / 40).cast("int") + 1
    chunks = toks.select(
        "doc_id", "t", F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("cid")
    ).select(
        "doc_id",
        "cid",
        F.slice("t", F.col("cid") * 40 + 1, 50).alias("piece"),
    )
    got = {}
    for r in chunks.collect():
        got.setdefault(r.doc_id, {})[r.cid] = list(r.piece)
    for doc_id, text in rows:
        pieces = got[doc_id]
        stitched: list = []
        for cid in sorted(pieces):
            p = pieces[cid]
            stitched.extend(p if cid == 0 else p[10:] if len(p) > 10 else [])
        # trailing chunks shorter than the overlap add nothing new
        expected = text.split(" ")
        assert stitched[: len(expected)] == expected
        assert len(stitched) == len(expected)


@given(
    sizes=st.lists(st.integers(1, 400), min_size=1, max_size=50),
)
@_slow
def test_packing_bins_bounded_overflow(spark, sizes):
    """llm_pack_sequences invariant: every bin's token total is under
    cap + max(doc) — the one-pass packer can overflow by at most one
    document — and bin ids are dense from 0 in doc order."""
    cap = 512
    rows = [(i, n) for i, n in enumerate(sizes)]
    sized = spark.createDataFrame(rows, "doc_id bigint, n_tok bigint")
    from pyspark.sql import Window as W

    w = W.orderBy("doc_id").rowsBetween(W.unboundedPreceding, -1)
    packed = sized.withColumn(
        "bin_id",
        F.coalesce(F.floor(F.sum("n_tok").over(w) / float(cap)), F.lit(0)).cast(
            "long"
        ),
    )
    bins = (
        packed.groupBy("bin_id")
        .agg(F.sum("n_tok").alias("tot"))
        .collect()
    )
    max_doc = max(sizes)
    for b in bins:
        assert b.tot < cap + max_doc
    ids = sorted(r.bin_id for r in bins)
    assert ids == list(range(len(ids)))


@given(
    vals=st.lists(
        st.floats(-100, 100, allow_nan=False, allow_infinity=False),
        min_size=1,
        max_size=30,
    )
)
@_slow
def test_ewma_matches_local_fold(spark, vals):
    """ts_ewma's higher-order fold equals the plain Python recurrence
    for ANY series (alpha=0.2, seeded with the first value)."""
    rows = [(0, i, float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "user_id bigint, seq bigint, value double")
    vs = F.transform(
        F.array_sort(F.collect_list(F.struct("seq", "value"))), lambda s: s["value"]
    )
    series = df.groupBy("user_id").agg(vs.alias("vs"))
    ewma = F.aggregate(
        F.slice("vs", 2, F.greatest(F.size("vs") - 1, F.lit(0))),
        F.element_at("vs", 1),
        lambda acc, x: F.lit(0.2) * x + F.lit(0.8) * acc,
    )
    got = series.select(ewma.alias("e")).head().e
    acc = vals[0]
    for v in vals[1:]:
        acc = 0.2 * v + 0.8 * acc
    assert abs(got - acc) < 1e-9


_texts = st.lists(
    st.lists(
        st.sampled_from(["alpha", "beta", "gamma", "delta", "word", "x"]),
        min_size=1,
        max_size=60,
    ).map(" ".join),
    min_size=1,
    max_size=8,
)


@_slow
@given(texts=_texts)
def test_cdc_chunks_partition_every_document(spark, texts):
    """CDC chunking is a PARTITION of the token stream: per doc,
    chunk token counts sum to the doc's token count, and the chunk
    count is boundaries+1 — for any input."""
    from pg_telemetry_spark.queries.curation import cdc_chunk_report

    rows = [(i, f"s{i}", t) for i, t in enumerate(texts)]
    d = spark.createDataFrame(rows, "doc_id LONG, source STRING, text STRING")
    rep = {r["source"]: r for r in cdc_chunk_report(d).collect()}
    for i, t in enumerate(texts):
        n_tok = len(t.split(" "))
        r = rep[f"s{i}"]
        # avg * count == total tokens (avg is rounded to 6 — tolerate)
        assert abs(r["avg_chunk_tokens"] * r["n_chunks"] - n_tok) < 1e-3
        assert 1 <= r["n_chunks"] <= n_tok


@_slow
@given(texts=_texts)
def test_bpe_apply_reconstructs_and_compresses(spark, texts):
    """BPE invariants for any corpus: concatenating a word's symbols
    reproduces the word, and applying merges never increases the
    symbol count."""
    import pyspark.sql.functions as F2

    from pg_telemetry_spark.queries.bpe import bpe_apply_to_vocab, bpe_train

    docs = spark.createDataFrame([(t,) for t in texts], "text STRING")
    merges = bpe_train(docs, n_merges=3)
    vocab = (
        docs.select(F2.explode(F2.split("text", " ")).alias("w"))
        .filter(F2.length("w") > 0)
        .distinct()
        .select("w", F2.expr("filter(split(w, ''), s -> s != '')").alias("syms"))
    )
    for r in bpe_apply_to_vocab(vocab, merges).collect():
        assert "".join(r["syms"]) == r["w"]
        assert len(r["syms"]) <= len(r["w"])
