"""Property tests for q51/q52 machinery: repeated-substring spans must
equal a pure-Python reference on random corpora; sequence packing must
satisfy its conservation/contiguity invariants exactly."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bucket_to_bigquery_spark.operators.substring import repeated_substring_spans

# Small vocabulary so random docs actually share windows.
WORDS = ["aa", "bb", "cc", "dd", "ee"]
docs_strategy = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=1, max_size=14).map(" ".join),
    min_size=2, max_size=6,
)


def _ref_spans(docs: dict[int, list[str]], window: int, min_df: int):
    """Brute-force reference: window occurrence sets -> marked positions
    -> gaps-and-islands merge. Positions 1-based like the operator."""
    occ: dict[tuple[str, ...], set[int]] = {}
    for d, t in docs.items():
        for i in range(len(t) - window + 1):
            occ.setdefault(tuple(t[i:i + window]), set()).add(d)
    out = {}
    for d, t in docs.items():
        pos = [
            i + 1
            for i in range(len(t) - window + 1)
            if len(occ[tuple(t[i:i + window])]) >= min_df
        ]
        if not pos:
            continue
        spans = []
        s = e = pos[0]
        for p in pos[1:]:
            if p > e + window:
                spans.append((s, e))
                s = p
            e = p
        spans.append((s, e))
        dup = sum(e - s + window for s, e in spans)
        out[d] = (len(spans), dup, len(t), dup / len(t))
    return out


@settings(max_examples=5, deadline=None)
@given(docs_strategy)
def test_repeated_spans_match_reference(spark, texts):
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_spans"], r["dup_tokens"], r["n_tokens"], r["dup_token_frac"])
        for r in repeated_substring_spans(
            df, "doc_id", "text", window=3, min_doc_freq=2
        ).collect()
    }
    expect = _ref_spans({i: t.split() for i, t in rows}, window=3, min_df=2)
    assert got == expect


def test_repeated_spans_shapes(spark):
    """Hand-checkable cases: identical docs span fully; a doc embedded in
    a longer one spans exactly the embedded run; disjoint docs emit
    nothing; sub-window docs are skipped."""
    w = 3
    a = "t1 t2 t3 t4 t5"               # 5 tokens
    b = "x1 x2 " + a + " y1"           # contains a
    rows = [(1, a), (2, b), (3, "z1 z2 z3 z4"), (4, "q1 q2")]
    got = {
        r["doc_id"]: r
        for r in repeated_substring_spans(
            spark.createDataFrame(rows, ["doc_id", "text"]),
            "doc_id", "text", window=w, min_doc_freq=2,
        ).collect()
    }
    assert set(got) == {1, 2}
    assert (got[1]["n_spans"], got[1]["dup_tokens"], got[1]["n_tokens"]) == (1, 5, 5)
    assert got[1]["dup_token_frac"] == 1.0
    # in b, the duplicated windows are a's 3 windows at positions 3..5 ->
    # one span covering tokens 3..7 (5 tokens of 8)
    assert (got[2]["n_spans"], got[2]["dup_tokens"], got[2]["n_tokens"]) == (1, 5, 8)


def _pack(spark, rows, seq_len=8, shards=2):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    tok = df.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tok"),
        (F.col("doc_id") % shards).cast("long").alias("shard_id"),
    )
    w = (
        Window.partitionBy("shard_id")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        tok.select(
            "shard_id", "doc_id", "n_tok",
            F.coalesce(F.sum("n_tok").over(w), F.lit(0)).alias("start_off"),
        )
        .select(
            "shard_id", "doc_id", "n_tok",
            F.expr(f"start_off div {seq_len}").alias("chunk_id"),
        )
        .collect()
    )


@settings(max_examples=5, deadline=None)
@given(st.lists(st.integers(min_value=1, max_value=13), min_size=1, max_size=20))
def test_sequence_packing_invariants(spark, tok_counts):
    """Concat-and-chunk assignment: chunk ids per shard are exactly the
    running-offset div seq_len of the doc_id-ordered token stream —
    non-decreasing, starting at 0, never jumping more than the doc's own
    token count allows; token totals are conserved."""
    seq_len, shards = 8, 2
    rows = [(i, " ".join(["w"] * n)) for i, n in enumerate(tok_counts)]
    got = _pack(spark, rows, seq_len, shards)
    by_shard: dict[int, list] = {}
    for r in sorted(got, key=lambda r: (r["shard_id"], r["doc_id"])):
        by_shard.setdefault(r["shard_id"], []).append(r)
    assert sum(r["n_tok"] for r in got) == sum(tok_counts)
    for shard, rs in by_shard.items():
        off = 0
        for r in rs:
            assert r["chunk_id"] == off // seq_len  # exact assignment
            off += r["n_tok"]


def _ref_scrub(docs: dict[int, list[str]], window: int, min_df: int):
    """Reference scrub: tokens minus positions covered by reference spans."""
    occ: dict[tuple[str, ...], set[int]] = {}
    for d, t in docs.items():
        for i in range(len(t) - window + 1):
            occ.setdefault(tuple(t[i:i + window]), set()).add(d)
    out = {}
    for d, t in docs.items():
        covered = set()
        for i in range(len(t) - window + 1):
            if len(occ[tuple(t[i:i + window])]) >= min_df:
                covered.update(range(i + 1, i + window + 1))  # 1-based
        kept = [tok for p, tok in enumerate(t, start=1) if p not in covered]
        out[d] = (" ".join(kept), len(t), len(kept))
    return out


@settings(max_examples=5, deadline=None)
@given(docs_strategy)
def test_substring_scrub_matches_reference(spark, texts):
    from bucket_to_bigquery_spark.operators.substring import substring_scrub

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["clean_text"], r["n_tokens"], r["n_kept"])
        for r in substring_scrub(
            df, "doc_id", "text", window=3, min_doc_freq=2
        ).collect()
    }
    expect = _ref_scrub({i: t.split() for i, t in rows}, window=3, min_df=2)
    assert got == expect


@settings(max_examples=5, deadline=None)
@given(docs_strategy)
def test_scrub_counts_equal_full_scrub(spark, texts):
    # substring_scrub_counts is the counts projection of substring_scrub
    # (span arithmetic instead of position explosion — valid because
    # merged spans are disjoint); the two must agree on every document
    from bucket_to_bigquery_spark.operators.substring import (
        substring_scrub,
        substring_scrub_counts,
    )

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    full = {
        r["doc_id"]: (r["n_tokens"], r["n_kept"], r["n_removed"])
        for r in substring_scrub(
            df, "doc_id", "text", window=3, min_doc_freq=2
        ).collect()
    }
    counts = {
        r["doc_id"]: (r["n_tokens"], r["n_kept"], r["n_removed"])
        for r in substring_scrub_counts(
            df, "doc_id", "text", window=3, min_doc_freq=2
        ).collect()
    }
    assert counts == full


def test_substring_scrub_shapes(spark):
    """Identical docs scrub to empty; a doc embedding another loses
    exactly the embedded run; untouched docs pass through verbatim
    (normalized); token accounting is conserved."""
    from bucket_to_bigquery_spark.operators.substring import substring_scrub

    a = "t1 t2 t3 t4 t5"
    rows = [(1, a), (2, "x1 x2 " + a + " y1"), (3, "z1 z2 z3 z4")]
    got = {
        r["doc_id"]: r
        for r in substring_scrub(
            spark.createDataFrame(rows, ["doc_id", "text"]),
            "doc_id", "text", window=3, min_doc_freq=2,
        ).collect()
    }
    assert set(got) == {1, 2, 3}  # every input doc comes back
    assert got[1]["clean_text"] == "" and got[1]["n_kept"] == 0
    assert got[2]["clean_text"] == "x1 x2 y1" and got[2]["n_removed"] == 5
    assert got[3]["clean_text"] == "z1 z2 z3 z4" and got[3]["n_removed"] == 0
    for r in got.values():
        assert r["n_kept"] + r["n_removed"] == r["n_tokens"]


def test_full_pipeline_composes_stage_invariants(spark, sf_dir):
    """Structural invariants of q54's manifest (full value correctness
    is the oracle-parity test's job): the pipeline kept fewer docs than
    the gates alone (so dedup dropped something), chunk ids per shard
    are contiguous from 0, doc-id ranges are ordered and consistent
    with their shard, and token counts are positive."""
    from bucket_to_bigquery_spark.queries import all_queries
    from bucket_to_bigquery_spark.queries.llm_queries import (
        _dedup_corpus,
        quality_gates,
    )
    from bucket_to_bigquery_spark.queries.pipeline_queries import _Q52_SHARDS

    manifest = all_queries()["q54_full_pipeline"].builder(spark, sf_dir).collect()
    assert manifest, "pipeline produced no chunks"
    n_docs = sum(r["n_docs"] for r in manifest)
    n_tokens = sum(r["n_tokens"] for r in manifest)

    corpus = _dedup_corpus(spark, sf_dir)
    kept = quality_gates(corpus).where("kept").count()
    assert 0 < n_docs < kept  # gates passed some docs AND dedup dropped some

    by_shard = {}
    for r in manifest:
        by_shard.setdefault(r["shard_id"], []).append(r)
        # doc-id range is ordered and every endpoint belongs to the shard
        assert r["first_doc"] <= r["last_doc"]
        assert r["first_doc"] % _Q52_SHARDS == r["shard_id"]
        assert r["last_doc"] % _Q52_SHARDS == r["shard_id"]
        assert r["n_tokens"] > 0 and r["n_docs"] > 0
    for rs in by_shard.values():
        # chunk ids contiguous from 0; doc ranges non-overlapping in order
        cids = [r["chunk_id"] for r in rs]
        assert sorted(cids) == list(range(len(cids)))
        rs = sorted(rs, key=lambda r: r["chunk_id"])
        for a, b in zip(rs, rs[1:]):
            assert a["last_doc"] < b["first_doc"]
    assert n_tokens > 0
