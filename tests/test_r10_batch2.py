"""Behavioral pins for the second r10 batch (scd.py / chunking.py /
splits.py) beyond the automatic oracle-parity rows.

Each query's value-hash parity vs DuckDB runs in test_oracle_parity.py;
these tests pin the SEMANTIC contracts the parity hash alone would not
explain to a reader: SCD-2 interval algebra, chunk coverage/overlap
arithmetic, and the split's leakage guarantee under planted duplicates.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bucket_to_bigquery_spark.queries import all_queries

QUERIES = all_queries()


def _run(name, spark, sf_dir):
    return QUERIES[name].builder(spark, sf_dir)


# ---------------------------------------------------------------------------
# q70 — SCD-2 dimension build
# ---------------------------------------------------------------------------


def test_q70_interval_algebra(spark, sf_dir):
    """SCD-2 invariants: exactly one current row per user; versions are
    1..n contiguous; valid_to equals the NEXT version's valid_from
    (touching, never overlapping, never gapped); adjacent versions never
    share a status (else they'd be one run)."""
    df = _run("q70_scd2_dimension", spark, sf_dir).collect()
    by_user: dict[int, list] = {}
    for r in df:
        by_user.setdefault(r.user_id, []).append(r)
    assert by_user
    for user, rows in by_user.items():
        rows.sort(key=lambda r: r.version)
        assert [r.version for r in rows] == list(range(1, len(rows) + 1))
        assert sum(r.is_current for r in rows) == 1
        assert rows[-1].is_current and rows[-1].valid_to is None
        for a, b in zip(rows, rows[1:]):
            assert a.valid_to == b.valid_from, (user, a, b)
            assert a.status != b.status, (user, a, b)


def test_q70_event_conservation(spark, sf_dir):
    """Every event lands in exactly one version: n_events sums to the
    event count, per user."""
    from bucket_to_bigquery_spark.queries.registry import tables

    ev = tables(spark, sf_dir)["events"].groupBy("user_id").count()
    got = (
        _run("q70_scd2_dimension", spark, sf_dir)
        .groupBy("user_id")
        .agg(F.sum("n_events").alias("n"))
    )
    mismatches = (
        ev.join(got, "user_id", "full")
        .where(F.coalesce("count", F.lit(-1)) != F.coalesce("n", F.lit(-2)))
        .count()
    )
    assert mismatches == 0


# ---------------------------------------------------------------------------
# q71 — overlapping chunking
# ---------------------------------------------------------------------------


def test_q71_coverage_and_overlap(spark, sf_dir):
    """Chunk arithmetic: starts at 0 with stride 400; every char of the
    document is covered (last chunk reaches the end); chunk lengths are
    500 except the tail; exactly one is_last per chunked doc; empty docs
    yield no rows."""
    rows = _run("q71_document_chunking", spark, sf_dir).collect()
    assert rows
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc, ch in by_doc.items():
        ch.sort(key=lambda r: r.chunk_idx)
        assert [c.chunk_idx for c in ch] == list(range(len(ch)))
        assert all(c.chunk_start == 400 * c.chunk_idx for c in ch)
        assert sum(c.is_last for c in ch) == 1 and ch[-1].is_last
        # the last window starts within stride of the end (no offset was
        # skipped), so reconstructing doc length from it is exact …
        doc_len = ch[-1].chunk_start + ch[-1].chunk_chars
        assert doc_len - ch[-1].chunk_start <= 400
        # … and every chunk is the full window clipped at the end: a
        # non-last chunk can legitimately carry 401–499 chars when the
        # document ends inside ITS window but after the next offset.
        for c in ch:
            assert c.chunk_chars == min(500, doc_len - c.chunk_start), (doc, c)
            assert len(c.chunk_text) == c.chunk_chars
        # contiguous coverage: each non-last window reaches past the
        # next window's start (chars > stride)
        assert all(c.chunk_chars > 400 for c in ch[:-1])


# ---------------------------------------------------------------------------
# q72 / q72b — leakage-safe split
# ---------------------------------------------------------------------------


def test_q72_planted_duplicates_cotravel(spark, sf_dir):
    """The leakage guarantee, exercised: every planted copy (doc_id + 100000)
    lands on the same side as its original, and shares its text_hash."""
    rows = {r.doc_id: r for r in _run("q72_leakage_safe_split", spark, sf_dir).collect()}
    planted = [d for d in rows if d >= 100000]
    assert planted
    for d in planted:
        orig = rows[d - 100000]
        assert rows[d].text_hash == orig.text_hash
        assert rows[d].split == orig.split, d


def test_q72_split_is_group_deterministic(spark, sf_dir):
    """Same text_hash ⇒ same split across ALL docs (not just planted
    pairs), and the bucket is the salted md5 permyriad of the hash."""
    rows = _run("q72_leakage_safe_split", spark, sf_dir).collect()
    seen: dict[str, str] = {}
    for r in rows:
        assert (r.split == "train") == (r.split_bucket < 9000)
        assert seen.setdefault(r.text_hash, r.split) == r.split


def test_q72b_zero_straddlers_and_conservation(spark, sf_dir):
    """The audit must report zero straddling groups, and its doc counts
    must sum to the corpus size (originals + planted copies)."""
    rows = _run("q72b_split_leakage_audit", spark, sf_dir).collect()
    assert sum(r.n_straddling for r in rows) == 0
    n_docs = sum(r.n_docs for r in rows)
    assigned = _run("q72_leakage_safe_split", spark, sf_dir).count()
    assert n_docs == assigned
