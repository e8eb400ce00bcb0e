"""Property test for the bigram-LM fluency score (q49m's operator logic):
the Spark pipeline must equal a pure-Python MLE bigram model on random
corpora — a third implementation, independent of both the Catalyst plan
and the DuckDB oracle."""

from __future__ import annotations

import math
from collections import Counter
from decimal import Decimal

from hypothesis import given, settings
from hypothesis import strategies as st

WORDS = ["aa", "bb", "cc", "dd", "ee"]
docs_strategy = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=0, max_size=10).map(" ".join),
    min_size=1, max_size=8,
)


def _reference_scores(texts):
    """Pure-Python MLE bigram LM over the corpus, q49m's exact contract:
    per-term round(ln(c(ab)/c(a·)), 6), decimal-summed, averaged."""
    bigrams_per_doc = []
    cab: Counter = Counter()
    ca: Counter = Counter()
    for t in texts:
        toks = [w for w in t.lower().split() if w]
        bgs = list(zip(toks, toks[1:]))
        bigrams_per_doc.append(bgs)
        for ab in bgs:
            cab[ab] += 1
            ca[ab[0]] += 1
    out = {}
    for i, bgs in enumerate(bigrams_per_doc):
        if not bgs:
            continue
        terms = [round(math.log(cab[ab] / ca[ab[0]]), 6) for ab in bgs]
        total = sum(Decimal(str(t)) for t in terms)
        out[i] = (len(bgs), float(total) / len(bgs))
    return out


@settings(max_examples=20, deadline=None)
@given(docs_strategy)
def test_bigram_lm_matches_pure_python(spark, texts):
    from bucket_to_bigquery_spark.operators.lm import bigram_lm_scores

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_bigrams"], r["avg_logprob"])
        for r in bigram_lm_scores(df).collect()
    }
    ref = _reference_scores(texts)
    assert set(got) == set(ref)
    for doc_id, (n, avg) in ref.items():
        gn, gavg = got[doc_id]
        assert gn == n, doc_id
        assert abs(gavg - avg) < 1e-12, (doc_id, gavg, avg)
