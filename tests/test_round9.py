"""Round-9 additions: the production-shaped screened decontamination
(bloom pre-screen -> exact audit on flagged rows only)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def _docs(spark):
    texts = [
        "alpha beta gamma delta epsilon zeta",
        "alpha beta gamma something else entirely here",
        "unrelated words with no overlap at all present",
        "x",  # too short for a 3-shingle: n_shingles = 0
    ]
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        "doc_id long, text string",
    )


def test_contamination_screened_golden(spark):
    from pennsieve_streaming_spark.llm.curation import (
        contamination_screened,
    )

    docs = _docs(spark)
    bench = docs.filter(F.col("doc_id") == 0)
    out = {
        r.doc_id: r
        for r in contamination_screened(docs, bench, k=3).collect()
    }
    assert len(out) == 4
    # doc0 IS the benchmark: 4 shingles, all overlap, contaminated
    assert out[0].n_shingles == 4 and out[0].n_overlap == 4
    assert out[0].contaminated
    # doc1 shares exactly the "alpha beta gamma" shingle
    assert out[1].n_shingles == 5 and out[1].n_overlap == 1
    assert not out[1].contaminated
    # doc2: no overlap; screen may or may not fire (bloom FPs), but
    # the exact audit must report 0
    assert out[2].n_overlap == 0 and not out[2].contaminated
    # doc3: no shingles -> all-zero row, ratio 0.0
    assert out[3].n_shingles == 0 and out[3].n_overlap == 0
    assert out[3].overlap_ratio == 0.0 and not out[3].contaminated


def test_contamination_screened_matches_exact(spark):
    """The no-false-negatives contract: verdicts and overlap counts
    identical to the exact contamination operator on every doc."""
    from pennsieve_streaming_spark.llm.curation import (
        contamination,
        contamination_screened,
    )

    docs = _docs(spark)
    bench = docs.filter(F.col("doc_id") % 2 == 0)
    exact = {
        r.doc_id: r for r in contamination(docs, bench, k=3).collect()
    }
    screened = {
        r.doc_id: r
        for r in contamination_screened(docs, bench, k=3).collect()
    }
    assert set(exact) == set(screened)
    for i in exact:
        assert screened[i].n_shingles == exact[i].n_shingles
        assert screened[i].n_overlap == exact[i].n_overlap
        assert screened[i].contaminated == exact[i].contaminated
        # and the screen itself never under-counts the exact hits
        assert screened[i].n_bloom_hits >= screened[i].n_overlap
