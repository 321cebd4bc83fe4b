"""JSONL/CSV corpus ingest: lossless round trips + corrupt-row
quarantine."""

from __future__ import annotations

import os
import tempfile

from pennsieve_streaming_spark.sources.text import (
    CORRUPT_COL,
    quarantine_split,
    read_csv_corpus,
    read_jsonl_corpus,
    write_csv_corpus,
    write_jsonl_corpus,
)

NASTY = [
    (1, 'line1\nline2\n"quoted"', "en", "web", 20),
    (2, "comma, semicolon; tab\there", "en", "web", 25),
    (3, "unicode: Grüße, 中文, emoji \U0001f600", "de", "books", 30),
    (4, "", "en", "web", 0),
    (5, 'all "the" quotes ""doubled"" even', "en", "web", 33),
]


def _docs(spark):
    return spark.createDataFrame(
        NASTY, "doc_id long, text string, lang string, source string, n_chars long"
    )


def _roundtrip(spark, writer, reader):
    path = tempfile.mkdtemp(prefix="pss_txt_") + "/corpus"
    writer(_docs(spark), path, shards=2)
    clean, bad = quarantine_split(reader(spark, path))
    assert bad.count() == 0
    got = sorted(map(tuple, clean.collect()))
    assert got == sorted(NASTY)


def test_jsonl_roundtrip_nasty_content(spark):
    _roundtrip(spark, write_jsonl_corpus, read_jsonl_corpus)


def test_csv_roundtrip_nasty_content(spark):
    _roundtrip(spark, write_csv_corpus, read_csv_corpus)


def test_jsonl_corrupt_rows_quarantined(spark):
    path = tempfile.mkdtemp(prefix="pss_txt_") + "/corpus"
    os.makedirs(path)
    with open(f"{path}/part-0.json", "w") as f:
        f.write('{"doc_id": 1, "text": "ok", "lang": "en", "source": "w", "n_chars": 2}\n')
        f.write("this is not json at all\n")
        f.write('{"doc_id": 2, "text": "also ok", "lang": "en", "source": "w", "n_chars": 7}\n')
    clean, bad = quarantine_split(read_jsonl_corpus(spark, path))
    assert sorted(r.doc_id for r in clean.collect()) == [1, 2]
    [b] = bad.collect()
    assert "not json" in b[CORRUPT_COL]


def test_jsonl_type_mismatch_quarantined(spark):
    path = tempfile.mkdtemp(prefix="pss_txt_") + "/corpus"
    os.makedirs(path)
    with open(f"{path}/part-0.json", "w") as f:
        f.write('{"doc_id": "NOT_A_NUMBER", "text": "x", "lang": "en", "source": "w", "n_chars": 1}\n')
    _clean, bad = quarantine_split(read_jsonl_corpus(spark, path))
    assert bad.count() == 1


def test_orc_roundtrip_lossless(spark, tmp_path):
    from pennsieve_streaming_spark.sources.columnar import (
        read_orc_corpus,
        write_orc_corpus,
    )

    rows = [
        (1, 'line1\nline2', "en", "web", 11),
        (2, 'quote " comma , end', "de", "book", 19),
        (3, "unicode é中文 \U0001f600", "zh", "web", 10),
        (4, "", "en", "api", 0),
        (5, None, None, "x", 0),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    path = str(tmp_path / "orc_corpus")
    write_orc_corpus(docs, path, shards=2)
    back = read_orc_corpus(spark, path)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, rows))
