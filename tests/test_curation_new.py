"""Pins for the r08 curation operators: corpus line dedup (C4/CCNet)
and DSIR importance weights."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from traceframe_spark.operators.sampling import dsir_importance
from traceframe_spark.operators.text import dedup_lines, reassemble_lines


def _lines(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, line_no long, line string")


BOILER = "accept all cookies to continue"


@pytest.fixture(scope="module")
def corpus(spark):
    # three docs sharing a boilerplate line; doc 1 carries it twice
    return _lines(
        spark,
        [
            (1, 0, BOILER),
            (1, 1, "alpha beta gamma"),
            (1, 2, BOILER),
            (2, 0, BOILER),
            (2, 1, "delta epsilon"),
            (3, 0, "zeta eta theta"),
            (3, 1, "Accept ALL cookies to continue  "),  # normalizes into BOILER
        ],
    )


def test_dedup_lines_keeps_first_occurrence_only(spark, corpus):
    kept = dedup_lines(corpus).collect()
    keys = {(r.doc_id, r.line_no) for r in kept}
    # the boilerplate survives ONLY at (1, 0); (1,2), (2,0), (3,1) die
    assert (1, 0) in keys
    assert not {(1, 2), (2, 0), (3, 1)} & keys
    # unique lines all survive and are non-canonical
    by_key = {(r.doc_id, r.line_no): r for r in kept}
    assert by_key[(1, 1)].n_occurrences == 1 and not by_key[(1, 1)].is_canonical
    assert by_key[(1, 0)].n_occurrences == 4 and by_key[(1, 0)].is_canonical


def test_dedup_lines_min_occurrences_threshold(spark, corpus):
    # threshold above the boilerplate's count keeps everything
    kept = dedup_lines(corpus, min_occurrences=5)
    assert kept.count() == corpus.count()
    with pytest.raises(ValueError):
        dedup_lines(corpus, min_occurrences=1)


def test_dedup_lines_scope_isolates_sources(spark):
    rows = [
        (1, 0, BOILER, "srcA"),
        (2, 0, BOILER, "srcA"),
        (3, 0, BOILER, "srcB"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, line_no long, line string, source string"
    )
    kept = dedup_lines(df, scope_col="source").collect()
    # srcB's single copy is below min_occurrences inside its own scope
    assert {(r.doc_id, r.line_no) for r in kept} == {(1, 0), (3, 0)}


def test_dedup_lines_doc_vanishes_when_all_lines_repeated(spark):
    df = _lines(spark, [(1, 0, BOILER), (2, 0, BOILER)])
    docs = reassemble_lines(dedup_lines(df))
    rows = docs.collect()
    # doc 2's only line is a non-canonical duplicate: the doc is dropped
    # (C4 semantics — a boilerplate-only page contributes nothing)
    assert [(r.doc_id, r.text, r.n_lines) for r in rows] == [(1, BOILER, 1)]


def test_reassemble_restores_line_order(spark):
    df = _lines(spark, [(7, 2, "c"), (7, 0, "a"), (7, 1, "b")])
    out = reassemble_lines(dedup_lines(df, min_occurrences=2)).collect()
    assert out[0].text == "a\nb\nc" and out[0].n_lines == 3


def test_dsir_targets_score_above_raw(spark):
    # targets share a vocabulary; raw noise docs use a disjoint one
    tgt = [(i, "clean prose about science and method", "en") for i in range(10)]
    raw = [(100 + i, "zz qq xx yy ww vv uu tt", "xx") for i in range(10)]
    df = spark.createDataFrame(tgt + raw, "doc_id long, text string, lang string")
    w = dsir_importance(df, is_target=F.col("lang") == "en", buckets=512)
    rows = {r.doc_id: r for r in w.collect()}
    assert len(rows) == 20
    t_mean = sum(rows[i].logweight for i in range(10)) / 10
    r_mean = sum(rows[100 + i].logweight for i in range(10)) / 10
    assert t_mean > r_mean
    # 6 tokens -> 6 unigrams + 5 bigrams... here 6 words: check gram count
    assert rows[0].n_grams == 2 * 6 - 1
    assert rows[100].n_grams == 2 * 8 - 1


def test_dsir_empty_doc_has_no_grams(spark):
    df = spark.createDataFrame(
        [(1, "some words here", True), (2, "", False), (3, "   ", False)],
        "doc_id long, text string, tgt boolean",
    )
    w = dsir_importance(df, is_target=F.col("tgt"), buckets=64)
    assert {r.doc_id for r in w.collect()} == {1}
