"""Unit + plan-shape tests for operators/passages.py (C4 passage
dedup and robust winnowing). The oracle-differential gate runs
automatically via test_queries_oracle.py; these tests pin semantics
on hand-built corpora and the zero-shuffle winnowing plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from gerrydb_etl_spark.functions.text import FP_BASE, FP_MOD
from gerrydb_etl_spark.operators.passages import (
    kgram_hashes,
    passage_dedup,
    winnow_fingerprints,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_passage_dedup_removes_shared_block_only(spark):
    # Two docs share one exact 3-token block; each also has a unique
    # block. Only the shared block disappears; order is preserved.
    rows = [
        (1, "a b c x y z"),
        (2, "a b c p q r"),
        (3, "m n o"),
    ]
    out = {
        r["doc_id"]: r
        for r in passage_dedup(
            _docs(spark, rows), block_tokens=3, min_docs=2
        ).collect()
    }
    assert out[1]["clean_text"] == "x y z"
    assert out[1]["blocks_removed"] == 1 and out[1]["n_blocks"] == 2
    assert out[2]["clean_text"] == "p q r"
    assert out[3]["clean_text"] == "m n o" and out[3]["blocks_removed"] == 0


def test_passage_dedup_fully_boilerplate_doc_survives_empty(spark):
    rows = [(1, "a b c"), (2, "a b c")]
    out = passage_dedup(_docs(spark, rows), block_tokens=3, min_docs=2).collect()
    assert {r["clean_text"] for r in out} == {""}
    assert all(r["blocks_removed"] == 1 for r in out)


def test_passage_dedup_ragged_tail_block(spark):
    # 5 tokens with block=3 -> blocks "a b c" and "d e" (truncated).
    rows = [(1, "a b c d e")]
    row = passage_dedup(_docs(spark, rows), block_tokens=3, min_docs=2).first()
    assert row["n_blocks"] == 2 and row["clean_text"] == "a b c d e"


def _py_code(tok: str) -> int:
    return len(tok) * 256 + ord(tok[0])


def _py_kgram(tokens, k):
    out = []
    for i in range(len(tokens) - k + 1):
        acc = 0
        for t in tokens[i : i + k]:
            acc = (acc * FP_BASE + _py_code(t)) % FP_MOD
        out.append(acc)
    return out


def test_kgram_hashes_match_reference_fold(spark):
    from gerrydb_etl_spark.operators.passages import _token_codes

    text = "the quick brown fox jumps over"
    df = (
        _docs(spark, [(1, text)])
        .select(_token_codes(F.split("text", " ")).alias("codes"))
        .select(kgram_hashes(F.col("codes"), 3).alias("kh"))
    )
    assert df.first()["kh"] == _py_kgram(text.split(" "), 3)


def _py_winnow(kh, w):
    sel = []
    for j in range(len(kh) - w + 1):
        window = kh[j : j + w]
        m = min(window)
        # rightmost occurrence of the minimum
        pos = j + (w - 1) - window[::-1].index(m)
        sel.append(pos)
    return sorted(set(sel))


def test_winnow_matches_reference_implementation(spark):
    text = "a bb c dd e ff g hh i jj k ll m"
    toks = text.split(" ")
    k, w = 3, 4
    kh = _py_kgram(toks, k)
    expect = {(p, kh[p]) for p in _py_winnow(kh, w)}
    got = {
        (r["pos"], r["fingerprint"])
        for r in winnow_fingerprints(_docs(spark, [(1, text)]), k=k, w=w).collect()
    }
    assert got == expect


def test_winnow_guarantee_shared_fingerprint_for_long_match(spark):
    # Winnowing guarantee: any shared substring of >= w + k - 1
    # tokens yields at least one shared fingerprint.
    shared = "p q r s t u v w"  # 8 tokens >= 4 + 3 - 1
    rows = [(1, "a b " + shared + " y z"), (2, "m n o " + shared)]
    df = winnow_fingerprints(_docs(spark, rows), k=3, w=4)
    fps = df.groupBy("fingerprint").agg(F.countDistinct("doc_id").alias("n"))
    assert fps.where("n = 2").count() >= 1


def test_winnow_short_docs_dropped(spark):
    rows = [(1, "a b c d e"), (2, "a b c d e f")]  # k+w-1 = 6
    df = winnow_fingerprints(_docs(spark, rows), k=3, w=4)
    assert {r["doc_id"] for r in df.collect()} == {2}


def test_helpers_guard_short_inputs(spark):
    """kgram_hashes / winnow_select enforce the n < k / n < w guard
    internally (Spark's sequence(0, n-k) counts DOWN for n < k and
    would hash garbage from negative slice indices): short inputs
    yield empty arrays even when the caller forgets to pre-filter."""
    from gerrydb_etl_spark.operators.passages import (
        _token_codes,
        winnow_select,
    )

    df = (
        _docs(spark, [(1, "a b"), (2, ""), (3, "a b c d")])
        .select("doc_id", _token_codes(F.split("text", " ")).alias("codes"))
        .select("doc_id", kgram_hashes(F.col("codes"), 3).alias("kh"))
        .select("doc_id", "kh", winnow_select(F.col("kh"), 4).alias("sel"))
        .orderBy("doc_id")
    )
    rows = df.collect()
    assert rows[0]["kh"] == [] and rows[0]["sel"] == []  # 2 toks < k
    assert rows[1]["kh"] == [] and rows[1]["sel"] == []
    # 4 tokens -> 2 k-gram hashes, still < w=4 -> selection empty
    assert len(rows[2]["kh"]) == 2 and rows[2]["sel"] == []


def test_winnow_plan_has_no_exchange(spark):
    from gerrydb_etl_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    df = REGISTRY["winnow_fingerprints"].spark(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_containment_asymmetric_subset_found(spark):
    # doc 2 is a strict prefix-subset of doc 1: containment(2 in 1)
    # = 1.0 while Jaccard is well below a 0.9 bar.
    from gerrydb_etl_spark.operators.dedup import containment_pairs

    long = "a b c d e f g h i j k l m n o p"
    short = "a b c d e f g"
    df = _docs(spark, [(1, long), (2, short)])
    out = containment_pairs(df, "doc_id", "text", n=3, threshold=0.9).collect()
    assert {(r["contained_doc"], r["container_doc"]) for r in out} == {(2, 1)}
    assert all(r["containment"] == 1.0 for r in out)


def test_containment_emits_both_orientations_for_twins(spark):
    from gerrydb_etl_spark.operators.dedup import containment_pairs

    text = "a b c d e f g"
    df = _docs(spark, [(1, text), (2, text)])
    out = containment_pairs(df, "doc_id", "text", n=3, threshold=0.9).collect()
    assert {(r["contained_doc"], r["container_doc"]) for r in out} == {
        (1, 2),
        (2, 1),
    }
