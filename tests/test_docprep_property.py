"""Property tests cross-checking the document-prep and dense-ID
operators against plain-Python reference implementations on
randomized inputs (style: tests/test_property_operators.py — the
spark fixture is session-scoped, so the function-scoped health
check is suppressed intentionally)."""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from gerrydb_etl_spark.operators.docprep import chunk_documents, repetition_stats
from gerrydb_etl_spark.operators.ids import assign_dense_ids

texts = st.lists(
    st.text(
        alphabet=st.sampled_from("ab xyz"),  # spaces make real tokens
        min_size=1,
        max_size=60,
    ),
    min_size=1,
    max_size=12,
)


def _ref_chunks(text: str, size: int, stride: int) -> list[str]:
    n = len(text)
    extra = max(n - size, 0)
    n_starts = 1 + -(-extra // stride)  # ceil
    return [text[i * stride : i * stride + size] for i in range(n_starts)]


@given(docs=texts, size=st.integers(2, 12), stride_off=st.integers(0, 10))
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_chunking_matches_python_reference(spark, docs, size, stride_off):
    stride = max(1, size - stride_off)
    df = spark.createDataFrame(list(enumerate(docs)), ["doc_id", "text"])
    got = {
        (r["doc_id"], r["chunk_id"]): r["chunk_text"]
        for r in chunk_documents(
            df, chunk_size=size, stride=stride
        ).collect()
    }
    want = {
        (i, j): c
        for i, t in enumerate(docs)
        for j, c in enumerate(_ref_chunks(t, size, stride))
    }
    assert got == want


@given(docs=texts)
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_repetition_matches_python_reference(spark, docs):
    df = spark.createDataFrame(list(enumerate(docs)), ["doc_id", "text"])
    rows = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    for i, t in enumerate(docs):
        words = t.split(" ")
        wc = Counter(words)
        bigrams = Counter(
            f"{words[j]} {words[j+1]}" for j in range(len(words) - 1)
        )
        r = rows[i]
        assert r["n_words"] == len(words)
        assert r["dup_word_frac"] == (len(words) - len(wc)) / len(words)
        if bigrams:
            assert r["top_bigram_frac"] == max(bigrams.values()) / sum(
                bigrams.values()
            )
        else:
            assert r["top_bigram_frac"] == 0.0


@given(
    keys=st.lists(st.integers(-1000, 1000), min_size=1, max_size=60, unique=True),
    parts=st.integers(1, 9),
)
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_dense_ids_match_sorted_enumerate(spark, keys, parts):
    df = spark.createDataFrame([(k,) for k in keys], ["k"])
    got = {
        r["k"]: r["row_id"]
        for r in assign_dense_ids(df, ["k"], num_partitions=parts).collect()
    }
    want = {k: i for i, k in enumerate(sorted(keys))}
    assert got == want


# --- content-defined chunking properties -----------------------------------

_words = st.lists(
    st.text(alphabet="abcdefgh123", min_size=1, max_size=6),
    min_size=1,
    max_size=60,
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_words)
def test_cdc_chunks_partition_the_token_stream(spark, words):
    """For ANY document, CDC chunks are a partition of the token
    array: contiguous, non-overlapping, covering [0, n)."""
    from gerrydb_etl_spark.operators.docprep import cdc_chunks

    df = spark.createDataFrame([(1, " ".join(words))], ["doc_id", "text"])
    rows = sorted(cdc_chunks(df).collect(), key=lambda r: r.chunk_idx)
    assert rows, "every non-empty doc yields at least one chunk"
    assert rows[0].start_tok == 0
    for a, b in zip(rows, rows[1:]):
        assert b.start_tok == a.start_tok + a.n_toks
    assert rows[-1].start_tok + rows[-1].n_toks == len(words)
    assert all(r.n_toks >= 1 for r in rows)
