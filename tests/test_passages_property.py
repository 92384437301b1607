"""Property tests for operators/passages.py against plain-Python
reference implementations on randomized corpora (style:
tests/test_docprep_property.py — session-scoped spark fixture, so
the function-scoped health check is suppressed intentionally)."""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from gerrydb_etl_spark.functions.text import FP_BASE, FP_MOD
from gerrydb_etl_spark.operators.passages import passage_dedup, winnow_fingerprints

# token streams over a tiny vocabulary so cross-doc repeats happen
token_docs = st.lists(
    st.lists(st.sampled_from(["aa", "bb", "c", "ddd"]), min_size=1, max_size=30),
    min_size=1,
    max_size=8,
)


def _ref_passage_dedup(token_lists, block, min_docs):
    blocks = {}  # doc -> [(idx, text)]
    owners = Counter()
    for d, toks in enumerate(token_lists):
        bs = [
            " ".join(toks[i : i + block])
            for i in range(0, len(toks), block)
        ]
        blocks[d] = list(enumerate(bs))
        for t in set(bs):
            owners[t] += 1
    bad = {t for t, n in owners.items() if n >= min_docs}
    out = {}
    for d, bs in blocks.items():
        kept = [t for _, t in bs if t not in bad]
        out[d] = (" ".join(kept), len(bs), len(bs) - len(kept))
    return out


@given(docs=token_docs, block=st.integers(2, 5))
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_passage_dedup_matches_reference(spark, docs, block):
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["clean_text"], r["n_blocks"], r["blocks_removed"])
        for r in passage_dedup(df, block_tokens=block, min_docs=2).collect()
    }
    assert got == _ref_passage_dedup(docs, block, 2)


def _ref_winnow(toks, k, w):
    if len(toks) < k + w - 1:
        return set()
    kh = []
    for i in range(len(toks) - k + 1):
        acc = 0
        for t in toks[i : i + k]:
            acc = (acc * FP_BASE + (len(t) * 256 + ord(t[0]))) % FP_MOD
        kh.append(acc)
    sel = set()
    for j in range(len(kh) - w + 1):
        win = kh[j : j + w]
        m = min(win)
        sel.add(j + (w - 1) - win[::-1].index(m))
    return {(p, kh[p]) for p in sel}


@given(docs=token_docs)
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_winnow_matches_reference_on_random_corpora(spark, docs):
    k, w = 3, 4
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id long, text string",
    )
    got: dict[int, set] = {}
    for r in winnow_fingerprints(df, k=k, w=w).collect():
        got.setdefault(r["doc_id"], set()).add((r["pos"], r["fingerprint"]))
    expect = {
        i: _ref_winnow(toks, k, w)
        for i, toks in enumerate(docs)
        if _ref_winnow(toks, k, w)
    }
    assert got == expect


@given(docs=token_docs)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_winnow_every_window_covered(spark, docs):
    """Winnowing guarantee: each w-window of k-gram positions
    contains at least one selected fingerprint position."""
    k, w = 3, 4
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id long, text string",
    )
    sel: dict[int, set] = {}
    for r in winnow_fingerprints(df, k=k, w=w).collect():
        sel.setdefault(r["doc_id"], set()).add(r["pos"])
    for i, toks in enumerate(docs):
        p = len(toks) - k + 1
        if p < w:
            continue
        for j in range(p - w + 1):
            assert sel[i] & set(range(j, j + w)), (i, j)
