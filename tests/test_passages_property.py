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


# --- duplicate-substring spans vs a pure-Python reference ------------------

def _py_dup_spans(docs, L=5):
    """Reference: hash every L-gram (exact tuple, no hash collisions
    at test scale), keep first occurrence per gram by (doc, pos),
    merge the other occurrences' [pos, pos+L) intervals per doc."""
    occ = {}
    for doc_id, words in docs:
        for p in range(len(words) - L + 1):
            occ.setdefault(tuple(words[p : p + L]), []).append((doc_id, p))
    removals = {}
    for positions in occ.values():
        for doc_id, p in sorted(positions)[1:]:
            removals.setdefault(doc_id, []).append(p)
    spans = {}
    for doc_id, ps in removals.items():
        merged = []
        for p in sorted(ps):
            if merged and p <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], p + L)
            else:
                merged.append([p, p + L])
        spans[doc_id] = [(i, s, e - s) for i, (s, e) in enumerate(merged)]
    return {
        (d, i, s, n) for d, sp in spans.items() for (i, s, n) in sp
    }


_dup_corpus = st.lists(
    st.lists(
        st.sampled_from(["aa", "bb", "cc", "dd", "ee", "f1", "g2"]),
        min_size=0,
        max_size=40,
    ),
    min_size=1,
    max_size=8,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_dup_corpus)
def test_duplicate_substring_spans_match_reference(spark, word_lists):
    """For ANY corpus (tiny vocab -> dense collisions between and
    within docs), the Spark spans equal the keep-first/merge
    reference. The 7-word vocabulary maps to 7 distinct token codes;
    with <=300 grams per example the polynomial-hash collision
    probability is ~1e-5 per run, so hash identity and exact-tuple
    identity coincide in practice."""
    from gerrydb_etl_spark.operators.passages import duplicate_substring_spans

    docs = [(i, words) for i, words in enumerate(word_lists)]
    df = spark.createDataFrame(
        [(i, " ".join(w)) for i, w in docs], ["doc_id", "text"]
    )
    got = {
        (r.doc_id, r.span_idx, r.start_tok, r.n_toks)
        for r in duplicate_substring_spans(df, min_len=5).collect()
    }
    # the Spark tokenizer turns '' into [''] (one empty token); mirror
    ref_docs = [(i, w if w else [""]) for i, w in docs]
    assert got == _py_dup_spans(ref_docs, L=5)
