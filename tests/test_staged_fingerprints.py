"""R18 staged fingerprint indexes: the staged SimHash / winnowing
fingerprint tables must hold EXACTLY the rows the inline operators
compute (the staging writer IS the operator, but these tests pin the
contract against refactors), and the consumers' pair sets must be
unchanged by the staged read."""

from __future__ import annotations

import re

from gerrydb_etl_spark.store import staging

SF = "/root/testdata/sf0.001"


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_staged_simhash_fps_equal_inline(spark):
    from gerrydb_etl_spark.operators.dedup import simhash
    from gerrydb_etl_spark.sources.registry import load_table

    staged = staging.staged_simhash_fps(spark, SF)
    inline = simhash(load_table(spark, SF, "documents"), "doc_id", "text")
    assert _rows(staged, ["doc", "fingerprint"]) == _rows(
        inline, ["doc", "fingerprint"]
    )


def test_staged_winnow_equal_inline(spark):
    from gerrydb_etl_spark.operators.passages import winnow_fingerprints
    from gerrydb_etl_spark.queries.passages import (
        WINNOW_K,
        WINNOW_ND_K,
        WINNOW_W,
    )
    from gerrydb_etl_spark.sources.registry import load_table

    docs = load_table(spark, SF, "documents")
    for k in (WINNOW_K, WINNOW_ND_K):
        staged = staging.staged_winnow(spark, SF, k=k, w=WINNOW_W)
        inline = winnow_fingerprints(docs, k=k, w=WINNOW_W)
        assert _rows(staged, ["doc_id", "pos", "fingerprint"]) == _rows(
            inline, ["doc_id", "pos", "fingerprint"]
        ), f"k={k}"


def test_simhash_pairs_staged_fingerprints_identical(spark):
    """simhash_pairs(fingerprints=staged) emits exactly the pair set
    of the inline spelling."""
    from gerrydb_etl_spark.operators.dedup import simhash_pairs
    from gerrydb_etl_spark.sources.registry import load_table

    docs = load_table(spark, SF, "documents")
    via_staged = simhash_pairs(
        docs, "doc_id", "text", max_hamming=3, max_bucket_size=1000,
        fingerprints=staging.staged_simhash_fps(spark, SF),
    )
    inline = simhash_pairs(
        docs, "doc_id", "text", max_hamming=3, max_bucket_size=1000
    )
    cols = ["d1", "d2", "hamming"]
    assert _rows(via_staged, cols) == _rows(inline, cols)


def test_fingerprint_staged_names_track_builder_source(monkeypatch):
    """The new fixtures carry the same staleness contract as every
    staged table: derivation-tag + source fingerprint in the name."""
    names_before = [
        staging.staged_simhash_fps_name(SF),
        staging.staged_winnow_name(SF, 3, 4),
        staging.staged_winnow_name(SF, 5, 4),
    ]
    for n in names_before:
        assert re.search(r"_[0-9a-f]{8}_", n), n
    real_getsource = staging.inspect.getsource
    monkeypatch.setattr(
        staging.inspect,
        "getsource",
        lambda obj: real_getsource(obj) + "\n# edited",
    )
    names_after = [
        staging.staged_simhash_fps_name(SF),
        staging.staged_winnow_name(SF, 3, 4),
        staging.staged_winnow_name(SF, 5, 4),
    ]
    for before, after in zip(names_before, names_after):
        assert before != after, before


def test_staged_minhash_bands_equal_inline(spark):
    """The staged banded MinHash index holds exactly the rows of the
    inline banding, and a doc-filter of the staged table equals the
    banding of the same-filtered shingle rows (the commutation the
    incremental probe head relies on)."""
    from pyspark.sql import functions as F

    from gerrydb_etl_spark.operators.dedup import (
        MINHASH_BANDS,
        MINHASH_HASHES,
        MINHASH_N,
        banded_signatures,
    )

    sh = staging.staged_shingles(spark, SF, MINHASH_N)
    staged = staging.staged_minhash_bands(
        spark, SF, MINHASH_N, MINHASH_HASHES, MINHASH_BANDS
    )
    inline = banded_signatures(sh, MINHASH_HASHES, MINHASH_BANDS)
    cols = ["doc", "sig", "band", "key"]

    def rows(df):
        return sorted(
            (r["doc"], tuple(r["sig"]), r["band"], r["key"])
            for r in df.select(cols).collect()
        )

    assert rows(staged) == rows(inline)
    assert rows(staged.where(F.col("doc") % 2 == 0)) == rows(
        banded_signatures(
            sh.where(F.col("doc") % 2 == 0), MINHASH_HASHES, MINHASH_BANDS
        )
    )


def test_minhash_pairs_staged_bands_identical(spark):
    """minhash_lsh_pairs(banded=staged) and the probe head's staged
    sides emit exactly the pair sets of the inline spellings."""
    from pyspark.sql import functions as F

    from gerrydb_etl_spark.operators.dedup import (
        MINHASH_BANDS,
        MINHASH_HASHES,
        MINHASH_N,
        minhash_lsh_pairs,
        minhash_probe_pairs,
    )
    from gerrydb_etl_spark.sources.registry import load_table

    docs = load_table(spark, SF, "documents")
    sh = staging.staged_shingles(spark, SF, MINHASH_N)
    banded = staging.staged_minhash_bands(
        spark, SF, MINHASH_N, MINHASH_HASHES, MINHASH_BANDS
    )

    via_staged = minhash_lsh_pairs(
        docs, "doc_id", "text", n=MINHASH_N, num_hashes=MINHASH_HASHES,
        bands=MINHASH_BANDS, threshold=0.7, max_bucket_size=1000,
        banded=banded,
    )
    inline = minhash_lsh_pairs(
        docs, "doc_id", "text", n=MINHASH_N, num_hashes=MINHASH_HASHES,
        bands=MINHASH_BANDS, threshold=0.7, max_bucket_size=1000,
        shingles=sh,
    )
    cols = ["d1", "d2", "est_jaccard"]
    assert _rows(via_staged, cols) == _rows(inline, cols)

    ex_pred = F.col("doc") % 2 == 0
    inc_pred = (F.col("doc") % 2 == 1) | (F.col("doc") % 10 == 0)
    probe_staged = minhash_probe_pairs(
        None, None, num_hashes=MINHASH_HASHES, bands=MINHASH_BANDS,
        threshold=0.7, max_bucket_size=1000,
        existing_banded=banded.where(ex_pred),
        incoming_banded=banded.where(inc_pred),
    )
    probe_inline = minhash_probe_pairs(
        sh.where(ex_pred), sh.where(inc_pred),
        num_hashes=MINHASH_HASHES, bands=MINHASH_BANDS,
        threshold=0.7, max_bucket_size=1000,
    )
    cols = ["batch_doc", "corpus_doc", "est_jaccard"]
    assert _rows(probe_staged, cols) == _rows(probe_inline, cols)


def test_minhash_bands_staged_name_tracks_builder_source(monkeypatch):
    name_before = staging.staged_minhash_bands_name(SF, 3, 32, 8)
    assert re.search(r"_[0-9a-f]{8}_", name_before)
    real_getsource = staging.inspect.getsource
    monkeypatch.setattr(
        staging.inspect,
        "getsource",
        lambda obj: real_getsource(obj) + "\n# edited",
    )
    assert staging.staged_minhash_bands_name(SF, 3, 32, 8) != name_before
