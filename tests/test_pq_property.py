"""Property test for the PQ literal-vs-join dispatch (SCALE_r15):
past PQ_LITERAL_CODE_CAP, encode_codes and adc_tables switch from
inlined per-codeword folds to a codebook-table broadcast join. The
fixed-corpus parity test (tests/test_pq.py) pins one input; this one
cross-checks the two paths — AND a plain numpy reference for the
encode argmin — on randomized vector sets, so a tie-break or
fold-order divergence between the paths cannot hide behind a
particular corpus geometry.

Style follows tests/test_scd2_property.py (function-scoped-fixture
health check suppressed; the session-scoped spark fixture is reused
across examples by design)."""

from __future__ import annotations

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from gerrydb_etl_spark.operators import pq as pq_mod
from gerrydb_etl_spark.operators.kmeans import quantize
from gerrydb_etl_spark.operators.pq import (
    adc_tables,
    encode_codes,
    train_codebooks,
)

DIM = 8  # 2 subspaces x 4 dims — small enough per example, even split

vector_sets = st.lists(
    st.lists(
        # quantize snaps to 1e-6 units; coarse values keep ties LIKELY
        # (several vectors equidistant to a codeword) so the
        # lower-code-id rule is actually exercised
        st.integers(-2, 2).map(lambda v: v / 2.0),
        min_size=DIM,
        max_size=DIM,
    ),
    min_size=4,
    max_size=12,
)


@given(vecs=vector_sets)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_dispatch_parity_and_numpy_argmin(spark, vecs, monkeypatch):
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    quant = quantize(df)
    books = train_codebooks(quant, DIM, m_subs=2, k=3, iters=2)
    queries = quant.filter(F.col("vec_id") < 2)

    # shipped cap is 0 (join path always); force the literal
    # reference spelling for the comparison arm
    monkeypatch.setattr(pq_mod, "PQ_LITERAL_CODE_CAP", 10**9)
    lit_codes = sorted(map(tuple, encode_codes(quant, books).collect()))
    lit_adc = sorted(map(tuple, adc_tables(queries, books).collect()))

    monkeypatch.setattr(pq_mod, "PQ_LITERAL_CODE_CAP", 1)
    join_codes = sorted(map(tuple, encode_codes(quant, books).collect()))
    join_adc = sorted(map(tuple, adc_tables(queries, books).collect()))
    monkeypatch.undo()

    assert join_codes == lit_codes
    assert join_adc == lit_adc

    # independent reference: numpy argmin with first-index (= lower
    # code id over the sorted id list) tie-breaking
    got = {(vid, m): c for vid, m, c in lit_codes}
    qvs = {r["vec_id"]: np.array(r["qv"], dtype=np.float64)
           for r in quant.collect()}
    sub_dim = DIM // 2
    for vid, qv in qvs.items():
        for m, book in enumerate(books):
            sub = qv[m * sub_dim : (m + 1) * sub_dim]
            cids = sorted(book)
            d = [((sub - np.array(book[c])) ** 2).sum() for c in cids]
            assert got[(vid, m)] == cids[int(np.argmin(d))], (vid, m)
