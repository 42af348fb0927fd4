

def test_quantized_impacts_rank_and_bounds(spark):
    """Impacts are in [0, 2^bits), the max-score posting hits the top
    bin, and the integer-sum top-k ranks single-term queries exactly as
    the underlying (non-negative-idf) scores do."""
    from information_retrieval_system_spark.config import EngineConfig
    from information_retrieval_system_spark.index.builder import build_index
    from information_retrieval_system_spark.index.impacts import (
        impact_topk, quantized_impacts)

    rows = [(1, "apple apple apple banana"),
            (2, "apple banana banana cherry"),
            (3, "cherry cherry cherry cherry"),
            (4, "apple date date date")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    cfg = EngineConfig(use_stemmer=False, use_stopwords=False)
    ix = build_index(docs, cfg, doc_col="doc_id", text_col="text",
                     with_positions=False)
    impacts, max_s = quantized_impacts(ix, cfg, bits=8)
    rows_i = impacts.collect()
    assert max_s > 0
    assert all(0 <= r.impact <= 255 for r in rows_i)
    assert max(r.impact for r in rows_i) == 255  # top bin occupied

    q = spark.createDataFrame([("date",)], "term string")
    got = [r.doc_id for r in impact_topk(impacts, q, k=4).collect()]
    assert got[0] == 4  # only doc containing 'date'

    import pytest as _pytest
    with _pytest.raises(ValueError, match="bits"):
        quantized_impacts(ix, cfg, bits=0)
