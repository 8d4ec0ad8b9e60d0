"""Property pins for corpus batch 8 (oracle differentials are covered
by tests/test_oracle.py)."""

from __future__ import annotations

from tests.conftest import SF_DIR


def test_dsir_separates_target_language(spark):
    """The importance weight must actually discriminate: the mean weight
    of English (target) docs exceeds the mean weight of every other
    language — otherwise the resampling step selects noise."""
    from stockmarketdata_dwb_etl_spark.queries.dataops8 import (
        q_dsir_importance,
    )

    out = q_dsir_importance(spark, SF_DIR).toPandas()
    assert len(out) > 0
    means = out.groupby("lang")["weight"].mean()
    for lang, mu in means.items():
        if lang != "en":
            assert means["en"] > mu, (lang, mu, means["en"])


def test_lang_id_confusion_reconciles(spark):
    """Cell counts sum to the corpus size; row shares sum to ~1 per true
    lang; predicted stays inside the heuristic's range."""
    from stockmarketdata_dwb_etl_spark.catalog import load_table
    from stockmarketdata_dwb_etl_spark.queries.dataops8 import (
        q_lang_id_confusion,
    )

    out = q_lang_id_confusion(spark, SF_DIR).toPandas()
    n_docs = load_table(spark, SF_DIR, "documents").count()
    assert out["n_docs"].sum() == n_docs
    assert set(out["predicted"]) <= {"en", "es", "de"}
    for _, g in out.groupby("lang"):
        assert abs(g["row_share"].sum() - 1.0) < 5e-4
