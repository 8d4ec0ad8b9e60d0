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


def test_mips_augmented_cosine_preserves_ip_order(spark):
    """The demonstration the query exists for: cos_aug is a positive
    monotone map of ip, so walking the frame in ip order it must never
    increase (ties allowed — the 6dp presentation round can collapse
    distinct ips to one cos_aug, so an exact tie-broken resort is NOT
    required to agree); every augmented-dim value must be real
    (M² >= |x|²)."""
    from stockmarketdata_dwb_etl_spark.queries.dataops8 import (
        q_mips_norm_augment,
    )

    out = q_mips_norm_augment(spark, SF_DIR).toPandas()
    assert len(out) == 10
    assert (out["aug_dim"] >= 0.0).all()
    cos_aug = out["cos_aug"].tolist()  # frame is already in ip order
    assert all(a >= b for a, b in zip(cos_aug, cos_aug[1:]))


def test_anderson_darling_detects_uniform_tails(spark):
    """events.value is bounded (uniform-ish) — nothing like a normal's
    tails — so A² must reject normality decisively (A*² far above the
    1% critical value 1.092) for every type, and std/mean must be
    positive."""
    from stockmarketdata_dwb_etl_spark.queries.stats_q2 import (
        q_anderson_darling,
    )

    out = q_anderson_darling(spark, SF_DIR).toPandas()
    assert len(out) == 5
    assert (out["std"] > 0).all() and (out["mean"] > 0).all()
    assert (out["a2_star"] > 1.092).all()
