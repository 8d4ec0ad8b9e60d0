"""DAG-integrity-style checks for the example orchestration artifacts
(ref O1: stock_scraper_dag.py's @daily single-task pipeline)."""

from __future__ import annotations

import importlib.util
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(path: str, name: str):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_dag_file_parses_without_airflow():
    """The DAG file must import cleanly on a machine with no Airflow (the
    engine repo's CI) — the airflow import is guarded; the submit command
    is still constructed so its shape is testable."""
    mod = _load(os.path.join(REPO, "examples", "airflow_stock_dag.py"),
                "airflow_stock_dag")
    assert "spark-submit" in mod.SUBMIT_CMD
    assert "run_stock_pipeline.py" in mod.SUBMIT_CMD
    assert mod.default_args["retries"] == 1  # ref default_args retries=1


def test_submit_entry_runs_pipeline(spark, tmp_path):
    """The spark-submit entry's pipeline call end-to-end at sf0.001:
    bronze/silver/gold land and the post-load verification sees rows."""
    from pipelines.stock_ingest import run_pipeline

    from tests.conftest import SF_DIR

    counts = run_pipeline(spark, SF_DIR, str(tmp_path / "wh"))
    assert counts["gold"] > 0
    assert counts["bronze"] >= counts["silver"] > 0


def test_submit_entry_main_exit_codes(tmp_path, monkeypatch):
    """main() returns 0 on success (gold non-empty) — run through the
    real argv path."""
    mod_path = os.path.join(REPO, "examples", "run_stock_pipeline.py")
    from tests.conftest import SF_DIR

    monkeypatch.setattr(
        sys, "argv", [mod_path, SF_DIR, str(tmp_path / "wh2")]
    )
    mod = _load(mod_path, "run_stock_pipeline")
    assert mod.main() == 0


def test_corpus_submit_entry_main_exit_codes(tmp_path, monkeypatch):
    """The corpus-curation spark-submit entry runs end-to-end at sf0.001
    (silver/deduped/gold land; exit 0 on non-empty gold) — the corpus
    twin of the stock entry, same orchestrator contract."""
    mod_path = os.path.join(REPO, "examples", "run_corpus_pipeline.py")
    from tests.conftest import SF_DIR

    monkeypatch.setattr(
        sys, "argv", [mod_path, SF_DIR, str(tmp_path / "cwh")]
    )
    mod = _load(mod_path, "run_corpus_pipeline")
    assert mod.main() == 0
    assert os.path.exists(str(tmp_path / "cwh" / "gold.parquet"))
