"""Example Airflow DAG: daily stock ETL via spark-submit (ref O1).

The reference orchestrates its scraper+load as a single daily
PythonOperator (/root/reference/stock_data_scraper/dags/stock_scraper_dag.py:10-42:
``@daily`` schedule, one ``run_complete_pipeline`` task, retries=1). This
engine maps that to the standard Spark deployment shape — the scheduler
stays OUTSIDE the engine and each run is one ``spark-submit`` of the
bronze→silver→gold pipeline (pipelines/stock_ingest.run_pipeline), so the
same DAG drives local[NN] or a 1000-executor cluster unchanged.

The DAG file itself imports nothing from Spark (Airflow DAG-parse best
practice: the scheduler re-parses this file constantly; heavyweight
imports happen inside the task at execute time, and spark-submit isolates
them in a separate process anyway). Copy into your Airflow dags/ folder
and set the three environment knobs.
"""

from __future__ import annotations

import os
from datetime import datetime, timedelta

try:  # Airflow is an orchestration-side dependency, not an engine one
    from airflow import DAG
    from airflow.operators.bash import BashOperator
except ImportError:  # pragma: no cover - parsed without Airflow installed
    DAG = None
    BashOperator = None

SF_DIR = os.environ.get("STOCK_ETL_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.environ.get("STOCK_ETL_OUT_DIR", "/tmp/stock_etl/warehouse")
SPARK_MASTER = os.environ.get("STOCK_ETL_SPARK_MASTER", "local[*]")

#: one task, like the reference's single PythonOperator — the pipeline is
#: one Spark application (bronze→silver→gold stages share a session and a
#: plan; splitting them into Airflow tasks would force a cold session and
#: a re-read per stage)
SUBMIT_CMD = (
    "spark-submit --master '" + SPARK_MASTER + "' "
    "-c spark.sql.adaptive.enabled=true "
    "{{ var.value.get('stock_etl_repo', '" + os.path.dirname(os.path.dirname(os.path.abspath(__file__))) + "') }}"
    "/examples/run_stock_pipeline.py "
    + SF_DIR + " " + OUT_DIR
)

default_args = {
    "owner": "data-eng",
    "depends_on_past": False,  # each day truncate-loads; no backfill chain
    "retries": 1,  # ref default_args: retries=1
    "retry_delay": timedelta(minutes=5),
}

if DAG is not None:
    with DAG(
        dag_id="stock_market_etl",
        description="Scrape stock history and load bronze/silver/gold",
        schedule="@daily",  # ref schedule_interval='@daily'
        start_date=datetime(2024, 3, 25),  # ref start_date
        catchup=False,
        default_args=default_args,
    ) as dag:
        run_complete_pipeline = BashOperator(
            task_id="run_complete_pipeline",
            bash_command=SUBMIT_CMD,
        )
