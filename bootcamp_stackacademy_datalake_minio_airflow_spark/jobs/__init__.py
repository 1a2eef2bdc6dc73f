"""End-to-end lake jobs (the reference's DAG payloads, Spark-first).

One parameterized bronze->silver job replaces the reference's 8
near-identical ingestion scripts; the vendas gold job fuses the
reference's staged extract/transform/load tasks into single lazy
plans (SURVEY §3).
"""

from .bronze_to_silver import bronze_to_silver
from .silver_to_gold_vendas import publish_vendas_jdbc, vendas_gold

__all__ = ["bronze_to_silver", "vendas_gold", "publish_vendas_jdbc"]
