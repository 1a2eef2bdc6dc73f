"""End-to-end jobs (the reference's DAG bodies, re-expressed as lazy
Spark plans): config-driven bronze->silver ingestion and the vendas
silver->gold star denormalization."""
