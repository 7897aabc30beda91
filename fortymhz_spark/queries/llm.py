"""LLM-data-pipeline queries (placeholder — filled in next)."""
from fortymhz_spark.queries.registry import Registry
reg = Registry()
QUERIES = reg.queries
ORACLE = reg.oracle
