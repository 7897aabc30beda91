from fortymhz_spark.sources.batch import (
    load_table,
    load_tables,
    read_hits_csv,
    register_views,
)

__all__ = ["load_table", "load_tables", "read_hits_csv", "register_views"]
