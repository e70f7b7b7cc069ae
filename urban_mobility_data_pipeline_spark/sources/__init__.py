from urban_mobility_data_pipeline_spark.sources.files import (  # noqa: F401
    empty_table,
    literal_rows,
    load_table,
    load_tables,
    table_exists,
    write_append_partitioned,
    write_overwrite,
)
