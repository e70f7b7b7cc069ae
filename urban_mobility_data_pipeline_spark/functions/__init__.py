from urban_mobility_data_pipeline_spark.functions.hashing import (  # noqa: F401
    md5_int_key,
    scd_hash,
    surrogate_int_key,
)
