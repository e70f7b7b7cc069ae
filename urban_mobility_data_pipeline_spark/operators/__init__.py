from urban_mobility_data_pipeline_spark.operators.cleaning import (  # noqa: F401
    clamp_domain,
    normalize_strings,
    null_out_when,
    scrub_null_likes,
)
from urban_mobility_data_pipeline_spark.operators.dedup import (  # noqa: F401
    current_and_previous,
    latest_per_key,
)
from urban_mobility_data_pipeline_spark.operators.star import (  # noqa: F401
    calendar_attributes,
    validate_fk,
    with_unknown_row,
)
