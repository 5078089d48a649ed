from planning_center_data_pipeline_spark.functions.derive import (
    calc_age,
    null_to_empty,
    parse_iso_date,
    stringify_grade,
)
from planning_center_data_pipeline_spark.functions.exact import (
    cents,
    money_avg,
    money_sum,
)

__all__ = [
    "calc_age",
    "stringify_grade",
    "null_to_empty",
    "parse_iso_date",
    "cents",
    "money_sum",
    "money_avg",
]
