from planning_center_data_pipeline_spark.functions.derive import (
    calc_age,
    null_to_empty,
    parse_iso_date,
    stringify_grade,
)
from planning_center_data_pipeline_spark.functions.exact import (
    avg_money,
    dec,
    sum_money,
)

__all__ = [
    "calc_age",
    "stringify_grade",
    "null_to_empty",
    "parse_iso_date",
    "dec",
    "sum_money",
    "avg_money",
]
