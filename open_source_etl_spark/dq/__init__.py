"""Data-quality layer: declarative expectations over DataFrames."""

from .expectations import (
    Expectation,
    expect_column_values_to_be_in_set,
    expect_column_values_to_not_be_null,
    expect_table_columns_to_match_ordered_list,
)
from .observe import (
    null_count,
    observed,
    out_of_range_count,
    out_of_set_count,
    row_count,
    validate_while_writing,
)
from .profile import profile_table
from .runner import ValidationResult, validate

__all__ = [
    "Expectation",
    "expect_column_values_to_be_in_set",
    "expect_column_values_to_not_be_null",
    "expect_table_columns_to_match_ordered_list",
    "null_count",
    "observed",
    "out_of_range_count",
    "out_of_set_count",
    "row_count",
    "validate_while_writing",
    "profile_table",
    "ValidationResult",
    "validate",
]
