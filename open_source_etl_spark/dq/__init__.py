"""Data-quality layer: declarative expectations over DataFrames."""

from .expectations import (
    Expectation,
    expect_column_values_to_be_in_set,
    expect_column_values_to_not_be_null,
    expect_table_columns_to_match_ordered_list,
)
from .profile import profile_table
from .runner import ValidationResult, validate

__all__ = [
    "Expectation",
    "expect_column_values_to_be_in_set",
    "expect_column_values_to_not_be_null",
    "expect_table_columns_to_match_ordered_list",
    "profile_table",
    "ValidationResult",
    "validate",
]
