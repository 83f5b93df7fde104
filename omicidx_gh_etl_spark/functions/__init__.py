from .compat import (
    array_get_1based,
    iso8601_to_date,
    iso8601_to_timestamp,
    snake_case,
    snake_case_columns,
)

__all__ = [
    "array_get_1based",
    "iso8601_to_timestamp",
    "iso8601_to_date",
    "snake_case",
    "snake_case_columns",
]
