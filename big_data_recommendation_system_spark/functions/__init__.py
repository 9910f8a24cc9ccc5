from .pandas_parity import (
    cut_right_closed,
    dayofweek_monday0,
    decimal_avg,
    decimal_sum,
    event_weight,
    is_weekend,
    map_lookup,
)

__all__ = [
    "cut_right_closed",
    "dayofweek_monday0",
    "decimal_avg",
    "decimal_sum",
    "event_weight",
    "is_weekend",
    "map_lookup",
]
