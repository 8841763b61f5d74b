from .cleaning import (  # noqa: F401
    clean_text_expr,
    coerce_money_expr,
    date_parts,
    is_weekend_expr,
    parse_stopovers_expr,
    row_hash_expr,
    surrogate_key_expr,
    weekday_expr,
)
