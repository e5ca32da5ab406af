from .datetime_parts import datetime_parts, parse_timestamp, to_date_col

__all__ = ["datetime_parts", "parse_timestamp", "to_date_col"]
