from .udfs import make_parse_udf, parse_rows_to_records

__all__ = ["make_parse_udf", "parse_rows_to_records"]
