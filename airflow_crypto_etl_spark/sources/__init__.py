from .tables import STAR_TABLES, load_table, load_tables, read_csv, read_json, read_parquet

__all__ = ["STAR_TABLES", "load_table", "load_tables", "read_csv", "read_json", "read_parquet"]
