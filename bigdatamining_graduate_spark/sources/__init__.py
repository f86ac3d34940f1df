from .catalog import SCHEMAS, TABLES, load_table, table_path  # noqa: F401
