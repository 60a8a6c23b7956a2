from .tables import TABLES, load_tables, register_views, table

__all__ = ["TABLES", "load_tables", "register_views", "table"]
