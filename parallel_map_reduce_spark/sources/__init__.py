from .catalog import TABLES, load_table, load_tables
from .text_manifest import read_manifest_documents

__all__ = ["TABLES", "load_table", "load_tables", "read_manifest_documents"]
