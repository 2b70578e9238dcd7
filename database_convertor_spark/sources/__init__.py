from .readers import load_tables, read_table  # noqa: F401
from .writers import merge_upsert, write_table  # noqa: F401
