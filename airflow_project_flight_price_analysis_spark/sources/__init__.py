from .testdata import TABLES, events_stream, load_table, register_views  # noqa: F401
