from . import csv, fs, http, jdbc, reports
from .tables import TESTDATA_TABLES, load_table, load_tables, register_views

__all__ = [
    "TESTDATA_TABLES",
    "csv",
    "fs",
    "http",
    "jdbc",
    "load_table",
    "load_tables",
    "register_views",
    "reports",
]
