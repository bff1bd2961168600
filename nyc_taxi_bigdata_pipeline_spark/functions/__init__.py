from . import compat, datetime_parity, hashing

__all__ = ["compat", "datetime_parity", "hashing"]
