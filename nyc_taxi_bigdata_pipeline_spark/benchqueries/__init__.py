"""Oracle-checked query registry.

Every operator from SURVEY.md §2 (plus the training-data-pipeline
extensions) is exposed here as a named query: a Spark DataFrame builder
plus, where SQL-expressible, a textually-shared DuckDB oracle. The
driver's correctness gate and `tests/test_oracle_parity.py` both consume
this registry; `__spark_entry__.py` is a thin adapter over it.
"""

from .registry import REGISTRY, Query, register, sx  # noqa: F401

# modules register themselves on import — order defines display order
from . import core  # noqa: E402,F401
from . import joins  # noqa: E402,F401
from . import windows  # noqa: E402,F401
from . import text_ops  # noqa: E402,F401
from . import dedup_ops  # noqa: E402,F401
from . import dataset_ops  # noqa: E402,F401
from . import curation_ops  # noqa: E402,F401
from . import similarity_ops  # noqa: E402,F401
from . import advanced  # noqa: E402,F401
from . import joins_advanced  # noqa: E402,F401
from . import reshape  # noqa: E402,F401
from . import behavior  # noqa: E402,F401
from . import sql_surface  # noqa: E402,F401
from . import graph_ops  # noqa: E402,F401
from . import scalar_funcs  # noqa: E402,F401
from . import sketch_ops  # noqa: E402,F401
from . import tpch_shapes  # noqa: E402,F401
from . import dq  # noqa: E402,F401
from . import rows_only  # noqa: E402,F401
from . import fuzzy_ops  # noqa: E402,F401
from . import search_ops  # noqa: E402,F401
from . import stats_ops  # noqa: E402,F401

__all__ = ["REGISTRY", "Query", "register", "sx"]
