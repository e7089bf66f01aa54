"""Query-plan registry: importing this package registers every named query.

Modules register via the ``@query`` decorator in ``registry``; add new
operator modules to the import list below.
"""

from . import core, dedup, scalars, setops, similarity, text, windows  # noqa: F401
from .registry import REGISTRY, oracle_sql, queries  # noqa: F401
