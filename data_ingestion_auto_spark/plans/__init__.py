"""Query-plan registry: importing this package registers every named query.

Modules register via the ``@query`` decorator in ``registry``; add new
operator modules to the import list below.
"""

from . import (  # noqa: F401
    analytics,
    core,
    dedup,
    joins2,
    multimodal,
    scalars,
    setops,
    similarity,
    similarity_lsh,
    sources_ops,
    spatial,
    text,
    tpch_more,
    udaf,
    windows,
    windows2,
)
from .registry import REGISTRY, oracle_sql, queries  # noqa: F401
