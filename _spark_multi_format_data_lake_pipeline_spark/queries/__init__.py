"""Query catalog: every operator from SURVEY.md §2 exposed as a named query
with (a) a Spark DataFrame implementation and (b) a DuckDB oracle SQL twin.

Importing this package registers all queries.
"""

from .registry import QUERIES, Query, register  # noqa: F401

from . import relational  # noqa: F401,E402
from . import analytic  # noqa: F401,E402
from . import events  # noqa: F401,E402
from . import llm  # noqa: F401,E402
from . import extended  # noqa: F401,E402
from . import tpch_like  # noqa: F401,E402
from . import windows_extra  # noqa: F401,E402
from . import udfs  # noqa: F401,E402
from . import cleaning  # noqa: F401,E402
from . import retrieval  # noqa: F401,E402
from . import affinity  # noqa: F401,E402
from . import lakehouse  # noqa: F401,E402

__all__ = ["QUERIES", "Query", "register"]
