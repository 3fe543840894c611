"""Query suite — importing this package registers every query.

Modules register into ``parallel_map_reduce_spark.registry`` via the
``@register`` decorator; ``registry.all_queries()`` triggers this import.
"""

from . import core  # noqa: F401
from . import relational  # noqa: F401
from . import dedup  # noqa: F401
from . import similarity  # noqa: F401
from . import text_analysis  # noqa: F401
from . import streaming_batch  # noqa: F401
from . import curation  # noqa: F401
from . import graph  # noqa: F401
from . import search  # noqa: F401
from . import multimodal  # noqa: F401
from . import warc_ingest  # noqa: F401

# Live-streaming drains are the slowest registry entries (seconds each,
# vs milliseconds for everything else); register them LAST so a
# wall-clock-budgeted gate run never truncates fast entries behind them.
from . import streaming_live  # noqa: F401
