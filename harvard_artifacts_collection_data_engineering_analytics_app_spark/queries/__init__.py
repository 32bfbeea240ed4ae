"""Query library.

Every query is registered in :mod:`.registry` with a DataFrame builder and
(where SQL-expressible) an ANSI-SQL oracle string for DuckDB. Import the
submodules for their registration side effects.
"""

from . import registry  # noqa: F401


def load_all() -> None:
    """Import every query module (registration side effects)."""
    from . import reference_parity  # noqa: F401
    from . import functions_surface  # noqa: F401
    from . import windows  # noqa: F401
    from ..operators import asof  # noqa: F401
    from ..operators import rangejoin  # noqa: F401
    from ..operators import rollup  # noqa: F401
    from ..operators import skew  # noqa: F401
    from ..operators import components  # noqa: F401
    from ..operators import dedup  # noqa: F401
    from ..operators import substring  # noqa: F401
    from ..operators import sketches  # noqa: F401
    from ..operators import similarity  # noqa: F401
    from ..operators import graph  # noqa: F401
    from ..operators import multimodal  # noqa: F401
    from ..functions import text_queries  # noqa: F401
    from ..streaming import queries as streaming_queries  # noqa: F401
    from . import corpus_build  # noqa: F401
