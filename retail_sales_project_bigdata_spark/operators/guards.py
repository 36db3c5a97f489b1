"""Input-size guards for exactness-anchor queries (VERDICT r1 item 2).

Three queries are deliberately quadratic / broadcast-corpus: they exist
as EXACT cross-checks for the bucketed scale paths (LSH near-dup, IVF/PQ
ANN), not as production routes.  Running one of them against a
production-sized input would OOM or run for days; these guards make that
a loud, immediate, actionable failure instead of a cluster incident.

The bound is rows *counted at query build time* (one cheap count job —
negligible next to the quadratic work it gates) and is configurable per
run via ``SPARK_GRAFT_ANCHOR_MAX_ROWS`` for engineers who knowingly want
a bigger exact baseline.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

ANCHOR_MAX_ROWS_ENV = "SPARK_GRAFT_ANCHOR_MAX_ROWS"

#: Default per-anchor input bounds — sized so every test/bench scale
#: factor passes with ≥10× headroom while a production corpus (billions
#: of rows) fails fast.  At the bound, the pair space is ~5e11
#: comparisons for the worst anchor — hours on one node, the outer edge
#: of "you really meant it".
DEFAULT_ANCHOR_MAX_ROWS = 1_000_000


def guard_anchor_rows(
    df: DataFrame, query_name: str, scale_path: str,
    default_bound: int = DEFAULT_ANCHOR_MAX_ROWS,
) -> None:
    """Fail loudly when an anchor query's input exceeds the bound.

    ``scale_path`` names the production-safe twin to point the error at.
    """
    bound = int(os.environ.get(ANCHOR_MAX_ROWS_ENV, default_bound))
    n = df.count()
    if n > bound:
        raise ValueError(
            f"{query_name} is an exactness ANCHOR (quadratic/broadcast-"
            f"corpus); its input has {n:,} rows > bound {bound:,}. "
            f"Use the scale path instead ({scale_path}), or raise "
            f"{ANCHOR_MAX_ROWS_ENV} if you knowingly want a larger exact "
            f"baseline."
        )
