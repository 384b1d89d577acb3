"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in the library code it calls) calls ``ray.init`` / ``ray.shutdown``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship documents pipeline (parse → enrich → route → aggregate) on
    /root/testdata/sf0.001; returns the per-sink×source counts Dataset."""
    from log_formatter_ray.pipelines.queries import q_flagship_documents

    return q_flagship_documents("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2 plus the
    training-data operators (dedup / ANN / text analysis / windows /
    multimodal plumbing)."""
    from log_formatter_ray.fixtures import generate_sequences
    from log_formatter_ray.pipelines.queries import QUERIES, sequences_dir_for

    # Pre-generate the oracle-gate sequences corpus (idempotent, pure
    # numpy) so the DuckDB oracles that read it by path work no matter
    # whether the driver runs the SQL or the Ray query first.
    try:
        from log_formatter_ray.pipelines.queries import oracle_sf_dir

        corpus, rows = sequences_dir_for(oracle_sf_dir())
        generate_sequences(corpus, rows, num_files=64)
    except Exception:  # noqa: BLE001 — queries() must never fail on pregen
        pass

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query (the rest —
    minhash/simhash/embedding LSH/pruned IVF/media — get the driver's
    rows-only check).  The sequences-corpus globs are resolved at CALL
    time for the gate's sf dir, never frozen at import — and the corpus is
    pre-generated HERE too (idempotent), so the oracle SQL works even if
    the driver runs it before any Ray query touched the corpus."""
    from log_formatter_ray.fixtures import generate_sequences
    from log_formatter_ray.pipelines.queries import (
        oracle_sf_dir,
        oracle_sql_for,
        sequences_dir_for,
    )

    try:
        corpus, rows = sequences_dir_for(oracle_sf_dir())
        generate_sequences(corpus, rows, num_files=64)
    except Exception:  # noqa: BLE001 — never fail the contract on pregen
        pass
    return oracle_sql_for()
