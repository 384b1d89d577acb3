from __future__ import annotations

import pytest

import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    """ONE Ray session for the whole pytest run (harness contract)."""
    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def corpus_dir(tmp_path_factory) -> str:
    """Deterministic sequences corpus (FIXTURES.md §1): 5000 rows, 4 shards."""
    from log_formatter_ray.fixtures import generate_sequences

    d = tmp_path_factory.mktemp("corpus")
    generate_sequences(str(d), 5000, num_files=4)
    return str(d)


@pytest.fixture()
def seq_batch():
    """A small in-memory sequences batch for unit tests."""
    from log_formatter_ray.fixtures import make_sequences_batch

    return make_sequences_batch(1000, start_row=0)
