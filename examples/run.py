"""Run a YAML pipeline config: ``python -m examples.run <config.yml>``.

Owns its Ray session (library code never calls ray.init)."""

from __future__ import annotations

import sys

import ray


def main() -> int:
    path = sys.argv[1] if len(sys.argv) > 1 else "examples/file-file-test.yml"
    ray.init(
        address="local", include_dashboard=False,
        ignore_reinit_error=True, logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from log_formatter_ray.pipelines.builder import run_config_file

    result = run_config_file(path)
    print(f"pipeline {path} finished; sink → {result}")
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
