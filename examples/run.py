"""Run a YAML pipeline config: ``python -m examples.run <config.yml>``.

Owns its Ray session (library code never calls ray.init)."""

from __future__ import annotations

import sys

import ray


def main() -> int:
    args = sys.argv[1:]
    offset_path = None
    if "--stream" in args:
        i = args.index("--stream")
        offset_path = args[i + 1]
        del args[i : i + 2]
    path = args[0] if args else "examples/file-file-test.yml"
    ray.init(
        address="local", include_dashboard=False,
        ignore_reinit_error=True, logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    if offset_path is not None:
        # continuous mode: poll the configured stream connector until two
        # consecutive empty polls (graceful drain), offsets durable
        from log_formatter_ray.config import load_config_file
        from log_formatter_ray.pipelines.builder import PlanBuilder

        results = PlanBuilder(load_config_file(path)).run_streaming(
            offset_path, interval_s=1.0, empty_polls_to_drain=2
        )
        print(f"stream {path} drained after {len(results)} delta(s)")
    else:
        from log_formatter_ray.pipelines.builder import run_config_file

        result = run_config_file(path)
        print(f"pipeline {path} finished; sink → {result}")
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
