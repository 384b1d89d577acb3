"""``python -m log_formatter_ray <config.yml>`` — the packaged job
entrypoint (what a user ships with ``ray job submit -- python -m
log_formatter_ray pipeline.yml`` on a real cluster).

Same contract as ``examples/run.py``: owns its Ray session (library
code never calls ``ray.init``); ``--stream <offset_path>`` runs the
configured stream connector in continuous mode until drained.  In this
sandbox ``address="local"`` is preset via ``RAY_ADDRESS``; on a cluster
``ray.init()`` with no address attaches to the running job's cluster.
"""

from __future__ import annotations

import os
import sys

import ray


def main(argv: list[str] | None = None) -> int:
    args = list(sys.argv[1:] if argv is None else argv)
    offset_path = None
    if "--stream" in args:
        i = args.index("--stream")
        offset_path = args[i + 1]
        del args[i : i + 2]
    if not args:
        print("usage: python -m log_formatter_ray <config.yml> "
              "[--stream <offset_path>]", file=sys.stderr)
        return 2
    path = args[0]
    ray.init(
        address=os.environ.get("RAY_ADDRESS"),
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    try:
        if offset_path is not None:
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
    finally:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
