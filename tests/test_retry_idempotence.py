"""Task-retry idempotence: a RouteAndWrite attempt that crashes AFTER
writing its files and is retried by Ray must not duplicate output rows
(content-hashed filenames → the retry overwrites the same files)."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray
import ray.data as rd

from log_formatter_ray.pipelines.flagship import FLAGSHIP_RULES
from log_formatter_ray.stages.route import Router
from log_formatter_ray.testing import CrashOnceAfterWrite


@pytest.mark.filterwarnings("ignore")
def test_retry_after_write_does_not_duplicate(corpus_dir, tmp_path):
    import glob

    files = sorted(glob.glob(f"{corpus_dir}/*.parquet"))[:2]
    data_dir = str(tmp_path / "data")
    flag_dir = str(tmp_path / "flags")
    os.makedirs(flag_dir, exist_ok=True)

    ds = rd.read_parquet_bulk(files, include_paths=True)
    from log_formatter_ray.pipelines.flagship import _basename_tagger, DOC_ID_PATTERN, DAY_LABELS
    from log_formatter_ray.stages.parse import GrokParser
    from log_formatter_ray.fixtures import make_source_lookup
    from log_formatter_ray.stages.enrich import LookupEnricher

    ds = ds.map_batches(_basename_tagger(files), batch_format="pyarrow", batch_size=None)
    parser = GrokParser(
        components_regex=DOC_ID_PATTERN, target_field="doc_id",
        labels=DAY_LABELS, error_tolerant=True, ok_field="_ok",
    )
    ds = ds.map_batches(parser, batch_format="pyarrow", batch_size=None)
    ds = ds.map_batches(
        LookupEnricher(ray.put(make_source_lookup()), key="source"),
        batch_format="pyarrow", batch_size=None,
    )
    router = Router(rules=FLAGSHIP_RULES, default_sink="sink_standard")
    writer = CrashOnceAfterWrite(router, data_dir, flag_dir, drop_cols=("_ok",))
    partials = ds.map_batches(
        writer, batch_format="pyarrow", batch_size=None,
        max_retries=3, retry_exceptions=[RuntimeError],
    )
    total = int(partials.to_pandas()["n"].sum())

    expected = sum(pq.read_metadata(f).num_rows for f in files)
    assert total == expected

    # every attempt crashed once → flags exist → retries really happened
    assert len(os.listdir(flag_dir)) > 0

    written = pq.read_table(data_dir)
    assert len(written) == expected  # no duplicated rows from the retry
    assert written["doc_id"].to_pandas().is_unique
