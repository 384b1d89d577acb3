"""log_formatter_ray — a Ray-Data-native rebuild of VertexC/log-formatter.

A brand-new engine (NOT a port) with the reference's capability surface —
input → formatter pipeline → output with parse / filter / enrich / route /
aggregate stages — re-expressed as idiomatic Ray Data:

* sources  → ``ray.data.read_parquet`` / ``read_text`` (bounded analogs of the
  reference's Kafka/console inputs, /root/reference/agent/input/)
* formatters → vectorized ``map_batches`` over zero-copy Arrow batches
  (reference interface ``Format(doc) (doc, error)``,
  /root/reference/agent/pipeline/protocol/protocol.go:3-5)
* outputs  → partitioned ``write_parquet`` (the ES dynamic-index fan-out,
  /root/reference/agent/output/elasticsearch/elasticsearch.go:81,109-113)
* counters → per-batch partial counts + a small ``groupby`` (the reference's
  prometheus queue counters, /root/reference/agent/connector/queue.go:24-59)

plus the large-scale training-data operators (dedup, similarity search, text
analysis, multimodal plumbing) a 100 TB token pipeline needs.
"""

__version__ = "0.1.0"

from log_formatter_ray import _compat

_compat.install()
