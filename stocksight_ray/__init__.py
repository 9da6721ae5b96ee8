"""stocksight_ray — a Ray-Data-native fulltext index + BM25 query engine.

From-scratch replacement for the capabilities of shirosaidev/stocksight
(reference at /root/reference): document pipeline (HTML extraction, cleaning,
tokenization, filtering, sentiment tagging) plus the Elasticsearch-side
fulltext engine (analyzer, inverted index, BM25 top-k, aggregations),
re-expressed as ray.data.Dataset pipelines over zero-copy Arrow batches.

Nothing in this package calls ray.init()/ray.shutdown(); sessions are owned
by the caller (bench.py, CLI entry points, test fixtures, the driver).
"""

__version__ = "0.1.0"
