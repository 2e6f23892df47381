"""binaryx_graph_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of waiwai24/BinaryX-Graph.

The reference (a Rust CLI driving Neo4j over Bolt) models analyzed binaries
as a labeled property graph and runs substring/fulltext search, call-graph
traversal, path enumeration, recursion detection and statistics over it.
This package re-expresses the whole capability surface Spark-first:

- node/edge tables as DataFrames (Parquet warehouse)
- relational operators via the DataFrame API (Catalyst optimizes)
- variable-length traversal as a driver-side iterative BFS over edge frames
- fulltext search as tokenized predicates + a derived posting table
- plus large-scale pipeline operators (dedup, similarity search, text
  analysis, multimodal plumbing) the reference does not have but a
  100 TB training-data pipeline needs.
"""

__version__ = "0.1.0"

from .engine import Engine  # noqa: E402,F401
