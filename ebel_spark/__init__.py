"""ebel_spark — a PySpark-native BEL knowledge-graph construction engine.

Built from scratch against the behavior of the reference e-bel/ebel package
(BEL 2.1 validate -> compile -> graph import), re-expressed as a Spark
DataFrame pipeline: vectorized Arrow-batched parsing, broadcast-join
validation and entity linking, and deduplicated node/edge table
materialization.
"""

__version__ = "0.1.0"
