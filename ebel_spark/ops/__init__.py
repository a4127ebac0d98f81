"""Large-scale training-data operations: dedup, similarity search, text
analysis, multimodal plumbing.  All JVM-side column algebra unless a Pandas
UDF is genuinely required (multimodal decode)."""
