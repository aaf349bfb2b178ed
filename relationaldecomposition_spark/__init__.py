"""PySpark-native engine with the query and data-processing capabilities of
khangp0000/RelationalDecomposition (entropy-based approximate dependency
discovery + acyclic-schema decomposition), re-architected Spark-first.

Layout (mirrors SURVEY.md §7):
  core/       attribute-set + dependency dataclasses (driver-side)
  engine/     Spark data-plane: entropy, measures, decomposition validation
  mining/     driver-plane search: lattice, JD mining, inference
  schema/     acyclic-schema enumeration + join trees
  operators/  beyond-reference ops: dedup, similarity, text, multimodal
  sources/    readers/writers (csv-with-reference-semantics, parquet)
  functions/  shared column expressions (portable hashing, entropy exprs)
  streaming/  Structured Streaming variants of the batch operators
"""

__version__ = "0.1.0"
