"""Engine operators: relational query surface, dedup, similarity, text,
multimodal. Each module exposes ``QUERIES`` (name -> callable(spark, sf_dir)
-> DataFrame) and ``ORACLE`` (name -> DuckDB-runnable ANSI SQL) used by the
conformance harness and ``__spark_entry__``."""
