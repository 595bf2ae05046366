"""delta_unity_duckdb_spark — a PySpark-native analytics engine.

A brand-new, Spark-first re-expression of the query and data-processing
capabilities of the reference connector/pipeline toolkit
``npiesco/delta-unity-duckdb`` (Delta table scanning, arbitrary SQL over
scanned tables, SCD Type 2 merge, catalog introspection, graph workload),
extended with large-scale training-data pipeline operators (dedup,
similarity search, text analysis, multimodal plumbing).

Design principles (see SURVEY.md):
- Declarative DataFrame/SQL plans; Catalyst + AQE pick physical strategy.
- No ``collect()`` in any operator path — only display/serialization edges.
- Broadcast small dimensions; keyed shuffles only where semantics demand.
- Pandas UDFs (Arrow) only where built-in functions can't express the op.
"""

__version__ = "0.1.0"

from delta_unity_duckdb_spark.session import get_spark  # noqa: F401
