"""Query plans: the registry binding every implemented operator to a
(spark_builder, duckdb_oracle_sql) pair — the engine's public query
surface and its correctness contract.
"""
