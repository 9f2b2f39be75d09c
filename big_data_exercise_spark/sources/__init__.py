"""Sources & sinks beyond parquet: CSV (S3), Kafka-shaped JSON
serialize/parse (S4/D4), JDBC append sink (S5)."""

from big_data_exercise_spark.sources import csvio, jdbcio, jsonio  # noqa: F401
