from pyspark_coding_challenge_spark.sources.readers import read_table, read_tables
from pyspark_coding_challenge_spark.sources.writers import write_partitioned_parquet

__all__ = ["read_table", "read_tables", "write_partitioned_parquet"]
