from pyspark_coding_challenge_spark.sources.readers import read_table, read_tables
from pyspark_coding_challenge_spark.sources.writers import (
    compact_parquet,
    morton_code,
    write_zordered_parquet,
    write_bucketed_table,
    write_partitioned_orc,
    write_partitioned_parquet,
)

__all__ = ["read_table", "read_tables", "write_partitioned_parquet",
           "write_partitioned_orc", "write_bucketed_table", "compact_parquet",
           "morton_code", "write_zordered_parquet"]
