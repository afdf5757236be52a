from pyspark_coding_challenge_spark.functions.arrays import (
    pad_truncate,
    sorted_parallel_arrays,
)

__all__ = ["pad_truncate", "sorted_parallel_arrays"]
