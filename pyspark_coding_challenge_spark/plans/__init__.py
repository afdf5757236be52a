from pyspark_coding_challenge_spark.plans.training import produce_training_examples
from pyspark_coding_challenge_spark.plans.flagship import user_history_features

__all__ = ["produce_training_examples", "user_history_features"]
