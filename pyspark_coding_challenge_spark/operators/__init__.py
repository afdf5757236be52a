from pyspark_coding_challenge_spark.operators.actions import (
    ACTION_TYPE_ADD_TO_CART,
    ACTION_TYPE_CLICK,
    ACTION_TYPE_ORDER,
    normalize_actions,
)
from pyspark_coding_challenge_spark.operators.history import last_k_history
from pyspark_coding_challenge_spark.operators.impressions import explode_impressions

__all__ = [
    "ACTION_TYPE_CLICK",
    "ACTION_TYPE_ADD_TO_CART",
    "ACTION_TYPE_ORDER",
    "normalize_actions",
    "explode_impressions",
    "last_k_history",
]
