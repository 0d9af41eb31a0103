from mysql_data_anonymizer_spark.operators import dedup, similarity, text

__all__ = ["dedup", "similarity", "text"]
