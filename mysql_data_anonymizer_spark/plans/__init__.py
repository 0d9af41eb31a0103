from mysql_data_anonymizer_spark.plans.plan import ColumnMask, MaskingPlan, SynchroTarget
from mysql_data_anonymizer_spark.plans.compiler import compile_plan

__all__ = ["ColumnMask", "MaskingPlan", "SynchroTarget", "compile_plan"]
