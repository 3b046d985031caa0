from data_validation_spark.operators.profile import build_profile  # noqa: F401
from data_validation_spark.operators.constraints import evaluate_constraints  # noqa: F401
from data_validation_spark.operators.contrast import contrast  # noqa: F401
