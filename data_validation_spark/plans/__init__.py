from data_validation_spark.plans.suite import (  # noqa: F401
    CategoricStats,
    Component,
    Constraint,
    NumericStats,
    Profile,
    ValidationSuite,
)
