from data_validation_spark.functions.hashing import (  # noqa: F401
    bucket_transform,
    salt_column,
    stable_hash64,
)
