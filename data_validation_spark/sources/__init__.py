from data_validation_spark.sources.table_provider import TableProvider  # noqa: F401
from data_validation_spark.sources.sequences import (  # noqa: F401
    allowed_sources_df,
    synth_sequences,
)
from data_validation_spark.sources.testdata import load_table, register_views  # noqa: F401
