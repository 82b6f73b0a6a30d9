from batch_import_spark.pipeline.extract import extract_mentions  # noqa: F401
from batch_import_spark.pipeline.kg import KgResult, run_kg_pipeline  # noqa: F401
