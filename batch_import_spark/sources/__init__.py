from batch_import_spark.sources.csv_source import read_reference_csv  # noqa: F401
from batch_import_spark.sources.transcripts import (  # noqa: F401
    TRANSCRIPT_SCHEMA,
    generate_transcripts,
    read_transcripts,
)
