"""Thin spark-submit shim: `spark-submit --py-files pkg.zip run_kg_job.py …`

spark-submit wants a script file; the real CLI lives in
batch_import_spark.__main__ (also runnable as `python -m
batch_import_spark …`).
"""

import sys

from batch_import_spark.__main__ import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
