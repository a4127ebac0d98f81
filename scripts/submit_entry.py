"""spark-submit entry shim: imports ebel_spark from the --py-files zip and
runs the pipeline CLI (ebel_spark.pipeline.main).

Separate from the package so the cluster-side import path is exercised the
way a real deployment would: driver script + zipped library.
"""
import sys

from ebel_spark.pipeline import main

if __name__ == "__main__":
    main(sys.argv[1:])
