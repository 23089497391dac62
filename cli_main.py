"""Thin spark-submit driver script: spark-submit --py-files dist/engine.zip cli_main.py ..."""

import sys

from bge_m3_onnx_spark.cli import main

if __name__ == "__main__":
    sys.exit(main())
