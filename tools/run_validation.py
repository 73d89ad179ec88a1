"""spark-submit driver file for the validation job.

    spark-submit --master <...> --py-files dist/gate_spark.zip \\
        tools/run_validation.py --input ... --output ...

Deliberately contains nothing but the dispatch: all logic lives in the
gate_spark package shipped via --py-files (tools/make_pyfiles.py).
"""

import sys

from gate_spark.cli import main

if __name__ == "__main__":
    sys.exit(main())
