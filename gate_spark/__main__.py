"""``python -m gate_spark`` — same entry as tools/run_validation.py
(use ``--local-cores N`` outside spark-submit)."""

import sys

from gate_spark.cli import main

sys.exit(main())
