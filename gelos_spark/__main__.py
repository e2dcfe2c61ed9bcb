"""``python -m gelos_spark`` — see cli.py."""

import sys

from gelos_spark.cli import main

sys.exit(main())
