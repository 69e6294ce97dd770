"""``python -m softcite_kb_spark`` — see :mod:`softcite_kb_spark.cli`."""
import sys

from softcite_kb_spark.cli import main

sys.exit(main())
