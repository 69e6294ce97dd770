"""spark-submit primary script (north_rule deployment shape)::

    python -m softcite_kb_spark package-zip /tmp/skb.zip
    spark-submit --master <cluster> --py-files /tmp/skb.zip \
        tools/run_pipeline.py run --config job.json

The package itself ships via ``--py-files``; this shim only dispatches
into :func:`softcite_kb_spark.cli.main` (config format documented
there).
"""

import sys

from softcite_kb_spark.cli import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
