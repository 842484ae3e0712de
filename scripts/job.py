"""spark-submit entry shim: the driver-side script named on the
``spark-submit`` command line. All real code lives in the
``docstrange_spark`` package shipped alongside via ``--py-files``;
this file only dispatches to the CLI so the same argument surface works
identically under ``python -m docstrange_spark.cli`` (local dev) and
``spark-submit`` (cluster), per the north rule's launch clause.
"""

import sys

from docstrange_spark.cli import main

if __name__ == "__main__":
    sys.exit(main())
