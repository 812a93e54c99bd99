"""Thin spark-submit launcher: the driver file for the packaged CLI.

    zip -r nss.zip neural_search_spark
    spark-submit --master <cluster> --py-files nss.zip cli.py build ...

See neural_search_spark/cli.py for subcommands.
"""

import sys

from neural_search_spark.cli import main

if __name__ == "__main__":
    sys.exit(main())
