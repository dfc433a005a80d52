"""spark-submit launcher for the packaged CLI.

    spark-submit --py-files dist/text_dedup_spark.zip tools/submit_cli.py \\
        <subcommand> [args...]

spark-submit executes a SCRIPT (it has no ``-m``); this one-liner resolves
``text_dedup_spark`` from the --py-files zip (spark-submit prepends it to
sys.path on the driver and ships it to executors) and delegates to the
package CLI. Keep it dependency-free: it must import before any Spark
session exists.
"""

from text_dedup_spark.cli import main

if __name__ == "__main__":
    main()
