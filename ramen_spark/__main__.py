import sys

from ramen_spark.cli import main

sys.exit(main())
